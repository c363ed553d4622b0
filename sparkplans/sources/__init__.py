"""Readers for the benchmark/test tables.

The driver provides TPC-H-ish parquet tables plus ``events``,
``documents`` and ``embeddings`` at ``/root/testdata/sf*/``
(TESTDATA.md).  ``events.ts`` is a nanosecond parquet timestamp,
which Spark's vectorized reader rejects; we read it as long
(``spark.sql.legacy.parquet.nanosAsLong``) and convert to
``TIMESTAMP_NTZ`` at microsecond precision — matching how DuckDB (the
correctness oracle) surfaces the same column.
"""

from __future__ import annotations

import os

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_nanos_conf(spark: SparkSession) -> None:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; normalizes the events timestamp."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        _ensure_nanos_conf(spark)
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # Integer division (DIV): float division would lose precision
            # on int64 epoch-nanos (> 2^53).  Floor matches DuckDB's
            # ns->us truncation for positive epochs.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
            )
        return df
    return spark.read.parquet(path)


def fan_out(spark: SparkSession, df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow scan up to the session's
    parallelism target — the Spark analog of DataFusion inserting
    ``RepartitionExec RoundRobinBatch(target_partitions)`` above a
    single-file scan (reference docs/5_cli_read_plans_filter_
    repartition_coalesce.md:18-44): a small file arrives as ONE scan
    partition, and any CPU-heavy per-row stage above it (shingling,
    hashing, vector math) would otherwise run on one core.

    No-op when the scan is already parallel enough — at 100 TB the
    input spans thousands of splits and this helper adds nothing; it
    only fans out the small-file case.  Only use above per-row
    compute that dwarfs the (tiny) round-robin exchange; never on
    scan-light aggregations, and never where partition-local order
    matters (Spark round-robin does not preserve it)."""
    n = min_partitions or spark.sparkContext.defaultParallelism
    # File count is a cheap (driver-side, no plan conversion) proxy for
    # scan parallelism: few input files => few scan partitions.  A
    # single LARGE file is already byte-range-split by Spark, so the
    # repartition this triggers is redundant-but-harmless (one small
    # round-robin exchange); converting to .rdd to count true scan
    # partitions costs ~1s of plan translation per call, which would
    # dwarf the work being parallelized.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= n:
        return df
    return df.repartition(n)


def incremental_files(
    spark: SparkSession,
    path: str,
    state_file: str,
    format: str = "parquet",
) -> tuple[DataFrame | None, Callable[[], None]]:
    """Batch-incremental reads: return a DataFrame over ONLY the files
    under ``path`` not yet recorded in ``state_file``, plus a
    ``commit()`` that records them after a successful run.

    The non-streaming half of exactly-once ingestion (the streaming
    half is the checkpointed sink): re-running after a crash before
    ``commit()`` reprocesses the same new files; after it, nothing.
    Returns ``(None, commit)`` when there are no new files.  State is
    one filename per line — trivially inspectable and mergeable."""
    import glob as _glob

    ext = {"parquet": ".parquet", "csv": ".csv", "json": ".json"}.get(format, "")
    present = sorted(
        f for f in _glob.glob(os.path.join(path, "*"))
        if os.path.isfile(f) and (not ext or f.endswith(ext))
    )
    seen: set[str] = set()
    if os.path.exists(state_file):
        with open(state_file) as fh:
            seen = {line.strip() for line in fh if line.strip()}
    new = [f for f in present if f not in seen]

    def commit() -> None:
        os.makedirs(os.path.dirname(os.path.abspath(state_file)), exist_ok=True)
        with open(state_file, "a") as fh:
            for f in new:
                fh.write(f + "\n")

    if not new:
        return None, commit
    return spark.read.format(format).load(new), commit


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view (names match the DuckDB
    oracle's pre-registered views)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
