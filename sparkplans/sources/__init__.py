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


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view (names match the DuckDB
    oracle's pre-registered views)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
