"""Structured Streaming surface.

The reference is batch-only (its "streams" are per-partition pull
streams, SURVEY §2.9); this module extends the same operators to
unbounded data the Spark-idiomatic way: ``readStream`` sources,
event-time windows + watermarks for late data, and
``applyInPandasWithState`` for custom stateful logic
(sessionization).  The batch ``date_bin`` flagship and the streaming
tumbling window share ``F.window`` semantics, so results line up
bucket-for-bucket.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from sparkplans.materialize import materialize, materialize_lazy
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # nanos in the parquet files
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark: SparkSession, changelog: bool = True) -> None:
    """Switch the session's streaming state store to RocksDB — the
    large-state rung for 100 TB streaming (r5 verdict item 3).

    The default HDFS-backed provider holds every key's state in
    executor HEAP: for dedup-ingest fingerprints or sessionization
    over hundreds of millions of keys, state is the first thing to
    die.  RocksDB keeps state on local SSD with a block-cache in
    native memory, bounding heap at any key cardinality; per-batch
    checkpointing ships only the CHANGELOG when
    ``changelog=True`` (``rocksdb.changelogCheckpointing``) instead
    of snapshotting the full store.

    The provider class is read per-query at START, so this is a plain
    runtime conf — set it before ``.start()``; running queries keep
    their provider.  Results are provider-independent (pinned by
    tests/test_streaming.py::test_rocksdb_state_store_matches_default
    and the --state rocksdb legs of examples/streaming_scale.py)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled",
        str(bool(changelog)).lower(),
    )


def stream_events(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events table (each parquet file is
    a micro-batch unit), timestamps normalized to match the batch
    reader.

    Unit robustness: depending on the Spark build, a TIMESTAMP(NANOS)
    parquet column read through a declared LongType schema arrives as
    raw nanos (legacy ``nanosAsLong`` behavior) or already truncated
    to micros (readers that convert before widening).  An epoch long
    ``>= 1e17`` can only be nanos (1e17 µs is year 5138; 1e17 ns is
    1973), so the per-row branch picks the right divisor for any data
    between 1973 and 5138 — immune to conf availability and session
    ordering (a silent ~1000× timestamp corruption otherwise)."""
    from sparkplans.sources import _ensure_nanos_conf

    _ensure_nanos_conf(spark)
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(f"{sf_dir}")
    return normalize_event_ts(df)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize an events frame's ``ts`` to TIMESTAMP (watermarks
    reject NTZ; with the session tz fixed to UTC the wall-clock values
    match the batch reader's NTZ ones).  Handles every way the nanos
    parquet column can arrive: raw nanos long, micros long (readers
    that truncate before widening to a declared LongType), or native
    TIMESTAMP_NTZ (inferred-schema reads on Spark builds without the
    nanosAsLong legacy conf)."""
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # An epoch long >= 1e17 can only be nanos (1e17 us is year
        # 5138; 1e17 ns is 1973), so the per-row branch picks the
        # right divisor for any data between 1973 and 5138.
        us = F.when(
            F.abs(F.col("ts")) >= F.lit(10**17), F.expr("ts DIV 1000")
        ).otherwise(F.col("ts"))
        return df.withColumn("ts", F.timestamp_micros(us))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts with a watermark bounding state for late
    data — the streaming form of the batch date_bin aggregation."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"))
        .select(
            F.col("window")["start"].cast("timestamp_ntz").alias("bin"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampNTZType()),
        StructField("session_end", TimestampNTZType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom stateful operator: per-user session windows with an
    inactivity gap, via applyInPandasWithState (the reference has no
    stateful streaming at all — this is the Spark-native extension
    point for operators the engine lacks).

    State per user = (start, end, count) of the open session; events
    extend it or close it and open a new one.  Emits closed sessions;
    event-time timeout closes idle sessions when the watermark passes.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, _us_ts(start_us), _us_ts(end_us), n)],
                columns=["user_id", "session_start", "session_end", "n_events"],
            )
            return
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf["ts"]))
        ts_list.sort()
        out = []
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = None, None, 0
        for t in ts_list:
            if start_us is None:
                start_us, end_us, n = t, t, 1
            elif t - end_us <= gap_us:
                end_us, n = max(end_us, t), n + 1
            else:
                out.append((user_id, _us_ts(start_us), _us_ts(end_us), n))
                start_us, end_us, n = t, t, 1
        if start_us is not None:
            timeout_ms = end_us // 1000 + gap_seconds * 1000
            if timeout_ms <= state.getCurrentWatermarkMs():
                # The batch's own span already advanced the watermark
                # past this session's close time (one micro-batch can
                # cover hours of event time at scale — found by the
                # sf1 streaming run, where arming the timer throws
                # INVALID_TIMEOUT_TIMESTAMP): the session is closed by
                # definition, so emit it now instead of arming a timer
                # that could never legally fire.
                out.append((user_id, _us_ts(start_us), _us_ts(end_us), n))
                if state.exists:
                    state.remove()
            else:
                state.update((start_us, end_us, n))
                state.setTimeoutTimestamp(timeout_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_start", "session_end", "n_events"]
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("sum_cents", LongType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_RS_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("sum_cents", LongType()),
        StructField("mn", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def running_stats(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator #2: exact running per-key statistics
    across micro-batches via applyInPandasWithState.  State per key is
    (count, sum in integer cents, min, max) — the sum accumulates as
    int64 cents, so it is EXACT and independent of both row order
    within a batch and batch boundaries (a float sum would drift with
    either).  Each batch emits the updated cumulative row per key
    (update semantics); the row with the highest count per key is the
    final answer, and it must equal the batch aggregate bit-for-bit —
    pinned in tests.  At scale, state is one 32-byte tuple per key,
    hash-partitioned across executors."""

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout set
            state.remove()
            return
        if state.exists:
            n, sc, mn, mx = state.get
        else:
            n, sc, mn, mx = 0, 0, None, None
        for pdf in pdfs:
            vals = pdf["value"]
            n += int(len(vals))
            # two-decimal values: v*100 is integer-valued up to float
            # noise, so the round-to-int is tie-free and exact
            sc += int((vals * 100).round().astype("int64").sum())
            bmn, bmx = float(vals.min()), float(vals.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        state.update((n, sc, mn, mx))
        yield pd.DataFrame(
            [(etype, n, sc, mn, mx)],
            columns=["event_type", "n", "sum_cents", "min_value", "max_value"],
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_RS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark keeps
    per-key state only until the watermark passes, so state is bounded
    — the unbounded-data twin of operators/dedup.exact_dedup.  At
    scale, state is hash-partitioned by key across executors."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "10 minutes",
    join_window_seconds: int = 300,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on user_id within a bounded event-time band.
    Both sides are watermarked and the time-range predicate lets Spark
    expire join state — without it, state grows forever.  Rows: each
    click joined to views of the same user within the preceding
    ``join_window_seconds``.

    ``how='left_outer'``: unmatched left rows emit with nulls — but
    only once the watermark passes their band (the engine can't know
    "no match will come" earlier), so outer results trail the inner
    ones by the watermark delay.  The watermark + band predicate pair
    is mandatory for outer stream-stream joins; Spark rejects the
    query otherwise.  Note the global watermark is the MIN over both
    sides' watermarks — outer rows flush only once BOTH sides'
    event time moves past them."""
    l = left.withWatermark("ts", watermark).select(
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event"),
    )
    return l.join(
        r,
        F.expr(
            f"l_user = r_user AND r_ts BETWEEN l_ts - INTERVAL {join_window_seconds} "
            "SECONDS AND l_ts"
        ),
        how,
    )


def enrich_stream(
    events: DataFrame,
    profiles: DataFrame,
    key: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a live event stream with a batch
    dimension (per-user profile, feature table, allow/deny list).  The
    static side is re-planned per micro-batch — it reads the CURRENT
    table state each trigger, so a nightly-refreshed profile table
    flows in without restarting the query — and needs no watermark:
    only the stream side holds state, and with an equi-join there is
    no state at all (each batch is a plain join).

    Scale: Spark broadcasts the static side when it fits (the usual
    dimension pattern); a huge static side falls back to a per-batch
    shuffled join, which is still bounded by the micro-batch size.
    ``how='left'`` keeps unmatched events (cold-start users) with null
    profile columns — the streaming-safe outer direction; static-side
    outer joins are not supported by the engine."""
    return events.join(profiles, on=key, how=how)


def _us_ts(us: int):
    return pd.Timestamp(us, unit="us")


def to_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    output_mode: str = "append",
):
    """Checkpointed parquet file sink: exactly-once per micro-batch
    via the write-ahead commit log under ``checkpoint`` — restarting
    the same query over the same input does not duplicate output.
    Partitioned layout optional (same pruning story as
    sinks.write_partitioned)."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    q = w.start()
    q.awaitTermination(120)
    return q


def upsert_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    key: str,
    format: str = "parquet",
    partition_col: str | None = None,
):
    """Streaming MERGE: apply each micro-batch as an upsert into a
    file-backed table via ``foreachBatch`` + ``sinks.upsert`` — the
    standard CDC-apply pattern when the sink has no native streaming
    MERGE.  Within a batch, the last row per key wins (deterministic:
    highest ``ts`` if present, else arbitrary-but-single via
    ``dropDuplicates``).

    Exactly-once: foreachBatch is at-least-once on retries, but the
    upsert itself is idempotent per batch (same keys replace the same
    rows), which upgrades the pipeline to effectively-once — the same
    argument lakehouse MERGE sinks make.

    ``partition_col`` switches to the fact-scale path
    (sinks.upsert_partitioned): each batch rewrites only the hive
    partitions it touches instead of the whole target.
    """
    from sparkplans import sinks

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cols = batch_df.columns
        if "ts" in cols:
            w_latest = batch_df.groupBy(key).agg(
                F.max(F.struct("ts", *[c for c in cols if c != key and c != "ts"])).alias("__r")
            )
            latest = w_latest.select(
                key, *[F.col(f"__r.{c}").alias(c) for c in cols if c != key]
            ).select(*cols)
        else:
            latest = batch_df.dropDuplicates([key])
        if partition_col is not None:
            os.makedirs(path, exist_ok=True)
            sinks.upsert_partitioned(
                spark, path, latest, key, partition_col, format=format
            )
            return
        if not os.path.isdir(path) or not os.listdir(path):
            latest.write.format(format).mode("overwrite").save(path)
            return
        sinks.upsert(spark, path, latest, key, format=format)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def run_available_now(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drain all available input through the streaming plan into an
    in-memory table (used by tests; production would writeStream to
    parquet/kafka with checkpointing)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


# ---------------------------------------------------------------------
# Continuous aggregate: incremental rollup maintenance
# ---------------------------------------------------------------------


def rollup_apply_batch(
    path: str,
    interval: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
):
    """Build the foreachBatch merge function for `continuous_rollup`.

    Each micro-batch is pre-aggregated to *mergeable* partials
    (cnt / DECIMAL sum / min / max) at `interval` granularity, then
    merged into the persistent rollup table copy-on-write: rows for
    untouched bins are carried over untouched, rows for touched bins
    are re-combined with the batch partials.  Per-batch cost is
    O(batch + touched-bin rows) — raw history is never re-scanned,
    which is the whole point of a continuous aggregate at 100 TB.

    Idempotence: the applied batch id is written as a `_LAST_BATCH`
    marker *inside the staging directory before the atomic rename*,
    so data and marker commit together; a retried batch (foreachBatch
    is at-least-once on failure) sees its own id and no-ops instead
    of double-counting.
    """
    import shutil
    import tempfile

    from sparkplans.operators.rollup import timeseries_rollup

    keys = keys or []
    bin_keys = ["bin", *keys]

    def _last_applied(p: str) -> int:
        marker = os.path.join(p, "_LAST_BATCH")
        if os.path.isfile(marker):
            with open(marker) as f:
                return int(f.read().strip())
        return -1

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = timeseries_rollup(
            batch_df, [interval], ts_col=ts_col, value_col=value_col, keys=keys
        )[interval].withColumn(
            # pin the accumulator type: repeated merge passes would
            # otherwise widen DECIMAL precision batch over batch and
            # drift the stored schema
            "sum_value",
            F.col("sum_value").cast("decimal(38,6)"),
        )
        exists = os.path.isdir(path) and any(
            not f.startswith(("_", ".")) for f in os.listdir(path)
        )
        if exists and _last_applied(path) >= batch_id:
            return  # retry of an already-committed batch
        if not exists:
            merged = partial
        else:
            target = spark.read.parquet(path).withColumn(
                "sum_value", F.col("sum_value").cast("decimal(38,6)")
            )
            touched = partial.select(*bin_keys).distinct()
            kept = target.join(F.broadcast(touched), bin_keys, "left_anti")
            overlap = target.join(F.broadcast(touched), bin_keys, "left_semi")
            recombined = (
                overlap.unionByName(partial)
                .groupBy(*bin_keys)
                .agg(
                    F.sum("cnt").alias("cnt"),
                    F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
            merged = kept.unionByName(recombined.select(*kept.columns))
        parent = os.path.dirname(path.rstrip("/")) or "."
        os.makedirs(parent, exist_ok=True)
        staging = tempfile.mkdtemp(prefix="rollup_", dir=parent)
        merged.write.mode("overwrite").parquet(staging)
        with open(os.path.join(staging, "_LAST_BATCH"), "w") as f:
            f.write(str(batch_id))
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.rename(staging, path)

    return apply_batch


def continuous_rollup(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    interval: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
):
    """Streaming continuous aggregate (the hypertable-rollup analog
    for unbounded input, extending operators/rollup.timeseries_rollup
    which the batch `hypertable_rollup_1h` query verifies): maintain a
    persistent per-bin rollup table incrementally from a file stream.
    Read it back with operators.rollup.finalize for avg/double views.
    """
    q = (
        stream_df.writeStream.foreachBatch(
            rollup_apply_batch(
                path, interval, ts_col=ts_col, value_col=value_col, keys=keys
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def quality_gate(
    stream_df: DataFrame,
    checks,
    good_path: str,
    quarantine_path: str,
    checkpoint: str,
    refs: dict[str, DataFrame] | None = None,
):
    """Streaming data-quality gate: every micro-batch is annotated
    row-by-row with `operators.expectations.annotate_violations`,
    clean rows land in ``good_path``, violating rows (plus their
    ``failed_checks`` list) in ``quarantine_path`` — the
    quarantine-don't-drop pattern a training-data intake pipeline
    uses so bad records stay auditable.

    foreachBatch is at-least-once on retries; both writes are plain
    appends, so a retried batch can duplicate rows in the two sinks —
    downstream consumers dedup on a key or read via the upsert sink
    when exactly-once matters.  Each batch runs the checks as one
    annotation pass (conditional flags + optional broadcast FK joins),
    so the gate adds no shuffle to the stream.
    """
    from sparkplans.operators.expectations import annotate_violations

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        flagged = annotate_violations(batch_df, checks, refs=refs)
        flagged.persist()
        try:
            bad = flagged.filter(F.size("failed_checks") > 0)
            good = flagged.filter(F.size("failed_checks") == 0).drop(
                "failed_checks"
            )
            good.write.mode("append").parquet(good_path)
            bad.withColumn(
                "failed_checks", F.concat_ws(",", "failed_checks")
            ).write.mode("append").parquet(quarantine_path)
        finally:
            flagged.unpersist()

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


# ---------------------------------------------------------------------
# Streaming corpus ingestion with incremental dedup (exactly-once)
# ---------------------------------------------------------------------


def dedup_ingest_sink(
    stream_docs: DataFrame,
    corpus_root: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuously ingest a document stream into a versioned corpus
    table with INCREMENTAL exact dedup: each micro-batch is deduped
    (a) within itself, (b) against a persisted fingerprint index —
    never against the re-read corpus — and both the clean rows and
    the updated index commit under the SAME micro-batch id, so a
    replayed batch after restart is a no-op on both tables
    (exactly-once end to end).

    Layout: ``corpus_root/corpus`` holds the documents (+fingerprint
    column), ``corpus_root/fp_index`` holds one 32-hex-char
    fingerprint per kept doc (~1/1000th of corpus bytes — the only
    thing the dedup ever reads back).  This is the production shape
    of `operators/dedup.incremental_exact_dedup` wired into
    structured streaming via foreachBatch.
    """
    from sparkplans.operators.dedup import incremental_exact_dedup
    from sparkplans.table import VersionedTable

    spark = stream_docs.sparkSession
    corpus = VersionedTable(spark, os.path.join(corpus_root, "corpus"))
    index = VersionedTable(spark, os.path.join(corpus_root, "fp_index"))

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            seen = index.read().select("fingerprint")
        except FileNotFoundError:
            seen = None
        clean, _ = incremental_exact_dedup(
            batch_df, seen, id_col=id_col, text_col=text_col
        )
        clean = clean.transform(materialize_lazy)  # evaluate once, commit twice
        corpus.streaming_append_batch(clean, batch_id)
        index.streaming_append_batch(
            clean.select("fingerprint"), batch_id
        )

    return (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def near_dedup_ingest_sink(
    stream_docs: DataFrame,
    corpus_root: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
):
    """`dedup_ingest_sink`'s NEAR-dup twin: each micro-batch is deduped
    against a persisted MINHASH-SIGNATURE index (band-hash candidates
    + signature-agreement Jaccard — see
    `operators/dedup.incremental_near_dedup`), and the clean rows plus
    their signatures commit under the same micro-batch id
    (exactly-once on both tables).  The index is ``num_perm`` ints per
    kept doc; the corpus text is never re-read by the dedup."""
    from sparkplans.operators.dedup import incremental_near_dedup
    from sparkplans.table import VersionedTable

    spark = stream_docs.sparkSession
    corpus = VersionedTable(spark, os.path.join(corpus_root, "corpus"))
    index = VersionedTable(spark, os.path.join(corpus_root, "sig_index"))

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            seen = index.read()
        except FileNotFoundError:
            seen = None
        clean, new_index = incremental_near_dedup(
            batch_df,
            seen,
            id_col=id_col,
            text_col=text_col,
            num_perm=num_perm,
            bands=bands,
            threshold=threshold,
        )
        clean = clean.transform(materialize_lazy)
        corpus.streaming_append_batch(clean, batch_id)
        # append only the NEW signatures (incremental_near_dedup
        # returns the full updated index; the delta is the clean rows')
        from sparkplans.operators.dedup import minhash_wide

        index.streaming_append_batch(
            minhash_wide(clean, text_col, id_col, num_perm), batch_id
        )

    return (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def bloom_dedup_ingest_sink(
    stream_docs: DataFrame,
    corpus_root: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 1 << 17,
):
    """`dedup_ingest_sink` with a BLOOM PREFILTER on the cross-batch
    check — the ingest shape that stays cheap as the corpus index
    grows: each micro-batch probes a persisted Bloom filter of every
    committed fingerprint MAP-SIDE, and only probable hits (true dups
    + the FP sliver) join the exact index; definite misses skip the
    index entirely.

    Crash-safety invariant: **bloom ⊇ committed index, always.**  The
    batch's bits are OR-ed into the filter and fsynced BEFORE the data
    commits — a crash in between leaves extra bits (harmless: extra
    exact-join work), never missing bits (which would admit dups).
    Bloom union is idempotent, so a replayed batch re-ORs the same
    bits; `streaming_append_batch`'s batch-id dedup keeps the data
    commits exactly-once.  Probing uses the PRE-batch filter state —
    after a replay the batch's own bits are present, so every row
    routes through the exact join and the result is unchanged.

    State: ``corpus_root/bloom.bin`` (num_bits/8 bytes, atomic
    tmp+rename updates) beside the same ``corpus`` / ``fp_index``
    versioned tables as the exact sink.
    """
    from sparkplans.functions.text import doc_fingerprint
    from sparkplans.operators.bloom import bloom_build, bloom_member
    from sparkplans.table import VersionedTable

    spark = stream_docs.sparkSession
    corpus = VersionedTable(spark, os.path.join(corpus_root, "corpus"))
    index = VersionedTable(spark, os.path.join(corpus_root, "fp_index"))
    bloom_path = os.path.join(corpus_root, "bloom.bin")

    def _load_bloom() -> bytes:
        if os.path.exists(bloom_path):
            with open(bloom_path, "rb") as f:
                pre = f.read()
            if len(pre) != num_bits // 8:
                # A size mismatch means the caller changed num_bits
                # against existing state; OR-ing via zip would silently
                # truncate to the shorter filter and drop set bits,
                # breaking the bloom ⊇ committed-index invariant (false
                # negatives ⇒ duplicate admissions).  Fail loudly.
                raise ValueError(
                    f"bloom state at {bloom_path} is {len(pre)} bytes "
                    f"but num_bits={num_bits} implies {num_bits // 8}; "
                    "delete the state or keep num_bits stable per corpus"
                )
            return pre
        return bytes(num_bits // 8)

    def _store_bloom(b: bytes) -> None:
        tmp = bloom_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, bloom_path)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        fp = batch_df.withColumn("fingerprint", doc_fingerprint(text_col))
        keep = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
        firsts = fp.join(keep, ["fingerprint", id_col]).transform(materialize_lazy)
        pre = _load_bloom()
        batch_bits = bloom_build(
            firsts.select("fingerprint"), "fingerprint", num_bits=num_bits
        )
        # OR in the batch BEFORE committing: bloom ⊇ index survives any
        # crash point (idempotent on replay)
        _store_bloom(bytes(a | b for a, b in zip(pre, batch_bits)))
        maybe = firsts.withColumn(
            "__maybe", bloom_member("fingerprint", pre)
        )
        definite_new = maybe.filter(~F.col("__maybe")).drop("__maybe")
        flagged = maybe.filter(F.col("__maybe")).drop("__maybe")
        try:
            seen = index.read().select("fingerprint")
            verified_new = flagged.join(seen, "fingerprint", "left_anti")
        except FileNotFoundError:
            verified_new = flagged
        clean = definite_new.unionByName(verified_new).transform(materialize_lazy)
        corpus.streaming_append_batch(clean, batch_id)
        index.streaming_append_batch(clean.select("fingerprint"), batch_id)

    return (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
