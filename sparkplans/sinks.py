"""Write sinks: the output side of the pipeline.

The reference has no file sinks at all (SURVEY §2.1: "No other sinks
exist — no COPY, no writes to files"); a complete engine needs them,
and at 100 TB the write layout *is* the read performance of every
downstream job.  Three layouts:

- **copy_to** — ``COPY (query) TO path (FORMAT ...)``-style export to
  parquet/csv/json.
- **write_partitioned** — hive-style ``partitionBy`` layout; reads
  filtered on partition columns prune whole directories (the listing
  never touches excluded partitions).
- **write_sorted** — writes each output file sorted on the given keys
  and registers the result in the engine catalog ``WITH ORDER``, so
  reads back through the catalog get sort-elision and ordered merges.
  This closes the reference's loop: its ``WITH ORDER`` tables are
  produced out-of-band (docs/2:17-23); ours are produced by the engine
  itself.

Scale notes: ``partitionBy`` with high-cardinality keys creates a
small-files problem — repartition on the partition columns first so
each task writes one file per partition (done below, cap via
``files_per_partition``).  ``maxRecordsPerFile`` bounds file size
without an extra shuffle.
"""

from __future__ import annotations

import os

from typing import Iterable

from pyspark.sql import DataFrame, functions as F

from sparkplans.ordering import normalize_sort_keys, sort_columns


def bloom_filter_options(bloom_filters: dict[str, int]) -> dict[str, str]:
    """Per-column parquet bloom-filter write options
    (``parquet.bloom.filter.enabled#col`` +
    ``parquet.bloom.filter.expected.ndv#col``), keyed by expected
    distinct count.

    The 100 TB rationale: row-group min/max stats only skip data on
    columns the layout is sorted or clustered by; a point lookup on a
    high-cardinality UNSORTED column (a doc fingerprint, a user id)
    scans everything.  A parquet bloom filter answers "is this value
    possibly in this row group" from the footer, so a selective
    ``col = literal`` predicate skips non-matching row groups without
    reading a page — at ~10 bits/value it is the cheap complement to
    Z-order for exact-match columns.  Readers need no code change:
    parquet-mr consults the filter whenever the predicate is pushed
    (asserted by the plan's PushedFilters)."""
    opts: dict[str, str] = {}
    for col, ndv in bloom_filters.items():
        opts[f"parquet.bloom.filter.enabled#{col}"] = "true"
        opts[f"parquet.bloom.filter.expected.ndv#{col}"] = str(int(ndv))
    return opts


def copy_to(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    single_file: bool = False,
    bloom_filters: dict[str, int] | None = None,
    **options: str,
) -> None:
    """Export a result to files (parquet/csv/json).  CSV gets headers
    by default.  ``single_file=True`` coalesces to one output file —
    driver-friendly for small exports, never for big ones.
    ``bloom_filters={col: expected_ndv}`` writes parquet bloom filters
    for point-lookup row-group skipping (see
    :func:`bloom_filter_options`)."""
    fmt = format.lower()
    if bloom_filters:
        options.update(bloom_filter_options(bloom_filters))
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    out = df.coalesce(1) if single_file else df
    out.write.format(fmt).mode(mode).options(**options).save(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Iterable[str],
    format: str = "parquet",
    mode: str = "overwrite",
    files_per_partition: int = 1,
    max_records_per_file: int | None = None,
    **options: str,
) -> None:
    """Hive-layout write: ``path/key=value/...``.  Repartitions on the
    partition columns first so each partition directory gets
    ``files_per_partition`` files instead of one small file per
    upstream task (the classic small-files failure at scale)."""
    pcols = list(partition_by)
    if files_per_partition > 1:
        # round-robin over N writer tasks: every task holds rows of
        # every partition value, so each dir gets exactly N files
        out = df.repartition(files_per_partition)
    else:
        out = df.repartition(*[F.col(c) for c in pcols])
    w = out.write.format(format.lower()).mode(mode).partitionBy(*pcols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.options(**options).save(path)


def compact(
    spark,
    path: str,
    target_files: int,
    format: str = "parquet",
    order_by=None,
    **options: str,
) -> tuple[int, int]:
    """Small-files compaction: rewrite a directory into
    ``target_files`` files (optionally re-sorted), atomically via a
    staging dir + rename.  Returns (files_before, files_after).

    The 100 TB maintenance op: streaming sinks and fine-grained
    partitioned writes accumulate small files; periodic compaction
    restores scan efficiency (fewer tasks, bigger sequential reads)."""
    import shutil
    import tempfile

    before = [
        f for f in os.listdir(path)
        if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(path, f))
    ]
    df = spark.read.format(format.lower()).options(**options).load(path)
    staging = tempfile.mkdtemp(prefix="compact_", dir=os.path.dirname(path.rstrip("/")))
    if order_by:
        keys = normalize_sort_keys(order_by)
        cols = sort_columns(keys)
        out = df.repartitionByRange(target_files, *cols).sortWithinPartitions(*cols)
    else:
        out = df.repartition(target_files)
    out.write.format(format.lower()).mode("overwrite").save(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    after = [
        f for f in os.listdir(path)
        if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(path, f))
    ]
    return len(before), len(after)


def upsert(
    spark,
    path: str,
    updates: DataFrame,
    key: str,
    target_files: int | None = None,
    format: str = "parquet",
) -> tuple[int, int]:
    """MERGE-style upsert into a file directory: rows in ``updates``
    replace same-key rows in the target; new keys append.  Implemented
    as anti-join + union + atomic staging rewrite (the
    copy-on-write strategy lakehouse formats use, minus the txn log).
    Returns (rows_updated, rows_inserted).

    Scale: one broadcast/shuffled anti-join on the key and one full
    rewrite — right for dimension-table maintenance; for fact-scale
    upserts partition the target and rewrite only touched partitions.
    """
    import shutil
    import tempfile

    target = spark.read.format(format.lower()).load(path)
    existing_keys = target.select(key).distinct()
    upd_keys = updates.select(key).distinct()
    updated = existing_keys.join(upd_keys, key, "left_semi").count()
    inserted = upd_keys.join(existing_keys, key, "left_anti").count()

    kept = target.join(updates.select(key), key, "left_anti")
    merged = kept.unionByName(updates.select(*target.columns))
    if target_files:
        merged = merged.repartition(target_files)
    staging = tempfile.mkdtemp(prefix="upsert_", dir=os.path.dirname(path.rstrip("/")))
    merged.write.format(format.lower()).mode("overwrite").save(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    return updated, inserted


def upsert_partitioned(
    spark,
    path: str,
    updates: DataFrame,
    key: str,
    partition_col: str,
    format: str = "parquet",
) -> tuple[int, list[str]]:
    """Partition-scoped MERGE into a hive-layout table
    (``path/partition_col=value/``): only the partitions present in
    ``updates`` are rewritten; every other partition directory is not
    read, not written, not listed past the top level.  Returns
    ``(rows_upserted, touched_partition_values)``.

    This is the fact-scale path :func:`upsert` points at — at 100 TB
    a full copy-on-write rewrite is off the table, but a day-keyed or
    tenant-keyed target typically takes updates for a handful of
    partitions; the rewrite cost is proportional to the touched data,
    not the table.  Same atomic staging-rename discipline as
    :func:`upsert`, applied per partition directory.  Requires every
    update row to carry its partition value (rows may move *into* a
    new partition, but cross-partition key moves are out of scope —
    the caller owns key→partition stability, as with any hive-layout
    MERGE).
    """
    import shutil
    import tempfile

    touched = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    n_up = updates.count()
    fmt = format.lower()
    for val in touched:
        pdir = os.path.join(path, f"{partition_col}={val}")
        batch = updates.filter(F.col(partition_col) == F.lit(val)).drop(
            partition_col
        )
        if os.path.isdir(pdir):
            existing = spark.read.format(fmt).load(pdir)
            kept = existing.join(batch.select(key), key, "left_anti")
            merged = kept.unionByName(batch.select(*existing.columns))
        else:
            merged = batch
        staging = tempfile.mkdtemp(
            prefix=f"upsert_{partition_col}_", dir=path
        )
        merged.write.format(fmt).mode("overwrite").save(staging)
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)
        os.rename(staging, pdir)
    return n_up, sorted(str(v) for v in touched)


def write_sorted(
    df: DataFrame,
    path: str,
    order_by,
    num_files: int = 1,
    format: str = "parquet",
    mode: str = "overwrite",
    catalog=None,
    register_as: str | None = None,
    bloom_filters: dict[str, int] | None = None,
    **options: str,
):
    """Write files that are each internally sorted on ``order_by`` and
    (optionally) register the directory in the engine catalog ``WITH
    ORDER`` so later reads plan around the order.

    ``repartitionByRange`` + ``sortWithinPartitions`` gives globally
    range-split, per-file fully-sorted output — the layout the
    reference's ListingTable expects (tests/setup_tables.rs:44-48),
    and the one that makes merge reads / sorted aggregation cheap.
    ``bloom_filters={col: ndv}`` adds parquet bloom filters for the
    columns the sort DOESN'T cover — min/max stats skip on the sort
    keys, blooms skip on everything else (:func:`bloom_filter_options`).
    """
    if bloom_filters:
        options = {**options, **bloom_filter_options(bloom_filters)}
    keys = normalize_sort_keys(order_by)
    sort_cols = sort_columns(keys)
    out = (
        df.repartitionByRange(num_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
    )
    out.write.format(format.lower()).mode(mode).options(**options).save(path)
    if catalog is not None and register_as:
        return catalog.create_external_table(
            register_as, path, format=format, with_order=order_by
        )
    return None
