"""Mergeable distinct-count sketch persistence (Apache DataSketches
HLL, built into Spark as ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``).

The 100 TB pattern this enables: materialize per-(bin, key) sketches
ONCE, then answer any coarser distinct-count question (per week, per
key overall, whole corpus) by unioning the stored 1-4 KB sketch
states — never re-scanning raw data.  Plain ``approx_count_distinct``
gives the estimate but not the mergeable state; sketches are the
continuous-aggregate form of COUNT(DISTINCT).

Complements `queries/approx_distinct_users` (HLL++ estimate-only) and
`streaming.continuous_rollup` (mergeable cnt/sum/min/max); a sketch
column composes with both — it is just a binary aggregation buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkplans.functions import date_bin


def hll_rollup(
    df: DataFrame,
    id_col: str,
    keys: list[str] | None = None,
    interval: str | None = None,
    ts_col: str = "ts",
    lgk: int = 12,
) -> DataFrame:
    """Per-(bin, *keys) HLL sketch of distinct ``id_col`` values.

    Output: (bin?, *keys, sketch binary, distinct_est long).  The
    sketch column is the mergeable state — persist it; the estimate
    column is a read-time convenience.  One keyed shuffle of
    fixed-size (<= 2^lgk bytes) states regardless of corpus size.
    """
    keys = keys or []
    cols = []
    if interval is not None:
        cols.append(date_bin(ts_col, interval).alias("bin"))
    cols.extend(F.col(k) for k in keys)
    grouped = df.select(*cols, F.col(id_col)).groupBy(
        *(["bin"] if interval is not None else []), *keys
    )
    return grouped.agg(
        F.hll_sketch_agg(id_col, F.lit(lgk)).alias("sketch")
    ).withColumn("distinct_est", F.hll_sketch_estimate("sketch"))


def hll_union_rollup(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Coarsen a sketch table: union the stored states up to
    ``group_cols`` (e.g. day sketches -> per-key totals).  Union is
    lossless at matching lgK — the merged estimate equals what a
    direct sketch over the raw rows would report — so the raw corpus
    is never touched again."""
    out = (
        sketches.groupBy(*group_cols)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .withColumn("distinct_est", F.hll_sketch_estimate("sketch"))
    )
    return out
