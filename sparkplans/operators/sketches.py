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

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

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


MG_SCHEMA = StructType(
    [
        StructField("item", StringType()),
        StructField("cnt", LongType()),
    ]
)


def misra_gries_topk(
    df: DataFrame, col: str, capacity: int = 64
) -> DataFrame:
    """Misra-Gries heavy hitters: bounded-memory approximate top items
    with a deterministic error guarantee — every item with true count
    > n/(capacity+1) survives, and each reported count undercounts by
    at most n/(capacity+1).

    The mergeable-summary shape (Agarwal et al.): each partition
    maintains ``capacity`` counters over its Arrow batches
    (mapInPandas — per-partition imperative state is exactly what the
    sketch needs, and the slow path touches ``capacity`` counters per
    row, not the corpus); partial summaries then merge by summing
    per-item and re-trimming to ``capacity`` by subtracting the
    (capacity+1)-th largest merged weight.  What crosses the wire is
    partitions x capacity rows — constant per partition, like the HLL
    states above.  The exact TakeOrdered twin
    (`queries/heavy_hitters_tokens`) is the small-scale oracle; this
    is the bounded-memory scale path for when even the (item, count)
    table is too hot to shuffle exactly.
    """

    def partition_summaries(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in it:
            for item in pdf[col]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < capacity:
                    counters[item] = 1
                else:
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "cnt": list(counters.values())}
            )

    partials = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        partition_summaries, MG_SCHEMA
    )
    merged = partials.groupBy("item").agg(F.sum("cnt").alias("cnt"))
    rows = merged.collect()  # partitions x capacity rows — driver-safe
    rows.sort(key=lambda r: (-r["cnt"], r["item"]))
    if len(rows) > capacity:
        cut = rows[capacity]["cnt"]
        rows = [
            (r["item"], r["cnt"] - cut)
            for r in rows[:capacity]
            if r["cnt"] - cut > 0
        ]
    else:
        rows = [(r["item"], r["cnt"]) for r in rows]
    spark = df.sparkSession
    return spark.createDataFrame(rows or [], "item string, est_count bigint")


def kmv_sketch(
    df: DataFrame, col: str, k: int = 256, salt: str = "kmv"
) -> DataFrame:
    """KMV / bottom-k sketch: the k smallest md5 hashes of a column's
    DISTINCT values, with the values carried alongside.  Three
    properties make it the third mergeable summary beside the HLL and
    Misra-Gries states above:

    - **deterministic**: hash order replaces RNG, so the sketch is a
      pure function of the value set (same guarantee style as the
      repo's other samplers);
    - **mergeable**: sketch(A ∪ B) = bottom_k(sketch(A) ∪ sketch(B))
      EXACTLY (min-wise hashing), proven by the merge-equivalence
      test;
    - **dual-use**: the k-th smallest hash estimates distinct counts
      ((k-1)/h_k on the unit interval), and the carried values are a
      uniform sample of the distinct set, so order statistics
      (median, quantiles) fall out of the same state.

    Plan shape: one column projection, then ``ORDER BY hash LIMIT k``
    — Spark fuses that to TakeOrderedAndProject (per-partition heaps,
    no global sort), so corpus cost is one scan and k·partitions rows
    of transfer."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col("value"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (
        df.select(F.col(col).cast("string").alias("value"))
        .distinct()
        .select("value", h.alias("h"))
        .orderBy("h", "value")
        .limit(k)
    )


def kmv_merge(sketches: list[DataFrame], k: int = 256) -> DataFrame:
    """Merge KMV sketches: union the states, keep the global bottom-k
    (dedup by value first — the same value hashes identically in every
    sketch)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h", "value").limit(k)


def kmv_distinct_estimate(sketch_rows: list, k: int) -> float:
    """(k-1) / h_k estimator on the unit interval (h normalized by the
    60-bit hash space).  ``sketch_rows`` is the collected sketch (a
    list of Rows) — KB-sized driver state, like the HLL registers."""
    if len(sketch_rows) < k:
        return float(len(sketch_rows))  # exact: sketch holds everything
    hk = max(r.h for r in sketch_rows)
    return (k - 1) / (hk / float(1 << 60))


# ---------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------

def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 11,
) -> DataFrame:
    """Count-Min Sketch as a DataFrame: the d×w counter table
    ``(row, bucket, cnt)`` — frequency estimation with O(d·w) state
    for any number of distinct items.

    Build is ONE two-phase aggregation: each value explodes to its
    ``depth`` (row, bucket) cells (``xxhash64`` per row seed), counts
    combine map-side, and the shuffle carries at most d·w rows — the
    sketch, never the corpus.  Two sketches with the same (depth,
    width, seed) merge by unioning tables and summing ``cnt`` —
    mergeability is the point: per-partition/per-day sketches roll up
    without re-scanning raw data (same deployment note as hll_rollup).

    Guarantees (fixed seeds => deterministic): estimates never
    UNDER-count; over-count ≤ e·N/width with probability 1-e^{-depth}
    per query (Markov over independent rows).
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(F.xxhash64(F.col(col), F.lit(seed + i)), F.lit(width))
                .cast("int")
                .alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    items: DataFrame,
    col: str,
    cms: DataFrame,
    depth: int = 4,
    width: int = 1024,
    seed: int = 11,
) -> DataFrame:
    """Point-query the sketch for every row of ``items``: join each
    item's d cells against the (broadcast — d·w rows, KBs) sketch
    table and take the min over rows.  Absent cells count 0 only if a
    bucket row is genuinely missing from the sketch (possible for
    sparse sketches) — coalesced accordingly.  Adds one small-keyed
    aggregation; the sketch side never shuffles."""
    probes = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            F.xxhash64(F.col(col), F.lit(seed + i)),
                            F.lit(width),
                        )
                        .cast("int")
                        .alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(cms), ["row", "bucket"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
    )
