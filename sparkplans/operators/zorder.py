"""Z-order (Morton) clustering for multi-dimensional file pruning.

Linear sort layouts (sinks.write_sorted) prune scans on the leading
sort key only; filters on a second column still read every file.
Z-ordering interleaves the bits of several columns into one sort key,
so every clustered column has bounded value spread per file — parquet
min/max row-group stats then prune scans on ANY of the clustered
columns.  This is the standard lakehouse layout trick (Delta/Iceberg
``OPTIMIZE ZORDER BY``), built here from plain DataFrame ops:

1. one tiny aggregate pass computes each column's (min, max);
2. values scale to 16-bit ranks JVM-side;
3. ranks interleave into the Morton key (a sum of shift/mask terms —
   whole-stage-codegen-friendly, no UDF);
4. ``repartitionByRange(z) + sortWithinPartitions(z)`` writes files
   that tile the multi-dim space.

At 100 TB the min/max pass is a cheap statistics scan (or comes from
table stats), and the range partition on the z-key is the only
shuffle.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, functions as F

Z_BITS = 16  # bits per dimension; 2 dims -> 32-bit key, 3 -> 48


def _rank16(col: Column, cmin: Column, cmax: Column) -> Column:
    """Scale a numeric column to an integer rank in [0, 2^16)."""
    span = (cmax.cast("double") - cmin.cast("double"))
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(F.lit(0.0))
    return F.least(
        F.floor(frac * ((1 << Z_BITS) - 1)).cast("bigint"), F.lit((1 << Z_BITS) - 1)
    )


def z_value(ranks: list[Column], bits: int = Z_BITS) -> Column:
    """Interleave k integer ranks bitwise into one Morton key."""
    k = len(ranks)
    out = F.lit(0).cast("bigint")
    for bit in range(bits):
        for d, r in enumerate(ranks):
            out = out + (
                (r.bitwiseAND(F.lit(1 << bit)) / (1 << bit)).cast("bigint")
                * F.lit(1 << (bit * k + d)).cast("bigint")
            )
    return out


def with_zorder_key(
    df: DataFrame, cols: Iterable[str], key_name: str = "__z"
) -> DataFrame:
    """Append the Morton key column; min/max come from one aggregate
    pass broadcast back onto the rows."""
    cols = list(cols)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    stats = df.agg(*aggs)
    joined = df.join(F.broadcast(stats))
    ranks = [
        _rank16(F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}")) for c in cols
    ]
    drop = [f"__min_{c}" for c in cols] + [f"__max_{c}" for c in cols]
    return joined.withColumn(key_name, z_value(ranks)).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Iterable[str],
    num_files: int = 8,
    format: str = "parquet",
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write ``num_files`` files tiling the space of ``cols``: range
    partition + sort on the Morton key, key dropped before write."""
    keyed = with_zorder_key(df, cols)
    (
        keyed.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(format.lower())
        .mode(mode)
        .options(**options)
        .save(path)
    )
