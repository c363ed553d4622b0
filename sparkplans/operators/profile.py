"""Single-pass table profiling — the engine-level analog of the
reference's statistics surface (`with_collect_stat` /
`aggregate_statistics`, tests/setup_tables.rs:43,69) turned into a
user-facing operator: per-column null counts, distinct cardinality,
and numeric ranges from ONE aggregation pass over the table.

Scale: every statistic is a distributive/sketch aggregate, so the
whole profile is one partial+final aggregation — a single constant-
size state per partition crosses the wire, never the data.  With
``approx=True`` (default) distinct counts use HLL++; the exact mode
exists for oracle parity (`queries/orders_profile`) and small dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregation pass.

    Returns one row per column: (column, dtype, n_rows, n_nulls,
    n_distinct, min_value, max_value) — min/max are populated for
    numeric columns (as double), null otherwise.
    """
    columns = columns or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    unknown = [c for c in columns if c not in fields]
    if unknown:
        raise ValueError(f"no such columns: {unknown}")

    distinct_fn = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(distinct_fn(c).alias(f"__dist_{c}"))
        if isinstance(fields[c], NumericType):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
    row = df.agg(*aggs)

    structs = []
    for c in columns:
        numeric = isinstance(fields[c], NumericType)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(fields[c].simpleString()).alias("dtype"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if numeric else F.lit(None).cast("double")).alias(
                    "min_value"
                ),
                (F.col(f"__max_{c}") if numeric else F.lit(None).cast("double")).alias(
                    "max_value"
                ),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
