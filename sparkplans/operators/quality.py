"""Data-quality validation: declarative expectations over DataFrames.

The dbt-test / Great-Expectations primitive, distributed: each rule
compiles to a JVM-side aggregate, ALL rules evaluate in ONE pass over
the data (a single agg, no per-rule scans), and the report is a tiny
driver-side summary.  At 100 TB one pass vs R passes is the whole
game.

Rules:
- ``not_null(col)``            — no NULLs
- ``unique(col)``              — no duplicate values
- ``in_range(col, lo, hi)``    — all values within [lo, hi]
- ``accepted_values(col, vs)`` — all values drawn from a fixed set
- ``matches(col, regex)``      — all non-null values match
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    violation: Column  # 1 when the row violates, else 0
    distinct_check: str | None = None  # column for uniqueness rules


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.when(F.col(col).isNull(), 1).otherwise(0))


def in_range(col: str, lo, hi) -> Rule:
    bad = F.col(col).isNotNull() & ~F.col(col).between(lo, hi)
    return Rule(f"in_range({col},{lo},{hi})", F.when(bad, 1).otherwise(0))


def accepted_values(col: str, values) -> Rule:
    bad = F.col(col).isNotNull() & ~F.col(col).isin(list(values))
    return Rule(f"accepted_values({col})", F.when(bad, 1).otherwise(0))


def matches(col: str, pattern: str) -> Rule:
    bad = F.col(col).isNotNull() & ~F.col(col).rlike(pattern)
    return Rule(f"matches({col})", F.when(bad, 1).otherwise(0))


def unique(col: str) -> Rule:
    # violations counted as rows beyond the first per value
    return Rule(f"unique({col})", F.lit(0), distinct_check=col)


def validate(df: DataFrame, rules: list[Rule]) -> dict[str, int]:
    """Evaluate all rules in one aggregate pass (plus one countDistinct
    per uniqueness rule, fused into the same agg).  Returns
    {rule_name: violation_count}; all zeros = clean."""
    aggs = []
    names = []
    for r in rules:
        if r.distinct_check:
            aggs.append(
                (F.count(r.distinct_check) - F.countDistinct(r.distinct_check))
                .cast("bigint")
                .alias(r.name)
            )
        else:
            aggs.append(F.sum(r.violation).cast("bigint").alias(r.name))
        names.append(r.name)
    row = df.agg(*aggs).collect()[0]
    return {n: (row[n] or 0) for n in names}
