"""Hypertable-style multi-granularity time-series rollups.

The reference's flagship query buckets a time-series fact table with
``date_bin`` (tests/opt_parallel_execution.rs:33-41); time-series
stores generalize that into *continuous aggregates*: the same measure
maintained at several granularities (1m -> 5m -> 1h -> 1d).

The scale-critical property: each coarser level re-aggregates the
NEXT-FINER level, not the raw data.  Raw is scanned exactly once; a
1-day level over 100 TB of events aggregates a few million 1-hour
rows instead.  That's exact for decomposable aggregates
(count/sum/min/max; avg carried as sum+count and finalized at read
time).

Correctness contract: every level must equal the direct aggregation
of raw data at that granularity — the oracle checks exactly that
(queries/hypertable_rollup_1h computes 1h THROUGH the cascade and
DuckDB computes it directly from raw; hash match proves the cascade
exact).  Requires each interval to be an integer multiple of the
previous (validated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkplans.functions.datetime import date_bin

_UNITS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
}


def _interval_seconds(interval: str) -> int:
    n, unit = interval.split()
    return int(n) * _UNITS[unit.lower()]


def timeseries_rollup(
    events: DataFrame,
    intervals: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Build the rollup cascade; returns {interval: DataFrame}.

    Each level has (bin, *keys, cnt, sum_value, min_value, max_value);
    level i>0 is computed from level i-1 (sum of counts/sums, min of
    mins, max of maxes) — epoch-aligned bins make the containment
    exact.  Each level is one shuffle over the previous level's bins,
    so total shuffle volume shrinks geometrically with granularity.
    """
    secs = [_interval_seconds(iv) for iv in intervals]
    for a, b in zip(secs, secs[1:]):
        if b % a != 0:
            raise ValueError(
                f"rollup intervals must nest: {b}s is not a multiple of {a}s"
            )
    keys = keys or []
    levels: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for iv in intervals:
        if prev is None:
            # sum accumulates in DECIMAL (engine-stable, see
            # queries/__init__.py module docstring); min/max stay on
            # the raw double — they don't accumulate error and decimal
            # rounding would perturb them.
            cur = (
                events.select(
                    date_bin(ts_col, iv).alias("bin"),
                    *keys,
                    F.col(value_col).cast("decimal(18,6)").alias("v"),
                    F.col(value_col).alias("v_raw"),
                )
                .groupBy("bin", *keys)
                .agg(
                    F.count("*").alias("cnt"),
                    F.sum("v").alias("sum_value"),
                    F.min("v_raw").alias("min_value"),
                    F.max("v_raw").alias("max_value"),
                )
            )
        else:
            cur = (
                prev.select(
                    date_bin("bin", iv).alias("bin"),
                    *keys,
                    "cnt",
                    "sum_value",
                    "min_value",
                    "max_value",
                )
                .groupBy("bin", *keys)
                .agg(
                    F.sum("cnt").alias("cnt"),
                    F.sum("sum_value").alias("sum_value"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
        levels[iv] = cur
        prev = cur
    return levels


def finalize(level: DataFrame) -> DataFrame:
    """Read-time finalization: decimal accumulators -> double, plus
    the derived average (sum/count — the reason avg is never stored).
    The division runs in IEEE doubles on the exact decimal sum —
    engines disagree on DECIMAL-division scale/rounding rules (found
    at sf0.1: Spark HALF_UP at its result scale vs DuckDB's), but a
    single double division of identical operands is bit-exact
    everywhere."""
    return level.select(
        "*",
        (F.col("sum_value").cast("double") / F.col("cnt")).alias("avg_value"),
    ).withColumn("sum_value", F.col("sum_value").cast("double"))
