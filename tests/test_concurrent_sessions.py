"""Concurrent multi-tenant execution against ONE engine session — the
shared-cluster reality: N threads submitting registry queries at once
through the same SparkSession (shared catalog, shared conf, shared
temp-view namespace, shared python-worker pool).

Hazards this gate pins:
- shared-SQL queries register temp views by name on the common
  catalog (`_register_needed_views`); concurrent re-registration of
  the same view while another thread is mid-analysis must not change
  any result (definitions are identical and idempotent);
- Arrow-UDF queries (BLAS cells) share executor python workers;
- FAIR scheduling: with `spark.scheduler.pool` set per thread, long
  queries must not starve short ones into different results.

The assertion is the strongest available: every query's
(count, schema, order-insensitive value hash) signature under an
8-thread concurrent storm equals its quiet sequential signature.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from tests.conftest import SF_DIR_ORACLE
from tests.oracle_harness import spark_signature

import sparkplans.queries as Q

# mixed surface: shared-SQL views, DataFrame-API joins, window, Arrow
# BLAS cells, bloom round trip, TPC-H correlated subqueries
SLATE = [
    "pricing_summary",
    "tpch_q3_topk_revenue",
    "tpch22_q17_small_quantity",
    "tpch22_q21_suppliers_waiting",
    "window_rank",
    "dedup_exact",
    "knn_brute_force",
    "semantic_decontamination",
]


def _sig(spark, name: str):
    return spark_signature(Q.REGISTRY[name].fn(spark, SF_DIR_ORACLE))


def test_concurrent_threads_hash_identical(spark):
    sequential = {n: _sig(spark, n) for n in SLATE}

    sc = spark.sparkContext
    results: dict[str, tuple] = {}

    def run(name: str):
        # each tenant in its own FAIR pool (scheduler mode itself is
        # session-level; local pools still exercise the property that
        # per-thread scheduling metadata doesn't leak across tenants)
        sc.setLocalProperty("spark.scheduler.pool", f"tenant_{name}")
        try:
            return name, _sig(spark, name)
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    # two concurrent rounds: round 2 re-registers every shared view
    # while round 1's plans have already been analyzed — the catalog
    # race a single pass can miss
    for _ in range(2):
        with ThreadPoolExecutor(max_workers=len(SLATE)) as ex:
            for name, sig in ex.map(run, SLATE):
                assert sig == sequential[name], (
                    f"{name}: concurrent run diverged from sequential "
                    f"({sig[:2]} vs {sequential[name][:2]})"
                )
                results[name] = sig

    assert set(results) == set(SLATE)
