"""Count-Min Sketch: overestimate-only guarantee, error bound under
fixed seeds, and cell-wise mergeability."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

import sparkplans.queries as Q
from sparkplans.operators.sketches import cms_build, cms_estimate

from conftest import SF_DIR

DEPTH, WIDTH = 4, 256


def _stream(spark, n_rows=5000, n_keys=100):
    """Deterministic skewed stream; keeps id for stable splits."""
    return (
        spark.range(n_rows)
        .select(
            "id",
            F.concat(
                F.lit("k"), (F.pmod(F.xxhash64("id"), F.lit(n_keys)) + 1)
            ).alias("v"),
        )
    )


def test_cms_never_undercounts_exhaustive(spark):
    s = _stream(spark)
    cms = cms_build(s, "v", depth=DEPTH, width=WIDTH)
    exact = s.groupBy("v").agg(F.count("*").alias("exact"))
    est = cms_estimate(exact.select("v"), "v", cms, depth=DEPTH, width=WIDTH)
    bad = exact.join(est, "v").filter(F.col("cms_estimate") < F.col("exact"))
    assert bad.count() == 0


def test_cms_error_bound(spark):
    """Over-count ≤ e·N/width for every key (deterministic once seeds
    are fixed; the classic CMS guarantee holds w.h.p. and comfortably
    in practice at depth 4)."""
    s = _stream(spark)
    n = s.count()
    bound = math.e * n / WIDTH
    cms = cms_build(s, "v", depth=DEPTH, width=WIDTH)
    exact = s.groupBy("v").agg(F.count("*").alias("exact"))
    est = exact.join(
        cms_estimate(exact.select("v"), "v", cms, depth=DEPTH, width=WIDTH), "v"
    )
    over = est.select(
        F.max(F.col("cms_estimate") - F.col("exact")).alias("m")
    ).collect()[0]["m"]
    assert over <= bound, (over, bound)


def test_cms_merge_equals_single_build(spark):
    """Sketch of (A ∪ B) == cell-wise sum of sketch(A) and sketch(B) —
    the mergeability that lets per-day sketches roll up."""
    s = _stream(spark)
    a = s.filter(F.col("id") % 2 == 0)
    b = s.filter(F.col("id") % 2 == 1)
    whole = cms_build(s, "v", depth=DEPTH, width=WIDTH)
    merged = (
        cms_build(a, "v", depth=DEPTH, width=WIDTH)
        .unionByName(cms_build(b, "v", depth=DEPTH, width=WIDTH))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    lhs = {(r["row"], r["bucket"]): r["cnt"] for r in whole.collect()}
    rhs = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert lhs == rhs


def test_cms_query_estimates_match_exact_top20(spark):
    """For the corpus top-20 tokens, every estimate dominates its exact
    count (the registered query's overest_ok column is all-true)."""
    res = Q.REGISTRY["cms_token_counts"].fn(spark, SF_DIR).collect()
    assert len(res) == 20
    assert all(r["overest_ok"] for r in res)


def test_cms_never_undercounts_property(spark):
    """Hypothesis sweep: estimates dominate exact counts for ANY
    generated multiset (duplicates, unicode, empty strings)."""
    from hypothesis import HealthCheck, given, settings
    import hypothesis.strategies as st

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck), derandomize=True)
    @given(vals=st.lists(st.text(min_size=0, max_size=20),
                         min_size=1, max_size=80))
    def check(vals):
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        cms = cms_build(df, "v", depth=3, width=64)
        exact = df.groupBy("v").agg(F.count("*").alias("exact"))
        est = cms_estimate(exact.select("v"), "v", cms, depth=3, width=64)
        bad = exact.join(est, "v").filter(
            F.col("cms_estimate") < F.col("exact")
        )
        assert bad.count() == 0

    check()
