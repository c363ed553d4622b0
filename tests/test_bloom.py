"""Bloom filter operator: no-false-negative guarantee, FP-rate bound,
zero-exchange probe, and end-to-end equivalence of the prefilter
queries with their exact twins."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import sparkplans.queries as Q
from sparkplans import plans
from sparkplans.operators.bloom import bloom_build, bloom_fp_rate, bloom_member

from conftest import SF_DIR


def _values(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("val-"), F.col("id")).alias("v")
    )


def test_no_false_negatives_exhaustive(spark):
    """Every inserted value MUST probe true — the property that makes
    prefilter + exact verify equivalent to the exact join."""
    inserted = _values(spark, 0, 2000)
    words = bloom_build(inserted, "v", num_bits=1 << 15)
    n_member = inserted.filter(bloom_member("v", words)).count()
    assert n_member == 2000


def test_fp_rate_bounded(spark):
    """Disjoint probes false-positive at ~ the analytic rate; gate at
    3x the formula to keep the test deterministic-but-tight."""
    n, m = 2000, 1 << 15
    words = bloom_build(_values(spark, 0, n), "v", num_bits=m)
    probes = _values(spark, 1_000_000, 1_010_000)
    fp = probes.filter(bloom_member("v", words)).count() / 10_000
    expected = bloom_fp_rate(n, m, 5)
    assert fp <= max(3 * expected, 0.005), (fp, expected)


def test_build_deterministic_and_dense(spark):
    w1 = bloom_build(_values(spark, 0, 500), "v", num_bits=1 << 12)
    w2 = bloom_build(_values(spark, 0, 500), "v", num_bits=1 << 12)
    assert w1 == w2
    assert len(w1) == (1 << 12) // 8
    assert any(w != 0 for w in w1)


def test_probe_is_zero_exchange(spark):
    """The membership test is a pure projection: filtering a scan by
    bloom_member adds NO exchange — the whole point of the pattern."""
    words = bloom_build(_values(spark, 0, 100), "v", num_bits=1 << 12)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    probed = d.filter(bloom_member(F.md5("text"), words)).select("doc_id")
    assert plans.num_exchanges(probed) == 0


def test_invalid_num_bits():
    with pytest.raises(ValueError):
        bloom_build(None, "v", num_bits=100)


def test_prefilter_dedup_equals_exact(spark):
    """bloom_prefilter_dedup returns byte-identical rows to the plain
    incremental anti-join (no false negatives => same survivors)."""
    a = Q.REGISTRY["bloom_prefilter_dedup"].fn(spark, SF_DIR)
    b = Q.REGISTRY["incremental_dedup_batch"].fn(spark, SF_DIR)
    rows_a = {tuple(r) for r in a.collect()}
    rows_b = {tuple(r) for r in b.collect()}
    assert rows_a == rows_b and rows_a


def test_decontamination_no_false_negatives(spark):
    """Every exactly-shared gram is bloom-flagged: fn_ok all true and
    row set matches the exact decontamination query."""
    res = Q.REGISTRY["bloom_decontamination"].fn(spark, SF_DIR).collect()
    assert res
    assert all(r["fn_ok"] for r in res)
    exact = {
        (r["doc_id"], r["n_shared_grams"])
        for r in Q.REGISTRY["decontamination_ngrams"].fn(spark, SF_DIR).collect()
    }
    assert {(r["doc_id"], r["n_shared_grams"]) for r in res} == exact


def test_no_false_negatives_property(spark):
    """Hypothesis sweep: ANY inserted string set probes all-true —
    unicode, empties, near-collisions included."""
    from hypothesis import HealthCheck, given, settings
    import hypothesis.strategies as st

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck), derandomize=True)
    @given(vals=st.sets(st.text(min_size=0, max_size=40),
                        min_size=1, max_size=60))
    def check(vals):
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        words = bloom_build(df, "v", num_bits=1 << 12)
        assert df.filter(bloom_member("v", words)).count() == len(vals)

    check()


def test_prefilter_shrinks_join_input(spark):
    """The scale claim, measured: of the batch fingerprints, only the
    (true-dup + FP) sliver probes true — the exact anti-join's input
    shrinks to a fraction of the batch."""
    from sparkplans.functions.text import doc_fingerprint

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fp = d.select("doc_id", doc_fingerprint("text").alias("fingerprint"))
    seen = (
        fp.filter(F.col("doc_id") % 2 == 0).select("fingerprint").distinct()
    )
    batch = (
        fp.filter(F.col("doc_id") % 2 == 1).select("fingerprint").distinct()
    )
    n_seen = seen.count()
    words = bloom_build(seen, "fingerprint", num_bits=max(64, n_seen * 16))
    n_batch = batch.count()
    n_flagged = batch.filter(bloom_member("fingerprint", words)).count()
    n_true_dups = batch.join(seen, "fingerprint").count()
    # no false negatives...
    assert n_flagged >= n_true_dups
    # ...and the sliver is small: true dups + <=5% FP of the batch
    assert n_flagged <= n_true_dups + max(2, int(0.05 * n_batch)), (
        n_flagged, n_true_dups, n_batch
    )
