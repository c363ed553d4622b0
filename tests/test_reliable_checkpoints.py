"""Reliable-checkpoint routing (sparkplans/materialize.py): corpus-
sized lineage cuts can be sent to reliable checkpoint storage instead
of non-replicated executor-local localCheckpoint state — the
executor-loss hardening documented in SCALE.md."""

import os

import pytest
from pyspark.sql import functions as F

from sparkplans.materialize import DIR_KEY, RELIABLE_FLAG, materialize


@pytest.fixture()
def reliable(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    spark.conf.set(RELIABLE_FLAG, "true")
    spark.conf.set(DIR_KEY, ckdir)
    yield ckdir
    spark.conf.set(RELIABLE_FLAG, "false")
    # leave any sc checkpoint dir in place — harmless, session-scoped


def _ckpt_files(root):
    return [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(root)
        for f in fs
        if not f.startswith(".")
    ]


def test_default_is_local_no_files(spark, tmp_path):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out = materialize(df)
    assert out.count() == 100
    # localCheckpoint leaves nothing under any would-be checkpoint dir
    assert _ckpt_files(str(tmp_path)) == []


def test_reliable_writes_to_configured_dir(spark, reliable):
    df = spark.range(1000).withColumn("x", F.col("id") % 7)
    out = materialize(df)
    assert out.count() == 1000
    # reliable checkpoint materialized partitions under the dir
    assert len(_ckpt_files(reliable)) > 0
    # and the frame is re-readable with identical content
    assert out.agg(F.sum("x")).collect()[0][0] == sum(i % 7 for i in range(1000))


def test_semdedup_under_reliable_mode_same_result(spark, reliable):
    """The SemDeDup parents route through materialize(): under the
    option the result is identical and the checkpoint dir is used."""
    import numpy as np

    from sparkplans.operators.similarity import semdedup

    rng = np.random.RandomState(7)
    base = rng.randn(40, 8)
    base[25] = base[3] + 1e-9  # planted near-identical pair
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    res = {r.vec_id: (r.kept, r.dup_of)
           for r in semdedup(df, num_centroids=4, threshold=0.999999).collect()}
    assert res[25] == (False, 3)
    assert len(_ckpt_files(reliable)) > 0

    spark.conf.set(RELIABLE_FLAG, "false")
    res_local = {r.vec_id: (r.kept, r.dup_of)
                 for r in semdedup(df, num_centroids=4, threshold=0.999999).collect()}
    assert res == res_local


def test_pagerank_under_reliable_mode_same_result(spark, reliable):
    """PageRank's per-iteration materialize carries the dangling mass
    as an observe() metric; under reliable checkpoints the metric (or
    its explicit-aggregate fallback) must yield identical ranks, and
    release() must be a safe no-op on checkpoint-file frames."""
    from sparkplans.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4), (4, 5)], "src long, dst long"
    )
    rel = {r.node: r.rank for r in pagerank(edges, iterations=6).collect()}
    assert len(_ckpt_files(reliable)) > 0

    spark.conf.set(RELIABLE_FLAG, "false")
    loc = {r.node: r.rank for r in pagerank(edges, iterations=6).collect()}
    assert set(rel) == set(loc)
    for v in loc:
        assert abs(rel[v] - loc[v]) < 1e-12, (v, rel[v], loc[v])
    assert abs(sum(rel.values()) - 1.0) < 1e-9


def test_adaptive_storage_level_picks_by_size(spark):
    """Adaptive materialize storage (VERDICT r3 item 1): small frames
    get deserialized memory (fast re-reads — the sf0.1 bench cost of
    always-serialized was 1.8-2.4x on materialize-heavy queries),
    frames above the estimate threshold get the serialized level that
    kept sf10 from OOMing, and an explicit conf always wins."""
    from sparkplans.materialize import (
        ADAPTIVE_BYTES_KEY,
        STORAGE_KEY,
        plan_size_bytes,
        storage_level_key,
    )

    df = spark.range(1000).withColumn("x", F.col("id") * 2)
    est = plan_size_bytes(df)
    assert est is not None and 0 < est < (64 << 20)
    assert storage_level_key(df) == "memory_deser"

    # shrink the threshold below the frame's estimate -> serialized
    spark.conf.set(ADAPTIVE_BYTES_KEY, "1")
    try:
        assert storage_level_key(df) == "memory_ser"
    finally:
        spark.conf.unset(ADAPTIVE_BYTES_KEY)

    # row-multiplying plans (join/explode) shrink the threshold 64x:
    # Catalyst can't see their output multiplicity, so the estimate
    # is only a lower bound (the sf10 LSH candidate frame measured
    # 38 MB estimated vs 31.5M actual pairs — a real OOM)
    from sparkplans.materialize import _has_row_multiplier

    joined = df.join(df.withColumnRenamed("x", "y"), "id")
    assert not _has_row_multiplier(df)
    assert _has_row_multiplier(joined)
    assert _has_row_multiplier(
        spark.createDataFrame([([1, 2],)], "a array<int>").select(
            F.explode("a")
        )
    )
    spark.conf.set(ADAPTIVE_BYTES_KEY, str((64 << 20)))
    try:
        assert storage_level_key(joined) == "memory_deser"  # tiny est
        spark.conf.set(ADAPTIVE_BYTES_KEY, str(plan_size_bytes(joined) * 63))
        # est > limit/64 -> serialized even though est < limit
        assert storage_level_key(joined) == "memory_ser"
    finally:
        spark.conf.unset(ADAPTIVE_BYTES_KEY)

    # explicit level overrides adaptivity in both directions
    for forced in ("memory_ser", "disk", "memory_deser"):
        spark.conf.set(STORAGE_KEY, forced)
        try:
            assert storage_level_key(df) == forced
        finally:
            spark.conf.unset(STORAGE_KEY)

    # an explicit-but-invalid level (e.g. a typo) must fail loudly,
    # not silently fall through to adaptive behavior
    spark.conf.set(STORAGE_KEY, "memory-deser")
    try:
        with pytest.raises(ValueError, match="memory-deser"):
            storage_level_key(df)
    finally:
        spark.conf.unset(STORAGE_KEY)


def test_engine_options_carry_the_flag():
    from sparkplans.session import EngineOptions

    conf = EngineOptions(
        reliable_checkpoints=True, checkpoint_dir="/tmp/x"
    ).to_spark_conf()
    assert conf[RELIABLE_FLAG] == "true"
    assert conf[DIR_KEY] == "/tmp/x"
    assert RELIABLE_FLAG not in EngineOptions().to_spark_conf()


def test_observed_timeout_is_loud():
    """An observed() timeout means the caller silently burns the poll
    window plus a fallback job — the first one must warn and every one
    must count, so a Spark route that stops firing the listener shows
    up in bench output instead of as an invisible per-iteration 5 s."""
    import warnings

    from sparkplans import materialize as M

    class _EmptyMetrics:
        def isEmpty(self):
            return True

    class _FakeObs:
        class _jo:  # noqa: N801 - mimics pyspark Observation internals
            @staticmethod
            def getOrEmpty():
                return _EmptyMetrics()

    before = M.observed_timeouts
    M.observed_timeouts = 0
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            assert M.observed(_FakeObs(), ["x"], timeout_s=0.02) is None
            assert M.observed(_FakeObs(), ["x"], timeout_s=0.02) is None
        assert M.observed_timeouts == 2
        msgs = [str(w.message) for w in caught]
        # first timeout warns, second stays quiet (counter only)
        assert len([m for m in msgs if "Observation metrics" in m]) == 1
    finally:
        M.observed_timeouts = before
