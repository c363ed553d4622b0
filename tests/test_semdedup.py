"""SemDeDup (k-means semantic dedup) — planted-duplicate recall and
policy invariants for operators/similarity.semdedup."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from sparkplans.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


def _load(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_planted_exact_duplicate_dropped(spark):
    """A verbatim copy of an existing vector (cos = 1) must be dropped
    with dup_of pointing at an earlier near-duplicate, and the
    original (smallest id in its near-set) must survive unless it has
    its own earlier neighbor."""
    e = _load(spark)
    clones = e.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    res = similarity.semdedup(
        e.unionByName(clones), num_centroids=8, threshold=0.95, iters=2
    ).cache()
    planted = {r.vec_id: r for r in res.filter(F.col("vec_id") >= 100000).collect()}
    assert set(planted) == {100000, 100001, 100002}
    for r in planted.values():
        assert not r.kept, r
        assert r.dup_of is not None and r.dup_of < r.vec_id


def test_policy_first_keeper_exact(spark):
    """Brute-force re-derivation of the policy from the operator's own
    cluster assignment: kept <=> no same-cluster smaller-id neighbor
    at >= threshold; dup_of == min such neighbor."""
    thr = 0.35
    res = similarity.semdedup(
        _load(spark), num_centroids=8, threshold=thr, iters=2
    )
    rows = res.collect()
    by_cid: dict[int, list] = {}
    for r in rows:
        by_cid.setdefault(r.cid, []).append(r)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    n_dropped = 0
    for members in by_cid.values():
        members.sort(key=lambda r: r.vec_id)
        for i, r in enumerate(members):
            earlier = [
                s.vec_id
                for s in members[:i]
                if cos(list(s.embedding), list(r.embedding)) >= thr
            ]
            if earlier:
                assert not r.kept and r.dup_of == min(earlier), r.vec_id
                n_dropped += 1
            else:
                assert r.kept and r.dup_of is None, r.vec_id
    assert n_dropped > 0  # threshold chosen so the corpus has dups


def test_more_clusters_never_more_drops(spark):
    """Finer clustering can only split near-sets apart: the dropped
    set with more centroids is a subset of the single-cluster
    (all-pairs) dropped set — the paper's recall/cost dial."""
    e = _load(spark).limit(200)
    coarse = set(
        r.vec_id
        for r in similarity.semdedup(e, num_centroids=1, threshold=0.35, iters=1)
        .filter(~F.col("kept"))
        .collect()
    )
    fine = set(
        r.vec_id
        for r in similarity.semdedup(e, num_centroids=8, threshold=0.35, iters=2)
        .filter(~F.col("kept"))
        .collect()
    )
    assert fine <= coarse
    assert coarse  # all-pairs at 0.35 finds something


def test_empty_corpus(spark):
    e = _load(spark).filter(F.col("vec_id") < 0)
    res = similarity.semdedup(e, num_centroids=4, threshold=0.9, iters=1)
    assert res.count() == 0
    assert set(res.columns) == {"vec_id", "cid", "embedding", "kept", "dup_of"}


def test_triangle_pair_scores_fold_blas_identical(spark):
    """The two scoring engines of the shared triangle core (pure
    codegen fold vs per-cell BLAS matmul) must produce the IDENTICAL
    pair set — same ids, same 6-dp cosines — including under a
    planted zero-norm vector, which has no defined cosine and must
    appear in NO pair on either path (Spark orders NaN above
    everything, numpy below; the explicit norm>0 guard is what keeps
    the engines in agreement)."""
    import numpy as np

    rng = np.random.RandomState(11)
    base = rng.randn(120, 8)
    base[49] = base[7] * 1.7  # planted colinear pair (cos = 1, same grp)
    base[99] = 0.0            # planted zero-norm vector
    rows = [
        (i, i % 3, [float(x) for x in base[i]]) for i in range(len(base))
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, grp int, embedding array<double>"
    )

    def run(engine):
        out = similarity.triangle_pair_scores(
            df,
            "grp",
            id_col="vec_id",
            vec_col="embedding",
            threshold=0.5,
            split=3,
            engine=engine,
        ).collect()
        return sorted((r.id_a, r.id_b, r.cos_sim) for r in out)

    fold, blas = run("fold"), run("blas")
    assert fold == blas
    assert len(fold) > 0
    assert all(a < b for a, b, _ in fold)
    assert (7, 49, 1.0) in fold  # colinear plant found (7%3 == 49%3)
    assert not any(99 in (a, b) for a, b, _ in fold)


def test_triangle_pair_scores_blas_row_chunking(spark):
    """Cell scoring in row_chunk slabs must not change the pair set
    (slab boundaries cut only the A side of the matmul)."""
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randn(90, 6)
    rows = [(i, 0, [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(
        rows, "vec_id long, grp int, embedding array<double>"
    )

    def run(chunk):
        out = similarity.triangle_pair_scores(
            df,
            "grp",
            id_col="vec_id",
            vec_col="embedding",
            threshold=0.2,
            split=2,
            engine="blas",
            row_chunk=chunk,
        ).collect()
        return sorted((r.id_a, r.id_b, r.cos_sim) for r in out)

    assert run(7) == run(100000)
