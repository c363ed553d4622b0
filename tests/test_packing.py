"""pack_sequences (operators/packing) — FFD sequence packing.

Validity is checked as theorems over the output (every eligible doc
exactly once, no sequence over budget, contiguous positions), quality
as the first-fit guarantee (at most one <=half-full sequence per
partition), plus determinism and a hand-computed FFD golden.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkplans.operators.packing import pack_sequences


def _docs(spark, sizes):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "doc_id long, nt int"
    )


def test_ffd_golden_single_partition(spark):
    """sizes [6,5,4,3,2,1], budget 10, one partition — classic FFD:
    {6,4}, {5,3,2}, {1}."""
    packed = pack_sequences(
        _docs(spark, [6, 5, 4, 3, 2, 1]),
        id_col="doc_id",
        size_col="nt",
        budget=10,
        parts=1,
    )
    rows = packed.collect()
    bins = {}
    for r in rows:
        bins.setdefault(r.seq_id, set()).add(r.nt)
    assert sorted(bins.values(), key=lambda s: -max(s)) == [
        {6, 4},
        {5, 3, 2},
        {1},
    ]


def test_validity_invariants(spark):
    """Every eligible doc exactly once; loads <= budget; seq_pos is
    0..k-1 within each sequence; oversized docs excluded."""
    sizes = [(i * 37) % 97 + 1 for i in range(500)]  # 1..97, budget 64
    budget = 64
    df = _docs(spark, sizes)
    packed = pack_sequences(
        df, id_col="doc_id", size_col="nt", budget=budget, parts=4
    ).localCheckpoint(eager=True)

    eligible = [s for s in sizes if s <= budget]
    stats = packed.agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("nd"),
        F.sum("nt").alias("tok"),
    ).first()
    assert stats.n == stats.nd == len(eligible)
    assert stats.tok == sum(eligible)

    loads = packed.groupBy("seq_id").agg(
        F.sum("nt").alias("load"),
        F.count("*").alias("k"),
        F.min("seq_pos").alias("p0"),
        F.max("seq_pos").alias("p1"),
        F.countDistinct("seq_pos").alias("np"),
    )
    bad = loads.filter(
        (F.col("load") > budget)
        | (F.col("p0") != 0)
        | (F.col("p1") != F.col("k") - 1)
        | (F.col("np") != F.col("k"))
    ).count()
    assert bad == 0


def test_first_fit_waste_bound(spark):
    """First-fit theorem: at most one <=half-full sequence per
    partition (two could not coexist — the later's first item fits
    the earlier)."""
    sizes = [(i * 13) % 40 + 1 for i in range(400)]
    budget, parts = 100, 4
    packed = pack_sequences(
        _docs(spark, sizes), id_col="doc_id", size_col="nt", budget=budget, parts=parts
    )
    underfull = (
        packed.groupBy("seq_id")
        .agg(F.sum("nt").alias("load"))
        .filter(F.col("load") * 2 <= budget)
        .count()
    )
    assert underfull <= parts


def test_deterministic(spark):
    sizes = [(i * 7) % 50 + 1 for i in range(300)]
    kw = dict(id_col="doc_id", size_col="nt", budget=80, parts=3)
    a = pack_sequences(_docs(spark, sizes), **kw).collect()
    b = pack_sequences(_docs(spark, sizes), **kw).collect()
    key = lambda r: r.doc_id  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_single_shuffle(spark):
    """The packing plan carries exactly ONE exchange — the hash
    partition into packing groups."""
    from sparkplans.plans import num_exchanges

    packed = pack_sequences(
        _docs(spark, [5] * 100), id_col="doc_id", size_col="nt", budget=10, parts=4
    )
    assert num_exchanges(packed) == 1


def test_bad_args(spark):
    import pytest

    df = _docs(spark, [1])
    with pytest.raises(ValueError):
        pack_sequences(df, id_col="doc_id", size_col="nt", budget=0)
    with pytest.raises(ValueError):
        pack_sequences(df, id_col="doc_id", size_col="nt", budget=10, parts=0)


# ---------------------------------------------------------------------
# split_doc_chunks
# ---------------------------------------------------------------------


def test_split_chunks_boundaries(spark):
    """Exact-budget doc -> 1 chunk; budget+1 -> 2 (second has 1 token);
    chunk text round-trips whitespace-normalized."""
    from sparkplans.operators.packing import split_doc_chunks

    df = spark.createDataFrame(
        [
            (0, "a b c d"),          # 4 tokens == budget -> 1 chunk
            (1, "a b c d e"),        # 5 tokens -> chunks of 4 + 1
            (2, "  x   y  "),        # messy whitespace -> "x y"
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.chunk_idx): (r.n_chunk_tokens, r.chunk_text)
        for r in split_doc_chunks(
            df, id_col="doc_id", text_col="text", budget=4
        ).collect()
    }
    assert out == {
        (0, 0): (4, "a b c d"),
        (1, 0): (4, "a b c d"),
        (1, 1): (1, "e"),
        (2, 0): (2, "x y"),
    }


def test_split_chunks_reassemble(spark):
    """Concatenating a doc's chunks in chunk_idx order reproduces the
    whitespace-normalized document; token counts sum exactly."""
    from sparkplans.operators.packing import split_doc_chunks
    from sparkplans.queries import _t

    d = _t(spark, "/root/testdata/sf0.001", "documents")
    chunks = split_doc_chunks(d, id_col="doc_id", text_col="text", budget=16)
    re = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_text"))
                ).getField("chunk_text"),
                " ",
            ).alias("rebuilt"),
            F.sum("n_chunk_tokens").alias("nt"),
        )
    )
    orig = d.select(
        "doc_id",
        F.array_join(F.split(F.trim("text"), r"\s+"), " ").alias("norm"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("nt0"),
    )
    bad = (
        re.join(orig, "doc_id")
        .filter((F.col("rebuilt") != F.col("norm")) | (F.col("nt") != F.col("nt0")))
        .count()
    )
    assert bad == 0


def test_split_chunks_zero_shuffle(spark):
    from sparkplans.operators.packing import split_doc_chunks
    from sparkplans.plans import num_exchanges
    from sparkplans.queries import _t

    d = _t(spark, "/root/testdata/sf0.001", "documents")
    assert (
        num_exchanges(
            split_doc_chunks(d, id_col="doc_id", text_col="text", budget=16)
        )
        == 0
    )
