"""Property-based tests (hypothesis) for the sort-order rules — the
engine's one genuinely custom component (SURVEY §4.4).  These are
pure-Python invariants, no Spark session needed, so they run in
milliseconds and explore far more key combinations than the
docs/4-derived example tests."""

from hypothesis import given, settings, strategies as st

from sparkplans.ordering import (
    SortKey,
    normalize_sort_keys,
    ordering_satisfies,
    project_ordering,
)

cols = st.sampled_from(["env", "service", "host", "ts", "k1", "k2"])
keys = st.builds(
    SortKey,
    col=cols,
    asc=st.booleans(),
    nulls_first=st.one_of(st.none(), st.booleans()),
)


def _dedup(ks):
    seen, out = set(), []
    for k in ks:
        if k.col not in seen:
            seen.add(k.col)
            out.append(k)
    return tuple(out)


orders = st.lists(keys, min_size=0, max_size=5).map(_dedup)


@given(orders)
def test_reflexive(o):
    """Any order satisfies itself (docs/4:33-57 full match)."""
    assert ordering_satisfies(o, o)


@given(orders, st.integers(min_value=0, max_value=5))
def test_prefix_always_satisfied(o, n):
    """Every leading prefix is satisfied (docs/4:60-84 Good Subset)."""
    assert ordering_satisfies(o, o[: min(n, len(o))])


@given(orders)
def test_empty_requirement_trivially_satisfied(o):
    assert ordering_satisfies(o, ())


@given(orders)
def test_longer_requirement_never_satisfied(o):
    extra = o + (SortKey("zz_extra", True),)
    assert not ordering_satisfies(o, extra)


@given(orders)
def test_skipped_key_not_satisfied(o):
    """Dropping a middle key breaks satisfaction (docs/4:87-111 Bad
    Subset) — the regression case the reference pins."""
    if len(o) >= 3:
        bad = (o[0], o[2])
        assert not ordering_satisfies(o, bad)


@given(orders)
def test_direction_flip_not_satisfied(o):
    if o:
        flipped = (SortKey(o[0].col, not o[0].asc, o[0].nulls_first),) + o[1:]
        assert not ordering_satisfies(o, flipped)


@given(orders)
def test_satisfaction_transitive_through_projection(o):
    """Projected ordering is a prefix, so the original satisfies it."""
    surviving_cols = {k.col for k in o[: len(o) // 2 + 1]}
    projected = project_ordering(o, surviving_cols)
    assert ordering_satisfies(o, projected)


@given(orders, st.sets(cols))
def test_project_ordering_is_leading_prefix(o, avail):
    projected = project_ordering(o, avail)
    assert projected == o[: len(projected)]
    assert all(k.col in avail for k in projected)
    # maximal: the next key (if any) must be missing from avail
    if len(projected) < len(o):
        assert o[len(projected)].col not in avail


@given(st.lists(cols, max_size=4))
def test_normalize_accepts_bare_strings(names):
    normalized = normalize_sort_keys(names)
    assert [k.col for k in normalized] == names
    assert all(k.asc for k in normalized)


# ---------------------------------------------------------------------
# Sequence-packing invariants on adversarial inputs (hypothesis)
# ---------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 5000), st.sampled_from(["a", "b"])),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=20, deadline=None)
def test_sequence_packing_invariants(spark, sizes):
    """Concat-and-chunk packing on arbitrary token counts (including
    docs longer than the context): tokens are always conserved per
    shard; when every document fits in a context window, seq indices
    are additionally contiguous from 0 and no sequence holds 2x the
    context (an oversized document legitimately skips indices — its
    span covers them)."""
    from pyspark.sql import Window, functions as F

    ctx = 2048
    rows = [(i, lang, n) for i, (n, lang) in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = df.withColumn("cum", F.sum("n_tokens").over(w))
    packed = (
        c.select(
            "lang", F.expr(f"(cum - n_tokens) DIV {ctx}").alias("seq_idx"), "n_tokens"
        )
        .groupBy("lang", "seq_idx")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("tokens"))
        .collect()
    )
    want = {}
    for _, lang, n in rows:
        want[lang] = want.get(lang, 0) + n
    got, idx, by_bin = {}, {}, {}
    for r in packed:
        got[r.lang] = got.get(r.lang, 0) + r.tokens
        idx.setdefault(r.lang, set()).add(r.seq_idx)
        by_bin[(r.lang, r.seq_idx)] = r
    assert got == want
    max_doc = {}
    for _, lang, n in rows:
        max_doc[lang] = max(max_doc.get(lang, 0), n)
    for lang, s_ in idx.items():
        if max_doc[lang] < ctx:
            assert s_ == set(range(len(s_))), f"gaps for {lang}"
    for (lang, _), r in by_bin.items():
        if max_doc[lang] < ctx:
            assert r.tokens < 2 * ctx
