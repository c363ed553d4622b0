"""Bucketed tables: the shuffle-elision scale story.  Mirrors the
reference's locality-preserving config golden (no RepartitionExec —
tests/opt_parallel_execution.rs:69-81): joins and aggregations on the
bucket key run with ZERO exchanges."""

import pytest
from pyspark.sql import functions as F

from sparkplans import plans
from sparkplans.engine import Engine
from sparkplans.sources import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    # warehouse dir is static conf, set in build_session
    e = Engine(spark=spark)
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    e.catalog.write_bucketed(orders, "orders_b", 8, "o_orderkey")
    e.catalog.write_bucketed(
        lineitem, "lineitem_b", 8, "l_orderkey", sort_cols=["l_orderkey", "l_linenumber"]
    )
    yield e
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_cobucketed_join_no_shuffle(spark, eng):
    o = spark.table("orders_b")
    li = spark.table("lineitem_b")
    joined = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "o_totalprice", "l_linenumber", "l_quantity"
    )
    assert plans.num_exchanges(joined) == 0, plans.physical_plan_str(joined)
    # correctness unchanged vs unbucketed join
    base_o = load_table(spark, SF_DIR, "orders")
    base_l = load_table(spark, SF_DIR, "lineitem")
    want = base_o.join(base_l, base_o.o_orderkey == base_l.l_orderkey).count()
    assert joined.count() == want


def test_agg_on_bucket_key_no_shuffle(spark, eng):
    li = spark.table("lineitem_b")
    agg = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
    )
    assert plans.num_exchanges(agg) == 0, plans.physical_plan_str(agg)
    want = (
        load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_orderkey")
        .count()
        .count()
    )
    assert agg.count() == want


def test_unbucketed_join_does_shuffle(spark):
    """Contrast case: the same join without bucketing pays exchanges
    (unless the optimizer broadcasts — disable to be sure)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF_DIR, "orders")
        li = load_table(spark, SF_DIR, "lineitem")
        joined = o.join(li, o.o_orderkey == li.l_orderkey)
        assert plans.num_exchanges(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))


def test_analyze_table_stats(spark, eng):
    eng.catalog.analyze_table("orders_b")
    desc = spark.sql("DESCRIBE TABLE EXTENDED orders_b").toPandas()
    stats = desc[desc["col_name"] == "Statistics"]["data_type"]
    assert len(stats) == 1 and "rows" in stats.iloc[0]


def test_three_table_cobucketed_join_no_shuffle(spark, eng):
    """The multi-fact headline's co-located layout (reference
    docs/9_what_next.md:4-6 "more input files into the join"): THREE
    tables bucketed on the same join key — the full join tree runs
    with ZERO exchanges.  This is the 100 TB answer to the multi-fact
    join: write each fact bucketed by the shared key once, and every
    subsequent N-way join on that key is shuffle-free."""
    orders = load_table(spark, SF_DIR, "orders")
    eng.catalog.write_bucketed(
        orders.select(
            F.col("o_orderkey").alias("m_orderkey"),
            F.col("o_orderpriority").alias("m_priority"),
        ),
        "ordermeta_b", 8, "m_orderkey",
    )
    try:
        o = spark.table("orders_b")
        li = spark.table("lineitem_b")
        m = spark.table("ordermeta_b")
        joined = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(m, o.o_orderkey == m.m_orderkey)
            .select("o_orderkey", "l_linenumber", "m_priority")
        )
        assert plans.num_exchanges(joined) == 0, plans.physical_plan_str(joined)
        base_o = load_table(spark, SF_DIR, "orders")
        base_l = load_table(spark, SF_DIR, "lineitem")
        want = base_o.join(
            base_l, base_o.o_orderkey == base_l.l_orderkey
        ).count()
        assert joined.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS ordermeta_b")


def test_multi_fact_join_shuffle_hash_plan(spark):
    """The registered multi_fact_join must actually run its big-big
    join as a shuffled hash join (fact never broadcast, no sort), with
    the dimension side broadcast."""
    import sparkplans.queries as Q

    df = Q.REGISTRY["multi_fact_join"].fn(spark, SF_DIR)
    phys = plans.physical_plan_str(df)
    assert "ShuffledHashJoin" in phys, phys
    assert "BroadcastHashJoin" in phys, phys


def test_incremental_dedup_bucketed_index_no_shuffle(spark):
    """The incremental-dedup scale claim, pinned: with the fingerprint
    index AND the batch's first-keeper table both stored bucketed by
    fingerprint, the cross-batch anti join plans with ZERO exchanges —
    at 100 TB the nightly dedup touches no corpus-wide shuffle."""
    from sparkplans.engine import Engine
    from sparkplans.functions.text import doc_fingerprint

    e = Engine(spark=spark)
    docs = load_table(spark, SF_DIR, "documents")
    seen = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(doc_fingerprint("text").alias("fingerprint"))
        .distinct()
    )
    batch_first = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", doc_fingerprint("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    try:
        e.catalog.write_bucketed(seen, "seen_fp_b", 8, "fingerprint")
        e.catalog.write_bucketed(
            batch_first, "batch_fp_b", 8, "fingerprint"
        )
        s = spark.table("seen_fp_b")
        b = spark.table("batch_fp_b")
        clean = b.join(s, "fingerprint", "left_anti")
        assert plans.num_exchanges(clean) == 0, plans.physical_plan_str(clean)
        # correctness matches the unbucketed anti join
        want = batch_first.join(seen, "fingerprint", "left_anti").count()
        assert clean.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS seen_fp_b")
        spark.sql("DROP TABLE IF EXISTS batch_fp_b")
