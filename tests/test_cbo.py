"""Cost-based optimization: statistics change the PLAN, not just the
catalog.  The reference collects per-table stats at load
(``with_collect_stat(true)``, tests/setup_tables.rs:43,69) and its
``aggregate_statistics`` rule folds them into planning; the Spark
mapping is ANALYZE TABLE + ``spark.sql.cbo.*``.  These tests prove
the stats are consumed: with CBO join reorder on, a 3-table join
written in a deliberately bad syntactic order (fact x fact first,
selective dim last) is rewritten so the selective dimension join runs
innermost — the "optimal plans" behavior the reference repo is named
for, decided from rowCount/NDV statistics rather than syntax."""

import pytest

from sparkplans.sources import load_table
from tests.conftest import SF_DIR

TABLES = ("cbo_li", "cbo_o", "cbo_c")


@pytest.fixture(scope="module")
def cbo_tables(spark):
    for name, src in zip(TABLES, ("lineitem", "orders", "customer")):
        load_table(spark, SF_DIR, src).write.mode("overwrite").saveAsTable(name)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
    yield
    for name in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


# syntactically joins the two FACTS first; the selective dim comes last
_BAD_ORDER_SQL = """
  SELECT count(*) AS n FROM cbo_li l
  JOIN cbo_o o ON l.l_orderkey = o.o_orderkey
  JOIN cbo_c c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
"""


def _optimized(spark, sql):
    return spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()


def test_cbo_join_reorder_pushes_selective_dim_innermost(spark, cbo_tables):
    """With stats + joinReorder, the optimizer rewrites the join tree:
    the filtered customer dim joins orders FIRST (cbo_c appears in the
    left/inner subtree, before cbo_li in the plan string), shrinking
    the intermediate that meets lineitem."""
    old = spark.conf.get("spark.sql.cbo.joinReorder.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        plan = _optimized(spark, _BAD_ORDER_SQL)
        assert "cbo_c" in plan and "cbo_li" in plan
        assert plan.index("cbo_c") < plan.index("cbo_li"), plan
    finally:
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", old)


def test_without_reorder_syntactic_order_is_kept(spark, cbo_tables):
    """Contrast case: joinReorder off -> the bad syntactic order
    survives (lineitem scan sits in the innermost join subtree, before
    the customer dim)."""
    old = spark.conf.get("spark.sql.cbo.joinReorder.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    try:
        plan = _optimized(spark, _BAD_ORDER_SQL)
        assert plan.index("cbo_li") < plan.index("cbo_c"), plan
    finally:
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", old)


def test_optimizer_sees_analyzed_rowcount(spark, cbo_tables):
    """The optimizer's cost model reads an exact rowCount from the
    ANALYZE stats (not a size-based guess), matching the table's true
    cardinality."""
    df = spark.table("cbo_o")
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    assert stats.rowCount().isDefined()
    assert stats.rowCount().get() == df.count()
