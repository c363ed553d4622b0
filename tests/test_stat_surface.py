"""DataFrame.stat surface: the JVM-side single-pass statistics and
sketch algorithms (Pearson corr, covariance, crosstab, freqItems,
Count-Min, Bloom filter).  Complements the HLL++/GK sketch queries —
together they cover the sketch families a 100 TB profiling pass needs:
cardinality (HLL), quantiles (GK), frequency (CMS/freqItems),
membership (Bloom).  All run as one scan with constant-size state; no
full-key shuffles.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkplans.sources import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, SF_DIR, "lineitem")


def test_corr_cov_match_oracle(spark, lineitem):
    got_corr = lineitem.stat.corr("l_quantity", "l_extendedprice")
    got_cov = lineitem.stat.cov("l_quantity", "l_extendedprice")
    con = duckdb.connect()
    want_corr, want_cov = con.sql(
        f"SELECT corr(l_quantity, l_extendedprice), covar_samp(l_quantity, l_extendedprice) "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchone()
    assert abs(got_corr - want_corr) < 1e-9
    assert abs(got_cov - want_cov) < 1e-6 * abs(want_cov)


def test_crosstab_matches_groupby(spark):
    ev = load_table(spark, SF_DIR, "events")
    ct = ev.stat.crosstab("event_type", "user_id")  # types x users
    # verify one cell against the exact groupBy count
    some = ev.groupBy("event_type", "user_id").count().first()
    row = [r for r in ct.collect() if r["event_type_user_id"] == some["event_type"]][0]
    assert row[str(some["user_id"])] == some["count"]


def test_freq_items_finds_planted_heavy_hitter(spark):
    base = spark.range(1000).select((F.col("id") % 997).alias("v"))
    heavy = spark.range(500).select(F.lit(42).alias("v"))
    df = base.unionByName(heavy)
    found = df.stat.freqItems(["v"], support=0.2).first()["v_freqItems"]
    assert 42 in found


def test_count_min_sketch_bounds(spark):
    # PySpark 4.x dropped the Python wrapper; the JVM Dataset API is
    # still the engine surface — reach it via the java handle.
    ev = load_table(spark, SF_DIR, "events")
    cms = ev._jdf.stat().countMinSketch("event_type", 0.005, 0.99, 7)
    exact = dict(
        (r.event_type, r["count"]) for r in ev.groupBy("event_type").count().collect()
    )
    total = sum(exact.values())
    for k, true_n in exact.items():
        est = cms.estimateCount(k)
        # CMS never under-counts; over-count bounded by eps * total w.h.p.
        assert est >= true_n
        assert est <= true_n + 0.005 * total * 2


def test_bloom_filter_membership(spark):
    docs = load_table(spark, SF_DIR, "documents")
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    bf = docs._jdf.stat().bloomFilter("doc_id", len(ids), 0.01)
    # no false negatives — every real member hits
    assert all(bf.mightContain(i) for i in ids)
    # false-positive rate on definitely-absent keys stays near fpp
    absent = [10_000_000 + i for i in range(2000)]
    fp = sum(bf.mightContain(i) for i in absent) / len(absent)
    assert fp < 0.05
