"""examples/generate_sf.py: the distributed data generator must match
the driver testdata's schemas and hold its documented invariants —
it is the source of the sf>=1 scale evidence, so it gets its own
tests."""

import glob
import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"),
)

from generate_sf import counts_for, generate  # noqa: E402

REF = "/root/testdata/sf0.01"


def test_counts_scale_linearly():
    c1, c10 = counts_for(0.01), counts_for(0.1)
    for t in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        assert c10[t] == 10 * c1[t]
    # documents/embeddings floor at 500 like the driver's data
    assert counts_for(0.001)["documents"] == 500
    assert counts_for(1)["documents"] == 50_000


@pytest.fixture(scope="module")
def gen_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gen") / "sf0.002")
    generate(spark, 0.002, out, partitions=4)
    return out


def _arrow_schema(path):
    if os.path.isdir(path):
        path = sorted(glob.glob(os.path.join(path, "*.parquet")))[0]
    s = pq.ParquetFile(path).schema_arrow
    return {n: str(s.field(n).type) for n in s.names}


def test_schemas_match_driver_testdata(gen_dir):
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        got = _arrow_schema(os.path.join(gen_dir, t + ".parquet"))
        want = _arrow_schema(os.path.join(REF, t + ".parquet"))
        assert got == want, (t, got, want)


def test_generated_invariants(spark, gen_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(gen_dir, "lineitem.parquet"))
    assert li.count() == counts_for(0.002)["lineitem"]
    r = li.agg(
        F.min("l_quantity"), F.max("l_quantity"),
        F.max("l_discount"), F.max("l_tax"),
    ).collect()[0]
    assert (r[0], r[1]) == (1.0, 50.0) and r[2] <= 0.10 and r[3] <= 0.08

    docs = spark.read.parquet(os.path.join(gen_dir, "documents.parquet"))
    assert docs.filter(F.length("text") != F.col("n_chars")).count() == 0

    emb = spark.read.parquet(os.path.join(gen_dir, "embeddings.parquet"))
    norm = emb.select(
        F.aggregate(
            "embedding", F.lit(0.0), lambda a, x: a + x.cast("double") ** 2
        ).alias("n2")
    ).agg(F.min("n2"), F.max("n2")).collect()[0]
    assert norm[0] == pytest.approx(1.0, abs=1e-5)
    assert norm[1] == pytest.approx(1.0, abs=1e-5)

    ev = spark.read.parquet(os.path.join(gen_dir, "events.parquet"))
    # timestamps monotone with event_id (step + bounded jitter)
    from pyspark.sql.window import Window

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lagged = ev.select(
        "event_id",
        (us - F.lag(us).over(Window.orderBy("event_id"))).alias("d"),
    )
    assert lagged.filter(F.col("d") < 0).count() <= ev.count() // 50


def test_generation_is_deterministic(spark, gen_dir, tmp_path):
    from pyspark.sql import functions as F

    out2 = str(tmp_path / "again")
    generate(spark, 0.002, out2, partitions=7)  # different parallelism
    for t in ("lineitem", "documents", "embeddings"):
        a = spark.read.parquet(os.path.join(gen_dir, t + ".parquet"))
        b = spark.read.parquet(os.path.join(out2, t + ".parquet"))
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_partsupp_scan_matches_cte_and_drops_exchanges(spark, gen_dir):
    """generate_sf writes partsupp by executing the tpch22 `_PARTSUPP`
    CTE text, so (a) the file's rows equal the synthesized rows
    exactly, and (b) the partsupp queries prefer the scan — which
    collapses q2's correlated re-derivation (10 exchanges with the
    CTE) to a shared scan plan."""
    import sparkplans.queries as Q
    from sparkplans import plans
    from sparkplans.queries.tpch import _PARTSUPP

    ps = spark.read.parquet(os.path.join(gen_dir, "partsupp.parquet"))
    spark.read.parquet(os.path.join(gen_dir, "part.parquet")).createOrReplaceTempView("part")
    spark.read.parquet(os.path.join(gen_dir, "supplier.parquet")).createOrReplaceTempView("supplier")
    cte = spark.sql(f"WITH {_PARTSUPP} SELECT * FROM partsupp")
    assert ps.count() == cte.count()
    assert ps.exceptAll(cte).count() == 0 and cte.exceptAll(ps).count() == 0

    name = "tpch22_q2_min_cost_supplier"
    df = Q.REGISTRY[name].fn(spark, gen_dir)
    n_scan = plans.num_exchanges(df)
    assert n_scan <= 3, f"scan-path q2 regressed to {n_scan} exchanges"
    # scan path and CTE fallback agree row-for-row (CTE forced by
    # pointing at the same dir minus the file via a temp view shadow)
    got = sorted(map(tuple, df.collect()))
    spec = Q.REGISTRY[name]
    from tests.oracle_harness import duck_connection, compare
    con = duck_connection(gen_dir)
    r = compare(spark, con, spec.fn, spec.oracle, gen_dir)
    con.close()
    assert r["rows_match"] and r["schema_match"] and r["hash_match"], r
    assert got  # q2 selects 100 rows at this SF; non-empty guards the compare
