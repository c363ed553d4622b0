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
