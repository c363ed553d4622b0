"""Z-order layout: every clustered column gets bounded per-file
spread (the property that makes min/max pruning work on all of them),
unlike a linear sort which only bounds its leading key."""

import os

import pytest
from pyspark.sql import functions as F

from sparkplans.operators import zorder
from sparkplans.sources import load_table
from tests.conftest import SF_DIR


def _per_file_spread(spark, path, col):
    """Mean (max-min) of ``col`` within each output file, normalized
    by the global span — 1.0 means files don't localize the column."""
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    per = df.groupBy("__f").agg((F.max(col) - F.min(col)).alias("spread"))
    g = df.agg((F.max(col) - F.min(col)).alias("span")).collect()[0]["span"]
    rows = per.collect()
    return sum(r.spread for r in rows) / len(rows) / g


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    zp = str(tmp_path / "zordered")
    lp = str(tmp_path / "linear")
    zorder.write_zordered(orders, zp, ["o_custkey", "o_totalprice"], num_files=8)
    # linear sort on custkey only: totalprice is scattered
    (
        orders.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite").parquet(lp)
    )
    assert spark.read.parquet(zp).count() == orders.count()

    z_cust = _per_file_spread(spark, zp, "o_custkey")
    z_price = _per_file_spread(spark, zp, "o_totalprice")
    l_cust = _per_file_spread(spark, lp, "o_custkey")
    l_price = _per_file_spread(spark, lp, "o_totalprice")

    # linear: leading key tight, second column useless (~full span)
    assert l_cust < 0.35 and l_price > 0.8
    # z-order: BOTH columns materially localized per file
    assert z_cust < 0.75 and z_price < 0.75
    # and the second dimension is far better than under linear sort
    assert z_price < l_price * 0.85


def _py_rank16(v, lo, hi):
    frac = 0.0 if hi == lo else (v - lo) / (hi - lo)
    return min(int(frac * ((1 << zorder.Z_BITS) - 1)), (1 << zorder.Z_BITS) - 1)


def _py_morton(ranks, bits=None):
    bits = bits or zorder.Z_BITS
    k, out = len(ranks), 0
    for bit in range(bits):
        for d, r in enumerate(ranks):
            out += ((r >> bit) & 1) << (bit * k + d)
    return out


def test_zorder_key_matches_python_reference(spark):
    pts = [(a, b) for a in range(4) for b in range(4)]
    df = spark.createDataFrame(pts, "a INT, b INT")
    keyed = zorder.with_zorder_key(df, ["a", "b"])
    got = {(r["a"], r["b"]): r["__z"] for r in keyed.collect()}
    want = {
        (a, b): _py_morton([_py_rank16(a, 0, 3), _py_rank16(b, 0, 3)])
        for a, b in pts
    }
    assert got == want
    assert len(set(got.values())) == 16  # all distinct


def test_ivf_persisted_bucketed_probe_path(spark, tmp_path):
    """The IVF scale path from operators/similarity: persist the
    assigned corpus bucketed by cid; the probe join then reads the
    bucketed table with NO corpus-side exchange (the probe list
    broadcasts), and results match the in-memory IVF search exactly."""
    from pyspark.sql import functions as F

    from sparkplans import plans
    from sparkplans.engine import Engine
    from sparkplans.operators import similarity

    eng = Engine(spark=spark)
    emb = load_table(spark, SF_DIR, "embeddings")
    assigned, centroids = similarity.ivf_build(emb, num_centroids=8, iters=1)
    eng.catalog.write_bucketed(assigned, "ivf_assigned", 8, "cid")
    persisted = spark.table("ivf_assigned")
    # persist centroids too (at scale: a tiny side table); otherwise
    # their k-means lineage re-executes inside every probe plan
    centroids_m = spark.createDataFrame(centroids.collect(), centroids.schema)

    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    out = similarity.ivf_topk(persisted, centroids_m, probes, k=5, nprobe=2)
    # structural: only the two tiny probe-side window exchanges remain
    # (nprobe selection + final top-k) — the corpus is never shuffled
    assert plans.num_exchanges(out) <= 2
    got = {(r.probe_id, r.vec_id) for r in out.collect()}
    want = {
        (r.probe_id, r.vec_id)
        for r in similarity.ivf_topk(assigned, centroids, probes, k=5, nprobe=2).collect()
    }
    assert got == want


def test_zorder_three_dimensions(spark):
    pts = [(a, b, c) for a in range(3) for b in range(3) for c in range(3)]
    df = spark.createDataFrame(pts, "a INT, b INT, c INT")
    keyed = zorder.with_zorder_key(df, ["a", "b", "c"])
    got = {(r["a"], r["b"], r["c"]): r["__z"] for r in keyed.collect()}
    want = {
        (a, b, c): _py_morton(
            [_py_rank16(a, 0, 2), _py_rank16(b, 0, 2), _py_rank16(c, 0, 2)]
        )
        for a, b, c in pts
    }
    assert got == want and len(set(got.values())) == 27
