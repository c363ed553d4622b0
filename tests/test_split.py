"""leakage_safe_split — the invariant the query exists for: verbatim
duplicates can never straddle a split boundary."""

from __future__ import annotations

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def _assign(df):
    fp = F.md5("text")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(fp, F.lit(":split"))), 1, 15), 16, 10)
        .cast("bigint") % 100
    )
    return df.select(
        "doc_id",
        fp.alias("fp"),
        F.when(bucket < 90, "train").when(bucket < 95, "val")
        .otherwise("test").alias("split"),
    )


def test_duplicates_share_split(spark):
    """Plant verbatim copies of every doc under new ids: each
    fingerprint group must map to exactly one split."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    clones = d.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    a = _assign(d.unionByName(clones))
    multi = (
        a.groupBy("fp")
        .agg(F.countDistinct("split").alias("k"), F.count("*").alias("n"))
        .filter((F.col("k") > 1) | (F.col("n") < 2))
    )
    assert multi.count() == 0


def test_split_fractions_near_nominal(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = d.count()
    frac = {
        r["split"]: r["c"] / n
        for r in _assign(d).groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    assert 0.80 < frac.get("train", 0) < 0.97
    assert 0.005 < frac.get("val", 0) < 0.12
    assert 0.005 < frac.get("test", 0) < 0.12
