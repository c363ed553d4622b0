"""Write sinks: round-trips, partition pruning on hive layout, and
sorted writes feeding the catalog's sort-elision."""

import os

import pytest
from pyspark.sql import functions as F

from sparkplans import plans, sinks
from sparkplans.engine import Engine
from sparkplans.sources import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF_DIR, "orders")


def test_copy_to_roundtrip_all_formats(spark, orders, tmp_path):
    small = orders.limit(50).select("o_orderkey", "o_custkey", "o_totalprice")
    for fmt in ("parquet", "csv", "json", "orc"):
        p = str(tmp_path / f"out_{fmt}")
        sinks.copy_to(small, p, format=fmt, single_file=True)
        files = [f for f in os.listdir(p) if not f.startswith(("_", "."))]
        assert len(files) == 1, f"{fmt}: expected one data file, got {files}"
        back = (
            spark.read.format(fmt)
            .options(**({"header": "true", "inferSchema": "true"} if fmt == "csv" else {}))
            .load(p)
        )
        assert back.count() == 50
        got = {r.o_orderkey for r in back.select("o_orderkey").collect()}
        want = {r.o_orderkey for r in small.select("o_orderkey").collect()}
        assert got == want


def test_write_partitioned_prunes(spark, orders, tmp_path):
    p = str(tmp_path / "by_status")
    sinks.write_partitioned(orders, p, ["o_orderstatus"])
    statuses = [r.o_orderstatus for r in orders.select("o_orderstatus").distinct().collect()]
    # hive layout: one dir per status, one file per dir
    dirs = [d for d in os.listdir(p) if d.startswith("o_orderstatus=")]
    assert sorted(dirs) == sorted(f"o_orderstatus={s}" for s in statuses)
    back = spark.read.parquet(p)
    one = back.filter(F.col("o_orderstatus") == statuses[0])
    # partition filter prunes: scanned files == files of that one dir
    plan = plans.physical_plan_str(one)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    want = orders.filter(F.col("o_orderstatus") == statuses[0]).count()
    assert one.count() == want


def test_write_partitioned_files_per_partition(spark, orders, tmp_path):
    p = str(tmp_path / "salted")
    sinks.write_partitioned(orders, p, ["o_orderstatus"], files_per_partition=3)
    dirs = [d for d in os.listdir(p) if d.startswith("o_orderstatus=")]
    biggest = max(
        dirs,
        key=lambda d: sum(
            os.path.getsize(os.path.join(p, d, f)) for f in os.listdir(os.path.join(p, d))
        ),
    )
    n = len([f for f in os.listdir(os.path.join(p, biggest)) if f.endswith(".parquet")])
    assert 1 < n <= 3, f"expected salted multi-file partition dir, got {n}"
    assert spark.read.parquet(p).count() == orders.count()


def test_write_sorted_registers_with_order_and_elides(spark, orders, tmp_path):
    eng = Engine(spark=spark)
    p = str(tmp_path / "sorted_orders")
    spec = sinks.write_sorted(
        orders,
        p,
        order_by=["o_orderdate", "o_orderkey"],
        num_files=2,
        catalog=eng.catalog,
        register_as="orders_sorted",
    )
    assert spec is not None and len(spec.files) == 2
    # each file is internally sorted on the declared keys
    for f in spec.files:
        pdf = spark.read.parquet(f).select("o_orderdate", "o_orderkey").toPandas()
        assert list(pdf.itertuples(index=False)) == sorted(pdf.itertuples(index=False))
    # 2 sorted files: ORDER BY still needs the global merge (docs/6
    # case) — engine emits it, and the result is ordered
    of = eng.table("orders_sorted").order_by("o_orderdate")
    dates = [r.o_orderdate for r in of.df.select("o_orderdate").collect()]
    assert dates == sorted(dates)
    # single sorted file: prefix ORDER BY is elided entirely (docs/4)
    p1 = str(tmp_path / "sorted_one")
    sinks.write_sorted(
        orders, p1, order_by=["o_orderdate", "o_orderkey"], num_files=1,
        catalog=eng.catalog, register_as="orders_sorted_one",
    )
    of1 = eng.table("orders_sorted_one").order_by("o_orderdate")
    assert plans.num_sorts(of1.df) == 0, "sort not elided on single sorted file"
    dates1 = [r.o_orderdate for r in of1.df.select("o_orderdate").collect()]
    assert dates1 == sorted(dates1)


def test_compact_small_files(spark, orders, tmp_path):
    p = str(tmp_path / "fragmented")
    orders.repartition(16).write.parquet(p)
    n = orders.count()
    before, after = sinks.compact(spark, p, target_files=2)
    assert before == 16 and after == 2
    assert spark.read.parquet(p).count() == n


def test_compact_with_resort(spark, orders, tmp_path):
    p = str(tmp_path / "frag_sorted")
    orders.repartition(12).write.parquet(p)
    sinks.compact(spark, p, target_files=2, order_by=["o_orderkey"])
    import glob
    for f in sorted(glob.glob(p + "/*.parquet")):
        keys = [r.o_orderkey for r in spark.read.parquet(f).select("o_orderkey").collect()]
        assert keys == sorted(keys)


def test_schema_evolution_merge(spark, orders, tmp_path):
    """Pipelines append new columns over time; mergeSchema reads the
    union schema with nulls for old files."""
    p = str(tmp_path / "evolving")
    v1 = orders.select("o_orderkey", "o_totalprice").limit(40)
    v2 = orders.select("o_orderkey", "o_totalprice").limit(30).withColumn(
        "quality_tier", F.lit("gold")
    )
    v1.write.parquet(p + "/batch=1")
    v2.write.parquet(p + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "quality_tier", "batch"}
    assert merged.count() == 70
    assert merged.filter(F.col("quality_tier").isNull()).count() == 40


def test_incremental_files_exactly_once(spark, orders, tmp_path):
    """Batch-incremental ingestion: each file processed exactly once
    across runs; crash-before-commit reprocesses, commit advances."""
    from sparkplans.sources import incremental_files

    d = str(tmp_path / "landing")
    state = str(tmp_path / "state" / "seen.txt")
    orders.limit(20).coalesce(1).write.parquet(d + "/_tmp1")
    import glob, shutil, os as _os
    _os.makedirs(d, exist_ok=True)
    shutil.move(glob.glob(d + "/_tmp1/part-*.parquet")[0], d + "/a.parquet")
    shutil.rmtree(d + "/_tmp1")

    df1, commit1 = incremental_files(spark, d, state)
    assert df1 is not None and df1.count() == 20
    # crash before commit: same files come back
    df1b, commit1b = incremental_files(spark, d, state)
    assert df1b.count() == 20
    commit1b()
    # after commit: nothing new
    df2, _ = incremental_files(spark, d, state)
    assert df2 is None
    # a second file arrives: only IT is returned
    orders.limit(35).coalesce(1).write.parquet(d + "/_tmp2")
    shutil.move(glob.glob(d + "/_tmp2/part-*.parquet")[0], d + "/b.parquet")
    shutil.rmtree(d + "/_tmp2")
    df3, commit3 = incremental_files(spark, d, state)
    assert df3.count() == 35
    commit3()
    assert incremental_files(spark, d, state)[0] is None


def test_upsert_replaces_and_appends(spark, orders, tmp_path):
    p = str(tmp_path / "upsert_target")
    base = orders.limit(100).select("o_orderkey", "o_custkey", "o_totalprice")
    base.write.parquet(p)
    # 10 updated keys (price zeroed) + 5 brand-new keys
    upd = base.limit(10).withColumn("o_totalprice", F.lit(0.0))
    new = base.limit(5).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey", "o_totalprice",
    )
    n_upd, n_ins = sinks.upsert(spark, p, upd.unionByName(new), key="o_orderkey")
    assert (n_upd, n_ins) == (10, 5)
    back = spark.read.parquet(p)
    assert back.count() == 105
    zeroed = back.filter(F.col("o_totalprice") == 0.0).count()
    assert zeroed == 10
    assert back.filter(F.col("o_orderkey") >= 10_000_000).count() == 5
    # idempotent: same upsert again changes nothing
    n_upd2, n_ins2 = sinks.upsert(spark, p, upd.unionByName(new), key="o_orderkey")
    assert (n_upd2, n_ins2) == (15, 0)
    assert spark.read.parquet(p).count() == 105


def test_upsert_partitioned_touches_only_updated_partitions(spark, tmp_path):
    """Partition-scoped MERGE: updates for one lang rewrite only that
    partition dir; other partitions' files are byte-for-byte untouched
    (same paths, same mtimes)."""
    import glob
    import os as _os

    from sparkplans.sources import load_table

    p = str(tmp_path / "docs_part")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    sinks.write_partitioned(docs, p, ["lang"])

    def snapshot(exclude: str):
        return {
            f: _os.path.getmtime(f)
            for f in glob.glob(p + "/lang=*/*")
            if f"lang={exclude}" not in f
        }

    before = snapshot("en")
    upd = docs.filter(F.col("lang") == "en").limit(10).withColumn(
        "n_chars", F.lit(-1)
    )
    new = spark.createDataFrame(
        [(9_000_001, "en", -2)], "doc_id long, lang string, n_chars long"
    )
    n, touched = sinks.upsert_partitioned(
        spark, p, upd.unionByName(new), key="doc_id", partition_col="lang"
    )
    assert touched == ["en"]
    assert n == 11
    assert snapshot("en") == before, "untouched partitions were rewritten"

    back = spark.read.parquet(p)
    assert back.count() == docs.count() + 1
    assert back.filter(F.col("n_chars") == -1).count() == 10
    assert back.filter(F.col("doc_id") == 9_000_001).count() == 1
    # reads filtered on the partition column still prune directories
    assert back.filter(F.col("lang") == "de").count() == docs.filter(
        F.col("lang") == "de"
    ).count()

    # brand-new partition value lands in a fresh directory
    nv = spark.createDataFrame(
        [(9_000_002, "xx", -3)], "doc_id long, lang string, n_chars long"
    )
    _, touched2 = sinks.upsert_partitioned(
        spark, p, nv, key="doc_id", partition_col="lang"
    )
    assert touched2 == ["xx"]
    assert spark.read.parquet(p).filter(F.col("lang") == "xx").count() == 1


def test_zstd_parquet_roundtrip(spark, orders, tmp_path):
    """Compression codec is a writer option pass-through — zstd is the
    codec you'd pick at 100 TB (tighter than snappy at similar CPU)."""
    p = str(tmp_path / "zstd_orders")
    sinks.copy_to(orders, p, format="parquet", compression="zstd")
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert files and all(".zstd." in f for f in files)
    assert spark.read.parquet(p).count() == orders.count()


def test_parquet_bloom_filter_written_and_probed(spark, orders, tmp_path):
    """copy_to(bloom_filters=...) writes per-column parquet bloom
    filters: the bloomed file is measurably larger (the serialized
    filter lives in the footer region; ~10 bits/value at the default
    fpp), point lookups on the bloomed UNSORTED column still push the
    predicate to the scan, and results are exact.  This is the
    row-group-skipping complement to min/max stats for exact-match
    predicates on high-cardinality columns."""
    fp = orders.select(
        "o_orderkey", F.md5(F.col("o_orderkey").cast("string")).alias("fp")
    )
    n = fp.count()
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    sinks.copy_to(fp, plain, single_file=True)
    sinks.copy_to(fp, bloomed, single_file=True, bloom_filters={"fp": n})

    size = lambda d: sum(  # noqa: E731
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    # n values * ~10 bits apiece: require at least half that delta so
    # the assert proves the filter exists without pinning parquet-mr's
    # exact sizing
    assert size(bloomed) - size(plain) > n * 10 // 16, (
        size(plain),
        size(bloomed),
    )

    probe = F.md5(F.lit("7")).cast("string")
    got = (
        spark.read.parquet(bloomed)
        .filter(F.col("fp") == F.md5(F.lit(str(7))))
        .collect()
    )
    assert [r.o_orderkey for r in got] == [7]
    # predicate reaches the scan, so parquet-mr consults the filter
    df = spark.read.parquet(bloomed).filter(F.col("fp") == probe)
    assert any(
        "fp" in f for f in plans.scan_pushed_filters(df)
    ), plans.scan_pushed_filters(df)
