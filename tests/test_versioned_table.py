"""Versioned-table transaction log: atomic commits, time travel,
snapshot isolation, optimistic concurrency, vacuum."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sparkplans.table import VersionedTable
from sparkplans.sources import load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def nation(spark):
    return load_table(spark, SF_DIR, "nation")


def test_append_overwrite_and_time_travel(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    n = nation.count()
    v0 = t.append(nation)
    v1 = t.append(nation.limit(5))
    v2 = t.overwrite(nation.limit(3))
    v3 = t.append(nation.limit(2))
    assert [v0, v1, v2, v3] == [0, 1, 2, 3]
    assert t.read(version=0).count() == n
    assert t.read(version=1).count() == n + 5
    assert t.read(version=2).count() == 3
    assert t.read(version=3).count() == 5
    assert t.read().count() == 5  # latest
    assert [e["op"] for e in t.history()] == [
        "append", "append", "overwrite", "append",
    ]


def test_snapshot_isolation(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation)
    snap = t.read()  # file list resolved NOW
    t.append(nation)
    assert snap.count() == nation.count()  # unaffected by later commit
    assert t.read().count() == 2 * nation.count()


def test_optimistic_concurrency_retries_past_conflict(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation)
    # a racing writer claims version 1 out from under us
    with open(t._entry_path(1), "w") as f:
        json.dump({"op": "append", "files": [], "version": 1}, f)
    v = t.append(nation.limit(1))
    assert v == 2  # lost the race for 1, landed on 2
    assert t.read().count() == nation.count() + 1


def test_reading_unknown_version_raises(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation)
    with pytest.raises(FileNotFoundError):
        t.read(version=7)


def test_vacuum_drops_dead_files_keeps_tip(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation)          # v0 (files die with vacuum)
    t.overwrite(nation.limit(4))  # v1
    t.append(nation.limit(2))     # v2
    before = t.read().count()
    deleted = t.vacuum(keep_versions=2)  # keep v1, v2
    assert deleted, "pre-overwrite files should be vacuumed"
    assert all(not os.path.exists(p) for p in deleted)
    assert t.read().count() == before  # tip unchanged
    assert t.read(version=1).count() == 4  # kept version still reads
    with pytest.raises(FileNotFoundError):
        t.read(version=0)  # vacuumed away
    # the kept base version is now self-contained (op rewritten)
    assert t.history()[0]["op"] == "overwrite"


def test_schema_stays_queryable_through_versions(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation)
    t.overwrite(nation.filter(F.col("n_regionkey") == 0))
    got = t.read().groupBy("n_regionkey").count().collect()
    assert len(got) == 1 and got[0]["n_regionkey"] == 0


def test_merge_upsert_new_version(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation)
    updates = nation.filter(F.col("n_nationkey") < 3).withColumn(
        "n_name", F.lit("PATCHED")
    ).unionByName(
        spark.createDataFrame(
            [(99, "NEWLAND", 0)], nation.schema
        )
    )
    v = t.merge(updates, key="n_nationkey")
    got = t.read()
    assert got.count() == nation.count() + 1
    assert got.filter("n_name = 'PATCHED'").count() == 3
    assert got.filter("n_nationkey = 99").count() == 1
    # pre-merge version still reads intact (time travel)
    assert t.read(version=v - 1).filter("n_name = 'PATCHED'").count() == 0


def test_streaming_append_batch_exactly_once(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    assert t.streaming_append_batch(nation.limit(4), batch_id=0) == 0
    assert t.streaming_append_batch(nation.limit(2), batch_id=1) == 1
    n = t.read().count()
    # restart replays batch 1: must be a committed no-op
    assert t.streaming_append_batch(nation.limit(2), batch_id=1) is None
    assert t.read().count() == n
    assert [e.get("batch_id") for e in t.history()] == [0, 1]


def test_streaming_into_versioned_table_end_to_end(spark, tmp_path):
    """Drive a real file-source stream through foreachBatch into the
    versioned table: row count equals the batch read, and each
    micro-batch is one logged version."""
    import os as _os

    from sparkplans import streaming

    d = tmp_path / "src"
    d.mkdir()
    _os.symlink(f"{SF_DIR}/events.parquet", d / "a.parquet")
    t = VersionedTable(spark, str(tmp_path / "vt"))
    stream = streaming.stream_events(spark, str(d))
    q = (
        stream.writeStream.foreachBatch(t.streaming_append_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    want = load_table(spark, SF_DIR, "events").count()
    assert t.read().count() == want
    assert all(e.get("batch_id") is not None for e in t.history())


def test_changes_between_versions_cdc(spark, nation, tmp_path):
    """changes(v0, v1) derives exactly the merge we applied: updates
    for patched keys, an insert for the new key, no deletes."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    v0 = t.append(nation)
    updates = nation.filter(F.col("n_nationkey") < 2).withColumn(
        "n_name", F.lit("PATCHED")
    ).unionByName(
        spark.createDataFrame([(99, "NEWLAND", 0)], nation.schema)
    )
    v1 = t.merge(updates, key="n_nationkey")
    ch = t.changes(v0, v1, keys=["n_nationkey"])
    by_type = {r["change_type"]: r["n"] for r in
               ch.groupBy("change_type").agg(F.count("*").alias("n")).collect()}
    assert by_type.get("update") == 2
    assert by_type.get("insert") == 1
    assert "delete" not in by_type


def test_schema_drift_detection(spark, nation, tmp_path):
    from sparkplans.operators.diff import schema_drift

    kt = dict(nation.dtypes)["n_nationkey"]
    rt = dict(nation.dtypes)["n_regionkey"]
    evolved = nation.drop("n_regionkey").withColumn(
        "n_comment", F.lit("x")
    ).withColumn("n_nationkey", F.col("n_nationkey").cast("decimal(18,0)"))
    got = {(r.column, r.change_type, r.old_type, r.new_type)
           for r in schema_drift(nation, evolved).collect()}
    assert got == {
        ("n_regionkey", "removed", rt, None),
        ("n_comment", "added", None, "string"),
        ("n_nationkey", "type_changed", kt, "decimal(18,0)"),
    }
    assert schema_drift(nation, nation).count() == 0


def test_engine_catalog_integration(spark, nation, tmp_path):
    """Versioned tables join the engine namespace: SQL over the
    registered view, time travel via table_at, and view refresh on
    versionless reads."""
    from sparkplans.engine import Engine

    eng = Engine(spark=spark)
    vt = eng.create_versioned_table("vnation", str(tmp_path / "vn"))
    vt.append(nation)
    eng.table_at("vnation")  # register/refresh view
    assert eng.sql("SELECT count(*) AS n FROM vnation").first().n == nation.count()
    v0 = vt.latest_version()
    vt.overwrite(nation.limit(3))
    # pinned view still shows the old snapshot until refreshed
    assert eng.sql("SELECT count(*) AS n FROM vnation").first().n == nation.count()
    assert eng.table_at("vnation", version=v0).df.count() == nation.count()
    eng.table_at("vnation")  # refresh to latest
    assert eng.sql("SELECT count(*) AS n FROM vnation").first().n == 3


def test_compact_shrinks_files_preserves_rows(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    for i in range(4):  # four appends = at least four files
        t.append(nation.limit(6))
    rows_before = t.read().count()
    files_before = len(t._files_at(t.latest_version()))
    assert files_before >= 4
    pinned = t.read()  # concurrent reader pins pre-compact files
    v = t.compact(target_files=1)
    assert len(t._files_at(v)) == 1
    assert t.read().count() == rows_before
    assert pinned.count() == rows_before  # reader unaffected
    assert t.history()[-1].get("compact") is True
    # fragments reclaimed only by vacuum
    deleted = t.vacuum(keep_versions=1)
    assert len(deleted) >= files_before
    assert t.read().count() == rows_before


def test_vacuum_preserves_exactly_once_dedup(spark, nation, tmp_path):
    """ADVICE round-1 (medium): vacuum's base-entry rewrite used to
    drop batch_id metadata, so a restarted stream replaying the last
    micro-batch after vacuum(keep_versions=1) re-committed it and
    duplicated rows.  The rewrite must keep the exactly-once dedup
    visible."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.streaming_append_batch(nation.limit(4), batch_id=0)
    t.streaming_append_batch(nation.limit(3), batch_id=1)
    t.vacuum(keep_versions=1, orphan_age_seconds=0)
    n = t.read().count()
    # restart replays the latest micro-batch — must be a no-op
    assert t.streaming_append_batch(nation.limit(3), batch_id=1) is None
    # and an already-vacuumed-away batch id must also stay deduped
    assert t.streaming_append_batch(nation.limit(4), batch_id=0) is None
    assert t.read().count() == n


def test_empty_version_is_readable(spark, nation, tmp_path):
    """ADVICE round-1 (low): an overwrite with an empty frame commits
    fine and must read back as an empty table with the recorded
    schema, not raise FileNotFoundError."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation.limit(3))
    v = t.overwrite(nation.limit(0))
    got = t.read(version=v)
    assert got.count() == 0
    assert got.columns == nation.columns
    # and the table keeps working afterwards
    t.append(nation.limit(2))
    assert t.read().count() == 2


def test_vacuum_sweeps_orphaned_stage_dirs(spark, nation, tmp_path):
    """ADVICE round-1 (low): staged-but-never-committed files (a
    crashed writer) must be reclaimed by vacuum; fresh stage dirs
    inside the age gate survive (could be an in-flight commit)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation.limit(3))
    orphan = t._stage(nation.limit(2))  # staged, never committed
    orphan_dir = os.path.dirname(orphan[0])
    assert os.path.exists(orphan_dir)
    # inside the age gate: kept
    t.vacuum(keep_versions=1, orphan_age_seconds=3600)
    assert os.path.exists(orphan_dir)
    # past the age gate: swept; committed files untouched
    t.vacuum(keep_versions=1, orphan_age_seconds=0)
    assert not os.path.exists(orphan_dir)
    assert t.read().count() == 3


def test_schema_evolution_add_column(spark, nation, tmp_path):
    """Append with a NEW column: old files null-fill it, new rows keep
    it, and the evolved schema pins every later read."""
    import pyspark.sql.functions as F

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation.limit(3).select("n_nationkey", "n_name"))
    t.append(
        nation.limit(2).select(
            "n_nationkey", "n_name", F.lit("extra").alias("note")
        )
    )
    got = t.read()
    assert got.columns == ["n_nationkey", "n_name", "note"]
    assert got.count() == 5
    assert got.filter(F.col("note").isNull()).count() == 3
    assert got.filter(F.col("note") == "extra").count() == 2


def test_schema_evolution_missing_column_null_fills(spark, nation, tmp_path):
    """Append that OMITS an existing column: the new files read back
    null-filled — writers with narrower frames stay compatible."""
    import pyspark.sql.functions as F

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation.limit(3).select("n_nationkey", "n_name"))
    t.append(nation.limit(2).select("n_nationkey"))
    got = t.read()
    assert got.columns == ["n_nationkey", "n_name"]
    assert got.filter(F.col("n_name").isNull()).count() == 2


def test_schema_evolution_type_conflict_rejected(spark, nation, tmp_path):
    """Same column name, different type: refused before staging — no
    implicit casts, no partial commit."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from sparkplans.table import SchemaEvolutionError

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation.limit(3).select("n_nationkey", "n_name"))
    bad = nation.limit(1).select(
        "n_nationkey", F.col("n_regionkey").cast("double").alias("n_name")
    )
    with _pytest.raises(SchemaEvolutionError):
        t.append(bad)
    assert t.latest_version() == 0  # nothing committed


def test_schema_evolution_time_travel_shows_old_schema(spark, nation, tmp_path):
    """Time travel to a pre-evolution version reads the OLD schema —
    the log records schema per version, not one global schema."""
    import pyspark.sql.functions as F

    t = VersionedTable(spark, str(tmp_path / "t"))
    v0 = t.append(nation.limit(3).select("n_nationkey", "n_name"))
    t.append(
        nation.limit(2).select("n_nationkey", F.lit(1).alias("flag"), "n_name")
    )
    assert t.read(version=v0).columns == ["n_nationkey", "n_name"]
    assert t.read().columns == ["n_nationkey", "n_name", "flag"]


def test_schema_evolution_through_merge(spark, nation, tmp_path):
    """MERGE with updates carrying a new column: survivors null-fill
    it; same-key rows are replaced with the wider rows."""
    import pyspark.sql.functions as F

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation.limit(5).select("n_nationkey", "n_name"))
    upd = nation.limit(2).select(
        "n_nationkey",
        F.lit("upd").alias("n_name"),
        F.lit(9).alias("score"),
    )
    t.merge(upd, key="n_nationkey")
    got = t.read()
    assert set(got.columns) == {"n_nationkey", "n_name", "score"}
    assert got.count() == 5
    assert got.filter(F.col("score") == 9).count() == 2
    assert got.filter(F.col("score").isNull()).count() == 3


def test_log_stats_data_skipping(spark, nation, tmp_path):
    """Per-file [min,max] recorded at commit prune disjoint files at
    read — from the log alone, no footer sweep — and the pruned read
    equals the full-scan filter."""
    import pyspark.sql.functions as F

    t = VersionedTable(spark, str(tmp_path / "t"))
    # three appends with disjoint key ranges, one file each
    for lo, hi in [(0, 8), (9, 16), (17, 24)]:
        t.append(
            nation.filter(F.col("n_nationkey").between(lo, hi)).coalesce(1),
            stats_cols=["n_nationkey"],
        )
    all_files = t._files_at(t.latest_version())
    assert len(all_files) == 3
    kept = t.pruned_files("n_nationkey", lo=10, hi=12)
    assert len(kept) == 1  # only the middle file may intersect
    got = t.read_pruned("n_nationkey", lo=10, hi=12)
    want = t.read().filter(F.col("n_nationkey").between(10, 12))
    assert sorted(r["n_nationkey"] for r in got.collect()) == sorted(
        r["n_nationkey"] for r in want.collect()
    )
    # everything prunes -> empty frame, right schema
    assert t.read_pruned("n_nationkey", lo=1000).count() == 0
    assert t.read_pruned("n_nationkey", lo=1000).columns == nation.columns


def test_log_stats_conservative_without_stats(spark, nation, tmp_path):
    """Files committed WITHOUT stats never prune (correctness first):
    a mixed table still returns exact results."""
    import pyspark.sql.functions as F

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(
        nation.filter(F.col("n_nationkey") < 10).coalesce(1),
        stats_cols=["n_nationkey"],
    )
    t.append(nation.filter(F.col("n_nationkey") >= 10).coalesce(1))  # no stats
    kept = t.pruned_files("n_nationkey", lo=20)
    assert len(kept) == 1  # stats file pruned, stats-less file kept
    got = t.read_pruned("n_nationkey", lo=20)
    assert got.count() == nation.filter(F.col("n_nationkey") >= 20).count()


def test_log_stats_survive_vacuum(spark, nation, tmp_path):
    """vacuum's base rewrite folds the removed appends' stats into the
    kept entry — pruning keeps working on the compacted log."""
    import pyspark.sql.functions as F

    t = VersionedTable(spark, str(tmp_path / "t"))
    for lo, hi in [(0, 8), (9, 16), (17, 24)]:
        t.append(
            nation.filter(F.col("n_nationkey").between(lo, hi)).coalesce(1),
            stats_cols=["n_nationkey"],
        )
    t.vacuum(keep_versions=1, orphan_age_seconds=0)
    assert len(t.versions()) == 1
    kept = t.pruned_files("n_nationkey", lo=10, hi=12)
    assert len(kept) == 1
    assert t.read_pruned("n_nationkey", lo=10, hi=12).count() == 3


def test_concurrent_appends_all_win_distinct_versions(spark, nation, tmp_path):
    """N threads race appends through the os.link commit protocol:
    every writer lands, on a distinct version, and the final snapshot
    holds all rows — the optimistic-concurrency claim, exercised with
    real concurrency rather than a staged retry."""
    import threading

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation.limit(1))
    errors = []

    def writer(k):
        try:
            t.append(nation.limit(k + 1))
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    threads = [threading.Thread(target=writer, args=(k,)) for k in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    assert t.versions() == [0, 1, 2, 3, 4]  # five distinct commits
    # every batch's rows are present: 1 + (1+2+3+4)
    assert t.read().count() == 11


def test_copy_on_write_delete(spark, nation, tmp_path):
    """DELETE rewrites survivors as a new version; the pre-delete
    snapshot still time-travels; NULLs in the predicate column are
    survivors (NOT(null) is not true)."""
    import pyspark.sql.functions as F

    t = VersionedTable(spark, str(tmp_path / "t"))
    v0 = t.append(nation)
    v1 = t.delete(F.col("n_regionkey") == 1)
    assert t.read().count() == 20
    assert t.read().filter(F.col("n_regionkey") == 1).count() == 0
    assert t.read(version=v0).count() == 25  # time travel intact
    assert t.history()[v1]["delete"]


def test_copy_on_write_delete_sql_condition(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(nation)
    t.delete("n_nationkey >= 20")
    assert t.read().count() == 20


def test_copy_on_write_update(spark, nation, tmp_path):
    """UPDATE applies assignments only to matching rows; others ride
    through byte-identical; old version unchanged."""
    import pyspark.sql.functions as F

    t = VersionedTable(spark, str(tmp_path / "t"))
    v0 = t.append(nation)
    t.update(
        "n_regionkey = 2",
        {"n_name": F.lit("REDACTED"), "n_regionkey": "n_regionkey + 100"},
    )
    got = t.read()
    assert got.filter(F.col("n_regionkey") == 102).count() == 5
    assert got.filter(F.col("n_name") == "REDACTED").count() == 5
    assert got.filter(F.col("n_regionkey") == 2).count() == 0
    # untouched rows identical to v0
    untouched = got.filter(F.col("n_regionkey") != 102)
    orig = t.read(version=v0).filter(F.col("n_regionkey") != 2)
    assert untouched.exceptAll(orig).count() == 0
    assert orig.exceptAll(untouched).count() == 0


def test_tpch_refresh_cycle(spark, nation, tmp_path):
    """TPC-H RF1/RF2-style maintenance: insert a batch (RF1), delete a
    slice (RF2) — aggregate results stay consistent with the direct
    computation at every version."""
    import pyspark.sql.functions as F

    from sparkplans.sources import load_table

    orders = load_table(spark, SF_DIR, "orders")
    t = VersionedTable(spark, str(tmp_path / "t"))
    base = orders.filter(F.col("o_orderkey") % 4 != 0)
    t.append(base)
    rf1 = orders.filter(F.col("o_orderkey") % 4 == 0)
    t.append(rf1)  # RF1: new sales
    assert t.read().count() == orders.count()
    t.delete(F.col("o_orderkey") % 10 == 3)  # RF2: purge old orders
    want = orders.filter(F.col("o_orderkey") % 10 != 3)
    assert t.read().count() == want.count()
    got_rev = t.read().agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
    ).collect()[0]["s"]
    want_rev = want.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
    ).collect()[0]["s"]
    assert got_rev == want_rev


def test_sql_dml_on_versioned_table(spark, nation, tmp_path):
    """DELETE FROM / UPDATE ... SET SQL routes to the versioned
    table's copy-on-write commits through Engine.sql — including
    multi-assignment SET with nested commas — and refreshes the
    registered view."""
    from sparkplans.engine import Engine

    eng = Engine(spark=spark)
    t = eng.create_versioned_table("vt_dml", str(tmp_path / "t"))
    t.append(nation)
    eng.table_at("vt_dml")  # register the view

    res = eng.sql("DELETE FROM vt_dml WHERE n_regionkey = 0").collect()[0]
    assert res["rows"] == 20
    assert spark.sql("SELECT count(*) c FROM vt_dml").collect()[0]["c"] == 20

    eng.sql(
        "UPDATE vt_dml SET n_name = concat(n_name, '!'), "
        "n_regionkey = n_regionkey + 10 WHERE n_regionkey = 1"
    )
    got = spark.sql(
        "SELECT count(*) c FROM vt_dml WHERE n_regionkey = 11 "
        "AND n_name LIKE '%!'"
    ).collect()[0]["c"]
    assert got == 5
    # time travel still sees the original
    assert t.read(version=0).count() == 25
    # non-versioned queries pass through untouched
    assert eng.sql("SELECT 1 AS x").collect()[0]["x"] == 1


def test_sql_time_travel_vacuum_optimize(spark, nation, tmp_path):
    """`VERSION AS OF` time travel, OPTIMIZE (compact) and VACUUM all
    work through Engine.sql — the lakehouse maintenance surface as
    plain SQL."""
    from sparkplans.engine import Engine

    eng = Engine(spark=spark)
    t = eng.create_versioned_table("vt_tt", str(tmp_path / "t"))
    t.append(nation)
    eng.table_at("vt_tt")
    eng.sql("DELETE FROM vt_tt WHERE n_regionkey = 0")

    n_old = eng.sql(
        "SELECT count(*) AS c FROM vt_tt VERSION AS OF 0"
    ).collect()[0]["c"]
    n_now = eng.sql("SELECT count(*) AS c FROM vt_tt").collect()[0]["c"]
    assert (n_old, n_now) == (25, 20)
    # join current against the pinned snapshot in ONE statement
    gone = eng.sql(
        "SELECT count(*) AS c FROM vt_tt VERSION AS OF 0 o "
        "LEFT ANTI JOIN vt_tt n ON o.n_nationkey = n.n_nationkey"
    ).collect()[0]["c"]
    assert gone == 5

    assert eng.sql("OPTIMIZE vt_tt").collect()[0]["version"] == 2
    removed = eng.sql("VACUUM vt_tt").collect()[0]["files_removed"]
    assert removed > 0
    assert eng.sql("SELECT count(*) AS c FROM vt_tt").collect()[0]["c"] == 20


def test_sql_describe_history(spark, nation, tmp_path):
    """`DESCRIBE HISTORY vt` through Engine.sql: one row per committed
    version with op and file count — the audit view of the tx log."""
    from sparkplans.engine import Engine

    eng = Engine(spark=spark)
    t = eng.create_versioned_table("vt_hist", str(tmp_path / "t"))
    t.append(nation)
    t.append(nation.limit(3))
    eng.table_at("vt_hist")
    eng.sql("DELETE FROM vt_hist WHERE n_regionkey = 0")

    h = {r.version: r for r in eng.sql("DESCRIBE HISTORY vt_hist").collect()}
    assert sorted(h) == [0, 1, 2]
    assert h[0].op == "append" and h[1].op == "append"
    assert h[2].op == "overwrite"  # copy-on-write DELETE commits a rewrite
    assert all(r.n_files >= 1 for r in h.values())


def test_delete_null_predicate_rows_survive(spark, tmp_path):
    """SQL three-valued logic: DELETE drops rows where the predicate is
    TRUE; a NULL predicate is *not true*, so the row survives — same
    asymmetry UPDATE's when/otherwise gives for free.  Regression for
    the filter(~cond) form, which silently deleted NULL-predicate rows."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 3)], "id int, x int"
    )
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(df)
    t.delete("x > 5")  # TRUE for id=1; NULL for id=2; FALSE for id=3
    got = sorted(r.id for r in t.read().collect())
    assert got == [2, 3]  # the NULL-x row survived

    # same semantics through the SQL DML surface
    from sparkplans.engine import Engine

    eng = Engine(spark=spark)
    t2 = eng.create_versioned_table("vt_null_del", str(tmp_path / "t2"))
    t2.append(df)
    eng.sql("DELETE FROM vt_null_del WHERE x > 5")
    assert sorted(r.id for r in t2.read().collect()) == [2, 3]


def test_time_travel_name_is_word_anchored(spark, nation, tmp_path):
    """A versioned table whose name is a suffix of another identifier
    must not have its VERSION AS OF rewrite eat the longer name:
    with tables `x` and `tax` both pinned at version 0 in one query,
    an unanchored sub for `x` would corrupt `tax VERSION AS OF 0`."""
    from sparkplans.engine import Engine

    eng = Engine(spark=spark)
    tx = eng.create_versioned_table("x", str(tmp_path / "x"))
    tx.append(nation.limit(5))
    ttax = eng.create_versioned_table("tax", str(tmp_path / "tax"))
    ttax.append(nation.limit(3))
    got = eng.sql(
        "SELECT (SELECT count(*) FROM x VERSION AS OF 0) AS cx, "
        "(SELECT count(*) FROM tax VERSION AS OF 0) AS ctax"
    ).collect()[0]
    assert (got.cx, got.ctax) == (5, 3)
