"""The reference's flagship query end-to-end on reference-shaped
fixtures (tests/opt_parallel_execution.rs:33-62): dim ⋈ fact with
env filter, 30s date_bin, grouped max, ordered output — result checked
against DuckDB, plan checked structurally (broadcast join, no
redundant exchanges — mirrors the no-RepartitionExec golden)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkplans import plans
from sparkplans.engine import Engine
from sparkplans.functions import date_bin
from tests.fixtures import write_dimension, write_fact2


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("flagship")
    write_dimension(str(base / "dimension1"))
    write_fact2(str(base / "fact2"))
    e = Engine(spark=spark)
    e.create_external_table(
        "fdim", str(base / "dimension1"), with_order=["env", "service", "host"]
    )
    e.create_external_table(
        "ffact", str(base / "fact2"), with_order=["f_dkey", "timestamp"]
    )
    return e, str(base)


def _flagship_df(e: Engine):
    dim = e.table("fdim").filter(F.col("env") == "prod")
    fact = e.table("ffact")
    return (
        fact.join_broadcast(dim, F.col("d_dkey") == F.col("f_dkey"))
        .select(
            F.col("f_dkey").alias("f_key"),
            date_bin("timestamp", "30 seconds").alias("time_bin"),
            "service",
            "value",
        )
        .df.groupBy("f_key", "time_bin", "service")
        .agg(F.max("value").alias("max_bin_val"))
        .orderBy("f_key", "time_bin", "service")
    )


def test_flagship_matches_duckdb(eng):
    e, base = eng
    df = _flagship_df(e)
    got = [(r.f_key, r.time_bin, r.service, r.max_bin_val) for r in df.collect()]
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT f.f_dkey AS f_key,
               time_bucket(INTERVAL '30 seconds', f."timestamp") AS time_bin,
               d.service,
               max(f.value) AS max_bin_val
        FROM read_parquet('{base}/dimension1/*.parquet') d
        JOIN read_parquet('{base}/fact2/*.parquet') f ON d.d_dkey = f.f_dkey
        WHERE d.env = 'prod'
        GROUP BY f_key, time_bin, d.service
        ORDER BY f_key, time_bin, d.service
        """
    ).fetchall()
    assert got == [tuple(w) for w in want]
    assert len(got) > 0


def test_flagship_plan_shape(eng):
    """Structural optimality mirroring the reference golden plan
    (tests/opt_parallel_execution.rs:65-82): the dim side broadcasts
    (CollectLeft analog) and the only shuffles are the aggregation
    exchange + the final ordering — nothing redundant."""
    e, _ = eng
    df = _flagship_df(e)
    assert "BroadcastHashJoin" in plans.join_strategies(df)
    # one hash exchange for the group-by, one range exchange for the
    # final ORDER BY; the join itself must not shuffle the fact side
    assert plans.num_exchanges(df) <= 2


def test_flagship_probe_side_order_knowledge(eng):
    """After the broadcast join, the engine still knows the fact-side
    ordering (docs/8:188-196: probe streams stay sorted)."""
    e, _ = eng
    dim = e.table("fdim").filter(F.col("env") == "prod")
    joined = e.table("ffact").join_broadcast(dim, F.col("d_dkey") == F.col("f_dkey"))
    assert [k.col for k in joined.ordering] == ["f_dkey", "timestamp"]
