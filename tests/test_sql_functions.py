"""SQL UDF surface: the engine's scalar library registered as
``CREATE FUNCTION … RETURN <expr>`` macros — visible to
``SHOW FUNCTIONS`` / ``DESCRIBE FUNCTION``, the Spark analog of the
reference's ``information_schema.routines``
(docs/1_cli_information_schema.md:132-133).  Twin tests pin the SQL
bodies to the Column implementations: any drift fails here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkplans.functions import (
    cosine_similarity,
    date_bin,
    doc_fingerprint,
    quality_score,
    register_sql_functions,
    token_count,
)
from sparkplans.sources import load_table
from tests.conftest import SF_DIR


def test_sql_udfs_match_column_twins(spark):
    register_sql_functions(spark)
    d = load_table(spark, SF_DIR, "documents").limit(300)
    d.createOrReplaceTempView("docs_f")
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT doc_id, token_count(text) AS tc, "
                "doc_fingerprint(text) AS fp, quality_score(text) AS q "
                "FROM docs_f"
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            d.select(
                "doc_id",
                token_count("text").alias("tc"),
                doc_fingerprint("text").alias("fp"),
                quality_score("text").alias("q"),
            ).collect(),
        )
    )
    assert got == want


def test_sql_udf_cosine_and_datebin(spark):
    register_sql_functions(spark)
    e = load_table(spark, SF_DIR, "embeddings").limit(50)
    e.createOrReplaceTempView("emb_f")
    pairs = spark.sql(
        "SELECT a.vec_id ia, b.vec_id ib, "
        "cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>), CAST(b.embedding AS ARRAY<DOUBLE>)) AS c "
        "FROM emb_f a JOIN emb_f b ON a.vec_id < b.vec_id LIMIT 100"
    ).collect()
    want = {
        (r.ia, r.ib): r.c
        for r in e.alias("a")
        .join(e.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias("c"),
        )
        .collect()
    }
    for r in pairs:
        assert abs(r.c - want[(r.ia, r.ib)]) < 1e-12

    ev = load_table(spark, SF_DIR, "events").limit(500)
    ev.createOrReplaceTempView("ev_f")
    got = sorted(
        map(tuple, spark.sql("SELECT event_id, date_bin_secs(300, ts) b FROM ev_f").collect())
    )
    want2 = sorted(
        map(tuple, ev.select("event_id", date_bin("ts", "5 minutes").alias("b")).collect())
    )
    # arithmetic (SQL-function-legal) form == window() form, epoch-aligned
    assert got == want2


def test_sql_udfs_visible_in_catalog(spark):
    names = set(register_sql_functions(spark))
    listed = {r.function.split(".")[-1] for r in spark.sql("SHOW USER FUNCTIONS").collect()}
    assert names <= listed
    desc = "\n".join(r[0] for r in spark.sql("DESCRIBE FUNCTION token_count").collect())
    assert "token_count" in desc
