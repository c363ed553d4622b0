"""Python UDTF (Spark 4) — completes the SURVEY §2.10 UDF quadrant
(scalar pandas_udf, grouped-agg pandas_udf, applyInPandas,
mapInPandas/mapInArrow, and now table functions).

UDTFs are the Python-side generator analog of LATERAL VIEW; like all
Python paths they are NOT for hot loops (the library's queries stay
JVM-side) — the test pins semantics against the codegen'd JVM twin so
either formulation can be swapped in."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from tests.conftest import SF_DIR
from sparkplans.sources import load_table


@udtf(returnType="gram: string")
class TokenNGrams:
    """Token n-grams of a whitespace-tokenized string."""

    def eval(self, text: str, n: int):
        toks = (text or "").lower().strip().split()
        for i in range(len(toks) - n + 1):
            yield (" ".join(toks[i : i + n]),)


def test_udtf_matches_jvm_twin(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)

    spark.udtf.register("token_ngrams", TokenNGrams)
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT g.gram FROM udtf_docs, LATERAL token_ngrams(text, 2) AS g"
    )

    # JVM twin: the same bigrams via sequence/transform expressions
    via_jvm = (
        docs.select(F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"))
        .select(
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) >= 2 THEN "
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> concat_ws(' ', slice(toks, i + 1, 2))) "
                    "ELSE array() END"
                )
            ).alias("gram")
        )
    )

    left = sorted(r.gram for r in via_udtf.collect())
    right = sorted(r.gram for r in via_jvm.collect())
    assert left == right and len(left) > 0
