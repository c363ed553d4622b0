"""Scalar/aggregate function surface.

The reference's own scalar surface is tiny (SURVEY §2.8): ``date_bin``,
``count``/``max``, timestamp/interval literals, string equality.  The
rest of the library is inherited from ``pyspark.sql.functions``; this
package adds the pieces Spark spells differently plus the
text/vector helpers used by the LLM-pipeline operators.
"""

from sparkplans.functions.datetime import date_bin
from sparkplans.functions.text import (
    token_count,
    ngrams,
    quality_score,
    doc_fingerprint,
)
from sparkplans.functions.vectors import (
    dot,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "date_bin",
    "token_count",
    "ngrams",
    "quality_score",
    "doc_fingerprint",
    "dot",
    "l2_norm",
    "cosine_similarity",
    "column_sql",
    "register_sql_functions",
]


def column_sql(col) -> str:
    """Render a Column expression as Spark SQL text.  Works for
    function-call-shaped expressions; arithmetic renders in prefix
    form (``/(a, b)``), so bodies containing math are hand-written in
    ``register_sql_functions`` instead — the SQL-vs-Column twin tests
    are what pin the two surfaces together."""
    return col._jc.node().sql()


def register_sql_functions(spark) -> list[str]:
    """Register the engine's scalar library as SQL UDFs
    (``CREATE OR REPLACE TEMPORARY FUNCTION … RETURN <expr>``), making
    it visible to ``SHOW FUNCTIONS`` / ``DESCRIBE FUNCTION`` — the
    Spark analog of the reference's ``information_schema.routines``
    surface (docs/1_cli_information_schema.md:132-133).  Bodies are
    pure expressions, so calls inline into Catalyst plans and stay in
    whole-stage codegen (a SQL UDF is a macro, not a black box).

    ``date_bin_secs`` is spelled arithmetically (epoch-aligned floor)
    because ``window()`` expands to a relational pattern SQL functions
    may not contain; the arithmetic form is bin-identical for the
    epoch-aligned case (verified against the window form in tests).
    Returns the registered names."""
    from pyspark.sql import functions as F

    _DOT = (
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
        "(acc, v) -> acc + v)"
    )
    defs = [
        ("token_count", "t STRING", "INT", column_sql(token_count(F.col("t")))),
        ("doc_fingerprint", "t STRING", "STRING", column_sql(doc_fingerprint(F.col("t")))),
        (
            "quality_score",
            "t STRING",
            "DOUBLE",
            # mirrors functions.text.quality_score; twin test pins it
            "round(("
            "least(length(t) / 500.0, 1.0)"
            " + (1.0 - least(regexp_count(t, '[.,;:!?\\'\\\"()\\\\[\\\\]{}-]')"
            " / greatest(length(t), 1) * 4.0, 1.0))"
            " + least(size(filter(split(lower(trim(t)), '\\\\s+'),"
            " x -> array_contains(array('the','a','of','and','to','in','is'), x)))"
            " / greatest(size(split(trim(t), '\\\\s+')), 1) * 5.0, 1.0)"
            ") / 3.0, 6)",
        ),
        (
            "cosine_sim",
            "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
            "DOUBLE",
            f"{_DOT} / (sqrt({_DOT.replace('(a, b,', '(a, a,')}) * "
            f"sqrt({_DOT.replace('(a, b,', '(b, b,')}))",
        ),
        (
            "date_bin_secs",
            "sec BIGINT, ts TIMESTAMP_NTZ",
            "TIMESTAMP_NTZ",
            "CAST(timestamp_micros(CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) "
            "/ (sec * 1000000)) * sec * 1000000 AS BIGINT)) AS TIMESTAMP_NTZ)",
        ),
    ]
    names = []
    for name, params, ret, body in defs:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {ret} RETURN {body}"
        )
        names.append(name)
    return names
