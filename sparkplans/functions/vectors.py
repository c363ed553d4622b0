"""Vector math over array<float|double> columns — JVM-side.

Used by the similarity-search and embedding-dedup operators.  All
expressions stay inside Catalyst (``zip_with``/``aggregate``), no
Python in the hot path; elements are cast to double so results match
DuckDB's ``list_dot_product``/``list_cosine_similarity`` on the same
data.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dbl(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(_c(a)), _dbl(_c(b)), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
