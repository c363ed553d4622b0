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
]
