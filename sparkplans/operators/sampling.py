"""Deterministic weighted sampling without replacement — the
Efraimidis–Spirakis A-ES scheme with a portable pseudo-random source,
for "sample documents proportional to quality" selection steps in a
training-data pipeline.

A-ES: each row gets key = u^(1/w) for uniform u in (0,1); the k
largest keys are a weighted sample without replacement.  Instead of
`rand()` (not reproducible across engines/retries), u comes from a
Lehmer LCG over the row's integer id — pure 64-bit integer arithmetic
that evaluates identically in Spark and DuckDB, so the sample is a
pure function of (id, seed) and the oracle can replay it.

Scale: one projection + one top-k.  Global top-k is
`TakeOrderedAndProject` (per-partition heads, single merge — no
global sort); per-stratum top-k is one rank window keyed on the
stratum.  Nothing here touches the corpus twice, and re-runs (or
speculative task retries) produce byte-identical samples — the
property `rand()`-based sampling loses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_M = 2147483647  # Mersenne prime 2^31-1 (Lehmer modulus)
_A = 48271  # MINSTD multiplier


def aes_key(id_col, weight_col, seed: int = 1):
    """Column expression: the A-ES priority key u^(1/w).

    u = Lehmer(seed * id) mapped into (0,1); w is clamped to a tiny
    positive floor so zero/negative weights sort last instead of
    dividing by zero."""
    # three Lehmer rounds: a single multiply of a small id never wraps
    # the modulus, leaving u monotone in id (an ordered, useless
    # "random"); rounds 2-3 wrap thousands of times and decorrelate
    x = F.pmod(
        (F.col(id_col).cast("long") + F.lit(int(seed))) * F.lit(_A), F.lit(_M)
    )
    for _ in range(2):
        x = F.pmod(x * F.lit(_A), F.lit(_M))
    u = (x + F.lit(1)).cast("double") / F.lit(float(_M + 1))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1e-12))
    return F.pow(u, F.lit(1.0) / w)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    strata: list[str] | None = None,
    seed: int = 1,
) -> DataFrame:
    """k-row weighted sample without replacement (per stratum when
    ``strata`` is given).  Deterministic in (ids, weights, seed).

    Output: input columns + ``sample_key`` (the A-ES priority, useful
    for auditing inclusion probability)."""
    if k <= 0:
        raise ValueError("k must be positive")
    keyed = df.withColumn("sample_key", aes_key(id_col, weight_col, seed))
    order = [F.desc("sample_key"), F.col(id_col)]
    if not strata:
        return keyed.orderBy(*order).limit(k)
    from pyspark.sql.window import Window

    w = Window.partitionBy(*strata).orderBy(*order)
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
