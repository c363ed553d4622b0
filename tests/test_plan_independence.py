"""Physical-plan independence: results must not depend on the
physical strategy Catalyst picks.  The reference's whole theme is
steering plan shape through config (docs/5, docs/7, docs/8,
tests/opt_parallel_execution.rs:16-23); the correctness dual of that
story is that every steered shape computes the SAME answer.  Flip the
big physical levers (AQE, broadcast, codegen, shuffle width) and
assert identical results on representative queries.
"""

from __future__ import annotations

import pytest

import sparkplans.queries as Q
from tests.conftest import SF_DIR

FLIPS = [
    ("spark.sql.adaptive.enabled", "false"),
    ("spark.sql.autoBroadcastJoinThreshold", "-1"),  # force shuffle joins
    ("spark.sql.codegen.wholeStage", "false"),
    ("spark.sql.shuffle.partitions", "1"),
]

QUERIES = ["flagship_datebin", "tpch_q5_local_supplier", "lsh_candidates"]


def _rows(spark, name):
    df = Q.REGISTRY[name].fn(spark, SF_DIR)
    cols = sorted(df.columns)
    out = []
    for r in df.collect():
        d = r.asDict()
        out.append(
            tuple(
                round(v, 9) if isinstance(v, float) else v for v in (d[c] for c in cols)
            )
        )
    return sorted(out, key=repr)


@pytest.mark.parametrize("key,value", FLIPS, ids=[k.split(".")[-1] for k, _ in FLIPS])
@pytest.mark.parametrize("name", QUERIES)
def test_results_invariant_under_physical_flips(spark, name, key, value):
    baseline = _rows(spark, name)
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        flipped = _rows(spark, name)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert flipped == baseline, f"{name} changed results under {key}={value}"
