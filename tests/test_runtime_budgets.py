"""Per-query wall-time ceiling over the whole registry at sf0.001.

The driver samples ~50 of the registered queries each round; every
entry must therefore stay cheap so any future sample is green.  This
ratchet fails if a query sneaks in a sequential driver-job loop, an
all-pairs join, or an unbounded window: at sf0.001 (6k lineitem rows)
NO correct plan needs more than a few seconds — the ceiling is
generous (min-of-2 under 10 s) precisely so only structural
regressions trip it, not scheduler noise."""

import time

import pytest

import sparkplans.queries as Q
from tests.conftest import SF_DIR

CEILING_S = 10.0
TRIES = 2


@pytest.fixture(scope="module", autouse=True)
def warm(spark):
    # JVM/codegen warmup so the first measured query doesn't pay it
    Q.REGISTRY["agg_count_star"].fn(spark, SF_DIR).collect()


@pytest.mark.parametrize("name", sorted(Q.REGISTRY))
def test_query_under_ceiling(spark, name):
    best = float("inf")
    for _ in range(TRIES):
        t0 = time.perf_counter()
        Q.REGISTRY[name].fn(spark, SF_DIR).collect()
        best = min(best, time.perf_counter() - t0)
        if best <= CEILING_S:
            break  # no need for the second try once under the ceiling
    assert best <= CEILING_S, (
        f"{name}: min-of-{TRIES} {best:.1f}s exceeds the {CEILING_S:.0f}s "
        "ceiling at sf0.001 — look for a driver-job loop, an all-pairs "
        "join, or an unpartitioned window"
    )
