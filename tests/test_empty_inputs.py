"""Degenerate-input robustness: every registered query must execute
on a dataset where every table has ZERO rows.  At 100 TB, empty
partitions, empty date ranges and freshly-created tables are routine;
a query that crashes on empty input (descending `sequence(1,0)`
arrays, `first()` on nothing, divide-by-count...) is a production
outage, not an edge case.  Result contents are the oracle's job at
sf0.01 — here we only require successful execution and a stable
schema.
"""

from __future__ import annotations

import pytest

import sparkplans.queries as Q
from sparkplans.sources import TABLES, load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(0).write.parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(Q.REGISTRY))
def test_query_survives_empty_input(spark, empty_sf_dir, name):
    df = Q.REGISTRY[name].fn(spark, empty_sf_dir)
    rows = df.collect()  # must not raise
    assert rows == [] or all(r is not None for r in rows)
    assert len(df.schema.fields) > 0
