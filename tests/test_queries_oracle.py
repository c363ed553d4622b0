"""Every registered query hash-matches its DuckDB oracle at sf0.001
(fast inner loop; the driver reruns the same contract at sf0.01)."""

import pytest

import sparkplans.queries as Q
from tests.conftest import SF_DIR
from tests.oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


ORACLE_QUERIES = sorted(Q.oracle_sql().keys())
ROWS_ONLY = sorted(set(Q.queries()) - set(Q.oracle_sql()))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    spec = Q.REGISTRY[name]
    res = compare(spark, duck, spec.fn, spec.oracle, SF_DIR)
    assert res["rows_match"], f"{name}: row count {res['spark'][0]} vs {res['duck'][0]}"
    assert res["schema_match"], f"{name}: columns {res['spark'][1]} vs {res['duck'][1]}"
    assert res["hash_match"], f"{name}: value hash mismatch"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = Q.REGISTRY[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(Q.queries()))
def test_query_output_is_scalar_typed(spark, name):
    """Driver-sample insurance: the driver's canonicalizer hashes row
    values and dies on array/map-typed cells (round-1
    `approx_value_quantiles` failure).  Every registered query must
    therefore emit only scalar top-level columns — serialize arrays
    with array_join / explode before returning."""
    from pyspark.sql import types as T

    df = Q.REGISTRY[name].fn(spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"{name}: non-scalar output columns {bad}"


def test_rowcount_footer_walk_is_bounded(tmp_path, monkeypatch):
    """_rowcount reads at most _ROWCOUNT_MAX_FOOTERS footers and
    extrapolates by file size for larger directories — bounded driver
    work even at an 800k-file table (regression for the unbounded
    sequential walk)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "t.parquet"
    d.mkdir()
    n_files, rows_per = 12, 50
    for i in range(n_files):
        pq.write_table(
            pa.table({"x": list(range(rows_per))}), d / f"part-{i:05d}.parquet"
        )

    # exact when the directory fits under the cap
    assert Q._rowcount(str(tmp_path), "t") == n_files * rows_per

    # capped: only the sampled footers are opened; uniform files
    # extrapolate to the exact total
    monkeypatch.setattr(Q, "_ROWCOUNT_MAX_FOOTERS", 4)
    opened = []
    real = pq.ParquetFile

    def counting(f, *a, **k):
        opened.append(f)
        return real(f, *a, **k)

    monkeypatch.setattr(pq, "ParquetFile", counting)
    assert Q._rowcount(str(tmp_path), "t") == n_files * rows_per
    assert len(opened) == 4
