"""Local approximation of the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet dir, then compare row count, column names, and an
order-insensitive value hash (floats rounded)."""

from __future__ import annotations

import hashlib
import math
import os
from datetime import datetime

import duckdb


TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue  # subset dir (generate_sf --tables) — skip absent
        if os.path.isdir(path):  # Spark-written table = directory of parts
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            # canonicalize signed zero: Spark's BigDecimal round
            # yields +0.0 where DuckDB's IEEE round keeps -0.0
            return "0"
        return f"{v:.6g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def result_signature(cols: list[str], rows: list[tuple]) -> tuple[int, tuple, str]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_value(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return len(rows), tuple(sorted(cols)), h


def spark_signature(df) -> tuple[int, tuple, str]:
    rows = [tuple(r) for r in df.collect()]
    return result_signature(df.columns, rows)


def duck_signature(con, sql: str) -> tuple[int, tuple, str]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return result_signature(cols, rows)


def compare(spark, con, fn, sql, sf_dir: str) -> dict:
    s_count, s_cols, s_hash = spark_signature(fn(spark, sf_dir))
    d_count, d_cols, d_hash = duck_signature(con, sql)
    return {
        "rows_match": s_count == d_count,
        "schema_match": s_cols == d_cols,
        "hash_match": s_hash == d_hash,
        "spark": (s_count, s_cols, s_hash),
        "duck": (d_count, d_cols, d_hash),
    }
