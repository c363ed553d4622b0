"""Reference-shaped test fixtures per FIXTURES.md: the 4-row sorted
dimension table and the 2-file sorted time-series fact table."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

DIM_ROWS = [
    # sorted by (env, service, host); env='prod' matches 3 of 4
    ("A", "dev", "log", "ma"),
    ("B", "prod", "log", "ma"),
    ("C", "prod", "log", "vim"),
    ("D", "prod", "trace", "vim"),
]


def write_dimension(dirpath: str) -> str:
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, "dimension_1.parquet")
    cols = list(zip(*DIM_ROWS))
    t = pa.table(
        {
            "d_dkey": pa.array(cols[0], pa.string()),
            "env": pa.array(cols[1], pa.string()),
            "service": pa.array(cols[2], pa.string()),
            "host": pa.array(cols[3], pa.string()),
        }
    )
    pq.write_table(t, path)
    return path


def write_dimension_csv(dirpath: str) -> str:
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, "dimension_1.csv")
    with open(path, "w") as f:
        f.write("d_dkey,env,service,host\n")
        for r in DIM_ROWS:
            f.write(",".join(r) + "\n")
    return path


def _fact_rows(keys: list[str], hour: int, n: int) -> list[tuple[str, datetime, float]]:
    """Per-file rows sorted by (f_dkey, timestamp); ~10s spacing with
    gaps so 30s date_bin buckets hold multiple rows (FIXTURES.md §2)."""
    rows = []
    i = 0
    for k in keys:
        per_key = n // len(keys) + (1 if keys.index(k) < n % len(keys) else 0)
        base = datetime(2023, 1, 1, hour, 0, 0)
        off = 0
        for j in range(per_key):
            rows.append((k, base + timedelta(seconds=off), round(1.0 + (i % 40) * 2.5, 1)))
            off += 10 if (j % 4) else 40  # gaps
            i += 1
    return rows


def write_fact2(dirpath: str) -> list[str]:
    """Two files: hour 09 (21 rows, keys A-C) and hour 10 (24 rows,
    keys B-D — 'D' only in file 2), each sorted by (f_dkey, ts)."""
    os.makedirs(dirpath, exist_ok=True)
    paths = []
    for fname, keys, hour, n in [
        ("fact_1.parquet", ["A", "B", "C"], 9, 21),
        ("fact_2.parquet", ["B", "C", "D"], 10, 24),
    ]:
        rows = _fact_rows(keys, hour, n)
        path = os.path.join(dirpath, fname)
        t = pa.table(
            {
                "f_dkey": pa.array([r[0] for r in rows], pa.string()),
                "timestamp": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
        pq.write_table(t, path)
        paths.append(path)
    return paths
