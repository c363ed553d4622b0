"""date_bin — fixed-interval timestamp bucketing.

The reference's flagship scalar function
(``tests/opt_parallel_execution.rs:34``:
``date_bin(INTERVAL '30 seconds', f.timestamp)``), epoch-aligned by
default.  Spark's ``window(ts, interval)`` produces the identical
epoch-aligned buckets ([start, end) tumbling windows); we surface just
the start.  DuckDB's ``time_bucket(INTERVAL, ts)`` matches too, which
is what the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def date_bin(ts: Column | str, interval: str = "30 seconds", origin: str | None = None) -> Column:
    """Bucket ``ts`` into fixed ``interval`` windows; returns the
    bucket start timestamp.

    ``origin`` shifts the bucket grid (the reference's optional third
    argument); expressed via ``window``'s startTime offset.
    """
    col = F.col(ts) if isinstance(ts, str) else ts
    if origin is None:
        return F.window(col, interval)["start"]
    return F.window(col, interval, interval, origin)["start"]
