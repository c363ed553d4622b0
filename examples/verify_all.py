#!/usr/bin/env python
"""Full oracle sweep at any scale factor — the driver's correctness
gate, runnable standalone::

    python examples/verify_all.py [sf_dir]          # default sf0.01

Simulates the external driver exactly: a bare SparkSession (no engine
confs — ``__spark_entry__`` must self-configure), every ``queries()``
entry executed and compared against its ``oracle_sql()`` twin in
DuckDB (row count + schema + order-insensitive value hash).  Prints
one line per failure and a final tally; exit code 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.ui.enabled", "false")
        # the driver's own harness runs sf0.01 where the default heap
        # is fine; local sweeps at sf>=1 need a real executor heap
        # (local mode: driver JVM == all executors)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .getOrCreate()
    )
    import threading

    import __spark_entry__ as E
    from oracle_harness import duck_connection, duck_signature, spark_signature

    # Optional per-query ceiling on the DuckDB-side oracle (seconds).
    # Some oracles are deliberately naive (recursive CTEs, all-pairs
    # re-derivations) and blow up super-linearly at sf>=1 even though
    # the engine side stays sub-linear; a timeout records them as
    # 'oracle-timeout' (engine result produced fine, oracle infeasible
    # at this scale) instead of hanging the sweep for hours.
    oracle_timeout = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "0"))

    assert E.entry(spark).count() > 0, "entry() smoke check failed"
    qs, oracles = E.queries(), E.oracle_sql()
    con = duck_connection(sf_dir)
    t0 = time.time()
    failures = []
    for i, name in enumerate(sorted(oracles)):
        if i and i % 40 == 0:
            # a 200+-query session accumulates dead checkpoint/broadcast
            # refs; nudge the JVM so GCLocker contention doesn't fail a
            # late heavy query (observed with iterative pagerank)
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        tq = time.time()
        try:
            s_sig = spark_signature(qs[name](spark, sf_dir))
            ts = time.time()
            timer = None
            if oracle_timeout > 0:
                timer = threading.Timer(oracle_timeout, con.interrupt)
                timer.start()
            try:
                d_sig = duck_signature(con, oracles[name])
            except Exception as ex:  # noqa: BLE001
                if timer is not None and time.time() - ts >= oracle_timeout:
                    print(
                        f"oracle-timeout {name}: spark ok "
                        f"({s_sig[0]} rows, {ts - tq:.1f}s); DuckDB "
                        f"oracle interrupted after {oracle_timeout:.0f}s "
                        f"[{i + 1}/{len(oracles)}]",
                        flush=True,
                    )
                    continue
                raise ex
            finally:
                if timer is not None:
                    timer.cancel()
            r = {
                "rows_match": s_sig[0] == d_sig[0],
                "schema_match": s_sig[1] == d_sig[1],
                "hash_match": s_sig[2] == d_sig[2],
                "spark": s_sig,
                "duck": d_sig,
            }
            if not (r["rows_match"] and r["schema_match"] and r["hash_match"]):
                failures.append(name)
                print(f"FAIL {name}: {r}", flush=True)
            elif os.environ.get("SPARK_GRAFT_VERIFY_VERBOSE"):
                print(
                    f"ok   {name}: {time.time() - tq:.1f}s "
                    f"(spark {ts - tq:.1f}s) [{i + 1}/{len(oracles)}]",
                    flush=True,
                )
        except Exception as ex:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"ERR  {name}: {ex!r}"[:300], flush=True)
    rows_only = sorted(set(qs) - set(oracles))
    for name in rows_only:
        try:
            n = qs[name](spark, sf_dir).count()
            print(f"rows-only {name}: {n} rows")
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"ERR  {name}: {ex!r}"[:300])
    print(
        f"checked {len(oracles)} oracled + {len(rows_only)} rows-only "
        f"queries at {sf_dir} in {time.time() - t0:.1f}s; "
        f"failures: {len(failures)}"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
