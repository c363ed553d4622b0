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

    # Optional DuckDB resource bounds for big-SF sweeps: an unbounded
    # in-process DuckDB competes with the Spark JVM for the same RAM
    # and dies with allocator OOM mid-sweep (observed at sf3); a
    # memory_limit plus a temp_directory lets the heavy oracles spill
    # to disk instead.
    duck_mem = os.environ.get("SPARK_GRAFT_DUCK_MEM", "")

    # Optional subset filter (comma-separated query names) for
    # re-running just the failures of a long sweep.
    only = {
        s for s in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if s
    }

    # Opt-in (set the env var to enable, costs one extra count() per
    # query): results larger than this are compared by ROW COUNT
    # only.  The value hash collects the full result into the driver,
    # which is infeasible for queries whose output is itself
    # corpus-sized at big SF (embedding_near_dups emits 84M pairs at
    # sf3 — the threshold is cardinality-tuned to sf0.01).
    # Count-vs-count is still an engine-vs-oracle check; the driver's
    # own sf0.01 gate always hashes.
    hash_row_limit = int(
        os.environ.get("SPARK_GRAFT_HASH_ROW_LIMIT", "0") or 0
    )

    assert E.entry(spark).count() > 0, "entry() smoke check failed"
    qs, oracles = E.queries(), E.oracle_sql()
    con = duck_connection(sf_dir)
    if duck_mem:
        con.execute(f"SET memory_limit='{duck_mem}'")
        con.execute("SET temp_directory='/tmp/duckspill'")
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
        qs = {k: v for k, v in qs.items() if k in only or k in oracles}
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
            df = qs[name](spark, sf_dir)
            n_rows = df.count() if hash_row_limit else 0
            if hash_row_limit and n_rows > hash_row_limit:
                # too big to collect-and-hash: engine-vs-oracle row
                # count comparison only (no driver-side materialize
                # on either engine)
                ts = time.time()
                timer = None
                if oracle_timeout > 0:
                    timer = threading.Timer(oracle_timeout, con.interrupt)
                    timer.start()
                try:
                    d_n = con.execute(
                        f"SELECT count(*) FROM ({oracles[name]})"
                    ).fetchone()[0]
                finally:
                    if timer is not None:
                        timer.cancel()
                if n_rows != d_n:
                    failures.append(name)
                    print(
                        f"FAIL {name}: count-only spark={n_rows} "
                        f"duck={d_n}",
                        flush=True,
                    )
                else:
                    print(
                        f"ok   {name}: count-only ({n_rows} rows > "
                        f"hash limit {hash_row_limit}) "
                        f"{time.time() - tq:.1f}s [{i + 1}/{len(oracles)}]",
                        flush=True,
                    )
                continue
            s_sig = spark_signature(df)
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
