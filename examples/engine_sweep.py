#!/usr/bin/env python
"""Engine-only full-registry sweep at any scale factor — the scale
smoke test::

    python examples/engine_sweep.py [sf_dir] [ceiling_sec]

Runs EVERY ``queries()`` entry end-to-end through the noop sink (no
DuckDB oracle, no driver-side collect) and reports per-query wall
time, sorted slowest-first.  This is the cheap half of
``verify_all.py`` for SFs where the deliberately naive oracles are
super-linear (sf10's 60M-row lineitem makes a recursive-CTE oracle
infeasible, but the engine side should stay sub-linear everywhere).

The sf3 oracle sweep caught three scale bugs whose symptom was WALL
TIME, not wrong answers (single-task grid explode, LSH bucket
straggler, driver OOM on a corpus-sized collect) — this sweep detects
exactly that class at any SF in minutes.  Queries slower than the
ceiling (default 120 s) are listed as FLAGged and exit code 1, so a
scheduled run fails loudly when a plan regresses at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10"
    ceiling = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0

    from sparkplans.session import EngineOptions, build_session
    import sparkplans.queries as Q

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    def _conf() -> dict[str, str]:
        # SPARK_GRAFT_EXTRA_CONF="k=v,k=v" for static session confs a
        # particular sweep needs (e.g. spark.io.compression.codec=zstd
        # halves the shuffle/spill footprint of the disk-bound exact
        # SSJoin at sf10 vs the lz4 default).
        conf = {
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "16g"
            )
        }
        for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(","):
            if "=" in kv:
                k, v = kv.split("=", 1)
                conf[k.strip()] = v.strip()
        return conf

    spark = build_session(
        EngineOptions(target_partitions=cpus, extra_conf=_conf()),
        app_name="sparkplans-engine-sweep",
        master=f"local[{cpus}]",
    )

    only = {
        n for n in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if n
    }
    names = sorted(only or Q.queries())

    # warm footers once so timings measure queries, not session startup
    # (subset data dirs — e.g. --tables ML-family-only SFs — may lack
    # the warmup table; the first swept query then absorbs the warmup)
    try:
        Q.REGISTRY["agg_count_star"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass

    def _alive(s) -> bool:
        try:
            s.range(1).count()
            return True
        except Exception:
            return False

    def _fresh_session(old):
        try:
            old.stop()
        except Exception:
            pass
        return build_session(
            EngineOptions(target_partitions=cpus, extra_conf=_conf()),
            app_name="sparkplans-engine-sweep",
            master=f"local[{cpus}]",
        )

    import gc

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    try:
        for i, name in enumerate(names):
            # localCheckpoint blocks from prior queries stay pinned in
            # the unified memory store until their Python DataFrame
            # refs are collected; across a couple hundred corpus-sized
            # queries the storage pool starves execution and the JVM
            # GC-thrashes (observed: a 58 s query straggling >15 min
            # late in a sweep).  Collect per query, recycle the whole
            # session every SPARK_GRAFT_RECYCLE queries (default 25;
            # data-heavy SFs want a shorter interval — a 16 GiB heap
            # carrying ~2 dozen queries of leftover checkpoint blocks
            # OOM'd under pagerank's 4-5 GiB edge cache at sf10,
            # while the same query on a fresh session passes).
            gc.collect()
            recycle = int(os.environ.get("SPARK_GRAFT_RECYCLE", "25"))
            if i and i % recycle == 0:
                spark = _fresh_session(spark)
            t0 = time.perf_counter()
            try:
                Q.REGISTRY[name].fn(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                timings[name] = round(time.perf_counter() - t0, 2)
            except Exception as exc:  # noqa: BLE001 — sweep must finish
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                # A heap OOM kills the whole local JVM; without a
                # fresh session every later query would report a
                # phantom error (observed on the first sf10 sweep).
                # Rebuild and move on so one fatal query costs one
                # data point, not the sweep.
                if not _alive(spark):
                    spark = _fresh_session(spark)
            print(
                f"{name}: {timings.get(name, 'ERR')}",
                file=sys.stderr,
                flush=True,
            )
    except BaseException as exc:  # noqa: BLE001
        # A session rebuild can itself fail when a heap-dead JVM's
        # stop() times out and the old context lingers ("Only one
        # SparkContext per JVM", observed once at sf10) — the partial
        # timings are still the product of minutes-to-hours of sweep:
        # emit them before propagating instead of dying silently.
        errors["__aborted__"] = f"{type(exc).__name__}: {exc}"[:200]
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(names),
                    "partial": True,
                    "completed": len(timings) + len(errors) - 1,
                    "timings": timings,
                    "errors": errors,
                }
            )
        )
        raise

    flagged = {n: s for n, s in timings.items() if s > ceiling}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_queries": len(names),
                "total_sec": round(sum(timings.values()), 1),
                "slowest": dict(
                    sorted(timings.items(), key=lambda kv: -kv[1])[:15]
                ),
                "flagged_over_ceiling": flagged,
                "errors": errors,
            }
        )
    )
    spark.stop()
    return 1 if (flagged or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
