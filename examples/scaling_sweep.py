#!/usr/bin/env python
"""Measured scaling curve: run a representative query slate at every
available scale factor and fit the growth exponent.

The 100 TB design claims in SCALE.md are structural (bounded shuffles,
pushdown, broadcast-only dims).  This script adds the *measured*
complement at the scales available in this container::

    python examples/scaling_sweep.py            # sf0.001, sf0.01, sf0.1

For each query it reports wall-clock per SF and the fitted exponent
``b`` of ``t = a * rows^b`` over the top decade (sf0.01 -> sf0.1,
where data cost dominates Spark's fixed per-job overhead).  ``b <= ~1``
means the plan's cost grows at most linearly in the data — the
property that lets a 1000-executor cluster absorb 100 TB by adding
machines.  ``b >> 1`` would flag a super-linear stage (an all-pairs
join, an unbounded window) that no amount of hardware rescues.

Output: one JSON line per query plus a markdown table suitable for
pasting into SCALE.md.  Timings are min-of-2 on a warmed session, so
codegen/JIT warmup is excluded.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

# A slate that exercises every cost family: scan+agg, shuffle join,
# window, dedup fingerprint, LSH banding, ANN brute force, text agg.
SLATE = [
    "pricing_summary",        # two-phase agg over lineitem (largest table)
    "tpch_q3_topk_revenue",   # 3-way join + top-k
    "merge_join",             # sort-merge join, both sides shuffle
    "window_rank",            # partitioned window
    "flagship_datebin",       # date_bin rollup + broadcast dim
    "dedup_exact",            # fingerprint groupBy on documents
    "lsh_candidates",         # MinHash banding self-join
    "knn_brute_force",        # ANN brute-force top-k over embeddings
    "heavy_hitters_tokens",   # explode + agg + TakeOrdered
    "pca_whitening",          # distributed moments + eigh + matmul UDF
    "leakage_safe_split",     # content-hash split, distinct-agg groupBy
]

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# locally-generated larger SFs (examples/generate_sf.py) extend the
# curve into the data-dominated regime; included when present
EXTRA_SF_DIRS = [
    os.path.join(repo, ".localdata", "sf1"),
    os.path.join(repo, ".localdata", "sf3"),
    os.path.join(repo, ".localdata", "sf10"),
]


def main() -> int:
    from sparkplans.session import EngineOptions, build_session
    import sparkplans.queries as Q

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = build_session(
        EngineOptions(
            target_partitions=cpus,
            extra_conf={
                "spark.driver.memory": os.environ.get(
                    "SPARK_GRAFT_DRIVER_MEM", "16g"
                )
            },
        ),
        app_name="sparkplans-scaling-sweep",
        master=f"local[{cpus}]",
    )

    sf_dirs = [d for d in SF_DIRS + EXTRA_SF_DIRS if os.path.isdir(d)]
    # rows in lineitem per SF — the x-axis for the fit
    rows = {
        d: spark.read.parquet(os.path.join(d, "lineitem.parquet")).count()
        for d in sf_dirs
    }

    # warm: one trivial action per SF so parquet footers are cached
    for d in sf_dirs:
        Q.REGISTRY["agg_count_star"].fn(spark, d).write.format("noop").mode(
            "overwrite"
        ).save()

    results = []
    for name in SLATE:
        fn = Q.REGISTRY[name].fn
        timings = {}
        for d in sf_dirs:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[d] = round(best, 3)
        # growth exponent over the top decade (fixed overhead dominates
        # the bottom decade at these tiny SFs)
        d1, d2 = sf_dirs[-2], sf_dirs[-1]
        b = math.log(timings[d2] / timings[d1]) / math.log(rows[d2] / rows[d1])
        rec = {
            "query": name,
            "sec": {os.path.basename(d): timings[d] for d in sf_dirs},
            "exponent_top_decade": round(b, 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print("\n| query | " + " | ".join(os.path.basename(d) for d in sf_dirs)
          + " | exponent |")
    print("|---|" + "---|" * (len(sf_dirs) + 1))
    for r in results:
        cells = " | ".join(f"{r['sec'][os.path.basename(d)]:.2f}s" for d in sf_dirs)
        print(f"| {r['query']} | {cells} | {r['exponent_top_decade']} |")

    worst = max(results, key=lambda r: r["exponent_top_decade"])
    print(
        f"\nworst exponent: {worst['query']} b={worst['exponent_top_decade']}"
        " (b<=1 ~ linear; sub-linear means fixed overhead still dominates)"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
