#!/usr/bin/env python
"""Top-of-curve SSJoin probe: measure ONE slice at a data-dominated
SF and extrapolate the full wall from the auto-resolved slice count::

    python examples/ssjoin_slice_probe.py [sf_dir] [threshold]

The exact prefix-filter SSJoin is output-bound at saturated SFs (sf30
measured 64.8e9 raw candidate rows), so a full run is a multi-hour
bill that proves nothing a single slice doesn't: every slice is the
same plan over a 1/K ownership partition of the pairs (owner =
xxhash64(larger id) % K), so per-slice wall × K bounds the full run
to first order.  This harness runs:

1. the ``slices='auto'`` decision aggregation (the measured
   candidate-volume upper bound + chosen K) — the 'probe';
2. exactly one slice via ``slice_range=(0, 1)`` — timed, results
   materialized to the scratch dir like any production slice.

Prints one JSON line with the probe wall, the slice wall, and the
extrapolated full-run wall.  SCALE.md pins these as the sf100 rung of
the SSJoin scale story; the numbers feed the regression gate there.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf100"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    from sparkplans.session import EngineOptions, build_session
    from sparkplans.operators import dedup
    from sparkplans.queries import _t_cpu

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    opts = EngineOptions(
        target_partitions=cpus,
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
            # zstd halves the candidate shuffle's disk footprint vs
            # lz4 (the sf10 sweep note); the probe should measure the
            # configuration a saturated run would actually use
            "spark.io.compression.codec": "zstd",
        },
    )
    spark = build_session(
        opts, app_name="ssjoin-slice-probe", master=f"local[{cpus}]"
    )

    docs = _t_cpu(spark, sf_dir, "documents")
    n_docs = docs.count()

    scratch = tempfile.mkdtemp(prefix="ssjoin_probe_")
    try:
        # Phase 1+2 in one call: slices='auto' runs the decision
        # aggregation, slice_range=(0,1) then executes only slice 0.
        t0 = time.perf_counter()
        part = dedup.prefix_filter_pairs(
            docs,
            threshold=threshold,
            slices="auto",
            slice_dir=scratch,
            slice_range=(0, 1),
        )
        n_pairs_slice0 = part.count()
        wall = time.perf_counter() - t0
        decision = dict(dedup.last_auto_decision or {})
        k = int(decision.get("slices", 1))
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "threshold": threshold,
                    "n_docs": n_docs,
                    "raw_candidate_rows": decision.get("raw_candidate_rows"),
                    "auto_slices": k,
                    "budget_bytes": decision.get("budget_bytes"),
                    "slice0_pairs": n_pairs_slice0,
                    # wall includes the decision aggregation + shingle
                    # ranking (paid once, shared by all slices) + one
                    # slice; the extrapolation charges the slice cost
                    # K times on top of the shared prologue.  We can't
                    # split prologue/slice post-hoc from one number,
                    # so report the conservative bound wall * K.
                    "probe_plus_slice0_sec": round(wall, 1),
                    "extrapolated_full_sec_ub": round(wall * k, 1),
                }
            )
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
