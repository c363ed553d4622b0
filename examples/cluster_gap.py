#!/usr/bin/env python
"""Track the local vs local-cluster gap — the round-5 decomposition's
regression gate::

    python examples/cluster_gap.py [sf_dir] [names...]

Round 4 measured the full bench slate 1.19× slower on
`local-cluster[4,8,8192]` than `local[32]`; round 5 decomposed that
into per-primitive floors (SCALE.md "The 1.19× local-cluster gap"):
+28 ms scheduling, ~+100 ms RPC serialization, ~+150 ms loopback-TCP
shuffle, ~+137 ms broadcast-to-N-JVMs per job — real
process-boundary costs every physical cluster pays, amortized to <1%
on minutes-long production stages but 15-40% on sub-second bench
queries.  Knob attempts measured WORSE (locality.wait=0 and Kryo:
1.216×; compression-off over loopback: see round-6 numbers in
SCALE.md), so the floor is pinned instead of chased:

- this script measures the ratio on a fixed slate and prints one
  JSON line — the tracking artifact;
- `tests/test_local_cluster.py::test_cluster_gap_within_floor` gates
  the ratio at <= 2.0 on the compact slate: generous against machine
  noise (the measured floor is ~1.2×), tight enough to catch a real
  regression (a serialization bug, an accidental
  per-task-broadcast) which lands at 3-10×, not 1.3×.

Both legs run in subprocesses via cluster_proof.run_mode, so each
gets a fresh JVM and the comparison also re-verifies hash identity
across the process boundary (mismatches exit nonzero).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cluster_proof import run_mode  # noqa: E402

# compact slate: join + agg + window + python/Arrow + broadcast +
# bloom round trip — one representative per gap primitive
GAP_SLATE = [
    "pricing_summary",
    "broadcast_join_agg",
    "window_rank",
    "bloom_prefilter_dedup",
    "pca_whitening",
    "cms_token_counts",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or GAP_SLATE
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    cluster = os.environ.get(
        "SPARK_GRAFT_CLUSTER", f"local-cluster[2,{int(cpus) // 2},4096]"
    )
    local = run_mode(f"local[{cpus}]", sf_dir, names)
    clus = run_mode(cluster, sf_dir, names)

    mismatches = [
        n
        for n in names
        if not (
            local["queries"][n]["rows"] == clus["queries"][n]["rows"]
            and local["queries"][n]["hash"] == clus["queries"][n]["hash"]
        )
    ]
    # per-query sum, not wall: excludes session build (the gap under
    # test is per-job overhead, not JVM startup)
    t_local = sum(q["sec"] for q in local["queries"].values())
    t_clus = sum(q["sec"] for q in clus["queries"].values())
    out = {
        "sf_dir": sf_dir,
        "slate": len(names),
        "cluster": cluster,
        "local_query_sec": round(t_local, 2),
        "cluster_query_sec": round(t_clus, 2),
        "ratio": round(t_clus / max(t_local, 1e-9), 3),
        "mismatches": mismatches,
    }
    print(json.dumps(out))
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
