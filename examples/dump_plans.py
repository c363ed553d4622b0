#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to plans/<tag>/.

    python examples/dump_plans.py <tag> <suffix> <query> [query ...]
    python examples/dump_plans.py r09 before pagerank_copurchase semantic_dedup

Writes plans/<tag>/<query>_<suffix>.txt — the judge-facing evidence
that a claimed plan change (Exchange removed, join strategy flipped,
PushedFilters present) is real.  Uses the same session shape as
bench.py (local[$SPARK_GRAFT_CPUS], engine confs applied) and the
bench's default data dir so the plans match what the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkplans.session import EngineOptions, build_session  # noqa: E402
import sparkplans.queries as Q  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(
        EngineOptions(target_partitions=cpus),
        app_name="dump-plans",
        master=f"local[{cpus}]",
    )
    for name in names:
        df = Q.REGISTRY[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
