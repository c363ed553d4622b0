#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}``.

Each query executes fully via the noop sink (no driver-side collect
bottleneck — results are materialized and discarded executor-side,
which is how a cluster job would behave).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkplans.session import EngineOptions, build_session  # noqa: E402
import sparkplans.queries as Q  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "tpch_q3_topk_revenue",
    "tpch_q5_local_supplier",
    "flagship_datebin",
    "datebin_5min_counts",
    "broadcast_join_agg",
    "merge_join",
    "window_rank",
    "distinct_agg",
    "dedup_exact",
    "text_stats",
    "knn_brute_force",
    "bpe_token_counts",
    "lsh_candidates",
    "asof_join_events",
    "curation_pipeline",
    "heavy_hitters_tokens",
    "sliding_window_counts",
    "tfidf_top_terms",
    "decontamination_ngrams",
    "orders_profile",
    "orders_quality_gate",
    "orders_snapshot_diff",
    "lineitem_corr_matrix",
    "daily_volume_anomalies",
    "ohlc_daily_bars",
    "weighted_median_price",
    "copurchase_rules",
    "rrf_hybrid_retrieval",
    "sq_ann_topk",
    "activity_streaks",
    "segment_dedup",
    "stratified_split",
    "curation_pipeline_v2",
    "incremental_dedup_batch",
    "substring_dedup_docs",
    "semantic_dedup",
    "dsir_importance_weights",
    "quality_classifier_scores",
    "bigram_lm_scores",
    "roc_auc_cosine",
    "bloom_prefilter_dedup",
    "cms_token_counts",
    "equi_depth_bins",
    "target_encoding_loo",
    "video_shot_boundaries",
    "ffd_sequence_packing",
    "mixture_epoch_sample",
    "pca_whitening",
    "feature_drift_psi",
    "leakage_safe_split",
    # round-3 scale-fix regression sentinels: each of these had a
    # super-linear plan at sf3 (single-task grid explode, LSH bucket
    # straggler, 324M-pair norm recompute) — keeping them in the
    # headline slate pins the fixed plans at every future bench run
    "gap_fill_locf",
    "gap_fill_linear",
    "embedding_near_dups",
    "semantic_decontamination",
    "ssjoin_near_dups",
    # round-3 additions: no-equi-key bucketed range joins + survival
    "campaign_window_counts",
    "campaign_incident_overlap",
    "kaplan_meier_conversion",
    # round-3 eval-metric family: retrieval nDCG (salted two-phase
    # top-k), calibration table, categorical MI, Zipf corpus fit
    "ndcg_at_k",
    "calibration_bins",
    "mutual_information_features",
    "zipf_fit_tokens",
    # round-5: the canonical TPC-H suite (queries/tpch.py) — q1/q3/q5
    # have been headliners since round 1 (pricing_summary and the two
    # tpch_* entries above); these complete all 22
    "tpch22_q2_min_cost_supplier",
    "tpch22_q4_order_priority",
    "tpch22_q6_forecast_revenue",
    "tpch22_q7_volume_shipping",
    "tpch22_q8_market_share",
    "tpch22_q9_product_profit",
    "tpch22_q10_returned_items",
    "tpch22_q11_important_stock",
    "tpch22_q12_shipmode_priority",
    "tpch22_q13_customer_distribution",
    "tpch22_q14_promo_effect",
    "tpch22_q15_top_supplier",
    "tpch22_q16_parts_supplier",
    "tpch22_q17_small_quantity",
    "tpch22_q18_large_volume_customer",
    "tpch22_q19_discounted_revenue",
    "tpch22_q20_part_promotion",
    "tpch22_q21_suppliers_waiting",
    "tpch22_q22_global_sales",
    # round-6: planted-skew salted join (the AQE-skew twin), the
    # newly value-oracled iterative PageRank, and the t-digest
    # mergeable quantile sketch
    "skewed_join_salted",
    "pagerank_copurchase",
    "tdigest_price_quantiles",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # Quiet-bench protocol: record the 1-min load average around the
    # run so a reader can attribute round-over-round deltas to machine
    # noise vs real regressions (BENCH_r03's driver run was taken at
    # ambient load and read 27% slower than a quiet re-run of the
    # identical slate).  min-of-3 below already filters transient
    # spikes within a query; the load field exposes sustained ones.
    try:
        load_start = round(os.getloadavg()[0], 2)
    except OSError:
        load_start = None

    # SPARK_GRAFT_MASTER overrides the single-JVM default — e.g.
    # "local-cluster[4,8,4096]" benches the same slate across real
    # executor JVM + python-worker process boundaries (SCALE.md
    # "Multi-process execution").  Worker JVMs do not inherit the
    # driver's sys.path, so the repo root must ride executorEnv.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    extra = (
        {"spark.executorEnv.PYTHONPATH": os.path.dirname(os.path.abspath(__file__))}
        if master.startswith("local-cluster")
        else {}
    )
    # SPARK_GRAFT_EXTRA_CONF (JSON) — same hook as cluster_proof's
    # runner: lets gap-profiling runs add per-run conf (locality wait,
    # serializer) without editing the bench
    extra.update(json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}")))
    opts = EngineOptions(target_partitions=cpus, extra_conf=extra)
    spark = build_session(opts, app_name="sparkplans-bench", master=master)

    # Warm the JVM + parquet footers once with a trivial action so the
    # per-query timings measure query execution, not session warmup.
    Q.REGISTRY["agg_count_star"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = Q.REGISTRY[name].fn
        # min of 3 runs: steady-state throughput, not JVM codegen
        # warmup or GC noise (run-to-run variance measured ~25%)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    try:
        load_end = round(os.getloadavg()[0], 2)
    except OSError:
        load_end = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # ambient 1-min load average before the session started
                # and after the slate finished (the during-run value is
                # dominated by the bench's own 32 threads); reps is the
                # min-of-N count each per-query number survived
                "load": {"start_1m": load_start, "end_1m": load_end},
                "reps": 3,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
