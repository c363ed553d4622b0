#!/usr/bin/env python
"""Executable walkthrough mirroring the reference's docs/1-9 story
(/root/reference/docs/*.md), section by section, on this engine.

The reference is a set of executable datafusion-cli transcripts; this
is the same narrative driven through sparkplans.  Run it:

    python examples/walkthrough.py [sf_dir]

Each section prints what the corresponding reference doc demonstrates.
Citations in comments are reference file:line.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkplans import plans
from sparkplans.engine import Engine
from sparkplans.session import EngineOptions, build_session


def section(n: int, title: str) -> None:
    print(f"\n{'=' * 72}\n{n}. {title}\n{'=' * 72}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    opts = EngineOptions(target_partitions=8, repartition_file_scans=False)
    spark = build_session(opts, app_name="walkthrough", master="local[8]")
    eng = Engine(spark=spark, options=opts)

    # ---- docs/1: information schema & settings -----------------------
    section(1, "information schema & settings  (docs/1_cli_information_schema.md)")
    eng.create_external_table("orders", f"{sf_dir}/orders.parquet")
    eng.create_external_table("lineitem", f"{sf_dir}/lineitem.parquet")
    print("tables:", [t["table_name"] for t in eng.catalog.show_tables()])
    print("columns(orders):", [c["column_name"] for c in eng.catalog.show_columns("orders")][:4], "...")
    st = eng.settings()
    print("settings sample: spark.sql.shuffle.partitions =", st.get("spark.sql.shuffle.partitions"))
    # SET key=value (docs/1:110-127)
    eng.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    # LIMIT 0 schema peek (docs/1:139-158)
    print("peek:", eng.catalog.peek_schema("orders").simpleString()[:70], "...")

    # ---- docs/2: creating tables (files, dirs, order, insert) --------
    section(2, "create tables: files, dirs, WITH ORDER, INSERT  (docs/2_cli_create_tables.md)")
    # csv with header (docs/2:11-14) — demonstrated over a temp export
    tmp_csv = "/tmp/walkthrough_region_csv"
    spark.read.parquet(f"{sf_dir}/region.parquet").coalesce(1).write.mode(
        "overwrite"
    ).option("header", True).csv(tmp_csv)
    eng.create_external_table("region_csv", tmp_csv, format="csv", has_header=True)
    print("region_csv rows:", eng.table("region_csv").df.count())
    # WITH ORDER on a parquet table (docs/2:17-23)
    eng.create_external_table(
        "orders_ord", f"{sf_dir}/orders.parquet", with_order=["o_orderkey"]
    )
    # in-memory table + INSERT INTO VALUES (docs/2:142-160)
    eng.create_table("mem_t", "k INT, v STRING")
    eng.insert_into("mem_t", [(1, "a"), (2, "b")])
    print("mem_t:", spark.table("mem_t").collect())

    # ---- docs/3: reading query plans ---------------------------------
    section(3, "plans: tree / indent / analyze / verbose  (docs/3_cli_query_plans.md)")
    df = eng.sql("SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus")
    print("-- tree (EXPLAIN):")
    print("\n".join(plans.plan_text(df, "tree").splitlines()[:8]))
    print("-- analyze (EXPLAIN ANALYZE, runtime metrics):")
    print("\n".join(plans.explain_analyze(df).splitlines()[:6]))

    # ---- docs/4: sort elision ----------------------------------------
    section(4, "sort elision: exact / prefix / non-prefix  (docs/4_cli_read_plans_sort_projection.md)")
    t = eng.table("orders_ord")
    for keys, label in [
        (("o_orderkey",), "exact/prefix -> elided"),
        (("o_custkey",), "non-prefix  -> sort kept"),
    ]:
        out = t.order_by(*keys)
        print(f"ORDER BY {keys}: sorts in plan = {plans.num_sorts(out.df)}  ({label})")

    # ---- docs/5: filter + repartition + pushdown ---------------------
    section(5, "filters, pushdown, parallelism  (docs/5_cli_read_plans_filter_repartition_coalesce.md)")
    f = eng.sql("SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'")
    print("pushed filters:", plans.scan_pushed_filters(f))
    print("read schema:", plans.scan_read_schema(f))

    # ---- docs/6: ordered merge of sorted partitions ------------------
    section(6, "sort-preserving merge  (docs/6_cli_read_plans_sortpreservingmerge.md)")
    ordered = t.order_by("o_orderkey")  # 1 file here -> no sort at all
    got = [r.o_orderkey for r in ordered.df.select("o_orderkey").limit(5).collect()]
    print("first keys in order:", got, "| sorts:", plans.num_sorts(ordered.df))

    # ---- docs/7: aggregation strategies ------------------------------
    section(7, "two-phase aggregation  (docs/7_cli_read_plans_aggregation.md)")
    agg = eng.sql("SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus")
    txt = plans.physical_plan_str(agg)
    print("HashAggregate stages:", txt.count("HashAggregate"), "| exchanges:", plans.num_exchanges(agg))

    # ---- docs/8: join strategies -------------------------------------
    section(8, "joins: broadcast (CollectLeft) and merge  (docs/8_cli_read_plans_join.md)")
    j = eng.sql(
        "SELECT l.l_orderkey, o.o_orderstatus FROM lineitem l, orders o "
        "WHERE l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'"
    )
    print("join strategies:", plans.join_strategies(j))
    # the reference's future work (docs/8:199-202): merge + shuffled hash
    print("(merge/shuffle_hash variants: queries/merge_join, queries/shuffle_hash_join)")

    # ---- docs/9: what's next -> what we already do -------------------
    section(9, "beyond  (docs/9_what_next.md)")
    print(
        "distributed plans: free in Spark (every Exchange is a node\n"
        "boundary); partitioned hash join: hint('shuffle_hash') or\n"
        "bucketed tables (tests/test_bucketing.py); plus the\n"
        "training-data pipeline operators in sparkplans/operators/."
    )

    # ---- 10: the training-data pipeline on the same engine -----------
    section(10, "training-data pipeline (beyond the reference)")
    import sparkplans.queries as Q

    cur = Q.REGISTRY["curation_pipeline"].fn(spark, sf_dir)
    print("curation (dedup -> quality gate -> token budget):")
    for r in sorted(cur.collect(), key=lambda r: r.lang):
        print(f"  {r.lang}: {r.n_docs} docs, {r.total_bpe_tokens} bpe tokens")
    dups = Q.REGISTRY["near_dup_pairs"].fn(spark, sf_dir).count()
    knn = Q.REGISTRY["knn_brute_force"].fn(spark, sf_dir)
    top = knn.collect()[0]
    print(f"minhash-LSH near-dup pairs: {dups}")
    print(f"knn top hit for probe 0: vec {top.vec_id} (cos {top.cos_sim})")
    print("(scale paths: IVF + bucketed layout, z-order writes, AQE skew —")
    print(" see COVERAGE.md and tests/)")

    # ---- 11: SQL function surface + plan audit -----------------------
    section(11, "SQL UDF macros & structural plan audit")
    from sparkplans.functions import register_sql_functions

    names = register_sql_functions(spark)
    print("registered SQL functions:", names)
    spark.sql(f"SELECT * FROM parquet.`{sf_dir}/documents.parquet`").createOrReplaceTempView("docs_w")
    row = spark.sql(
        "SELECT token_count(text) tc, quality_score(text) q FROM docs_w LIMIT 1"
    ).first()
    print(f"token_count/quality_score via SQL: {row.tc} tokens, q={row.q}")
    audit = plans.audit(Q.REGISTRY["flagship_datebin"].fn(spark, sf_dir))
    print("flagship audit:", {k: v for k, v in audit.items() if k != "pushed_filters"})

    # ---- 12: corpus curation, end to end ------------------------------
    section(12, "corpus curation: decontaminate, score, pack")
    contaminated = Q.REGISTRY["decontamination_ngrams"].fn(spark, sf_dir)
    n_cont = contaminated.count()
    print(f"test docs sharing a token 8-gram with train: {n_cont}")
    lp = Q.REGISTRY["unigram_logprob_scores"].fn(spark, sf_dir)
    worst = lp.orderBy("avg_logprob").first()
    print(
        f"lowest unigram-LM score: doc {worst.doc_id} "
        f"(avg logprob {worst.avg_logprob})"
    )
    packed = Q.REGISTRY["sequence_packing"].fn(spark, sf_dir)
    print(f"2048-token training sequences packed: {packed.count()}")
    hist = plans.partition_histogram(
        Q.REGISTRY["dedup_exact"].fn(spark, sf_dir)
    )
    print(f"dedup output balance: skew={hist['skew']} over {hist['partitions']} partitions")

    # ---- 13: table health: profile, gate, diff, graph -----------------
    section(13, "table health: profile, quality gate, snapshot diff, graph")
    from sparkplans.operators import expectations as X
    from sparkplans.operators.profile import profile

    prof = profile(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        columns=["o_orderkey", "o_totalprice"],
    )
    for r in prof.collect():
        print(
            f"profile {r.column}: {r.n_rows} rows, {r.n_nulls} nulls, "
            f"~{r.n_distinct} distinct"
        )
    gate = Q.REGISTRY["orders_quality_gate"].fn(spark, sf_dir)
    print(
        "quality gate:",
        {r.check_name: bool(r.passed) for r in gate.collect()},
    )
    diff = Q.REGISTRY["orders_snapshot_diff"].fn(spark, sf_dir)
    by_type = {
        r.change_type: r.cnt
        for r in diff.groupBy("change_type").agg(F.count("*").alias("cnt")).collect()
    }
    print("snapshot diff change counts:", by_type)
    tri = Q.REGISTRY["copurchase_triangles"].fn(spark, sf_dir).first()
    print(f"co-purchase graph: {tri.n_edges} edges, {tri.n_triangles} triangles")

    # ---- 14: the ANN index family ------------------------------------
    section(14, "ANN family: brute / LSH / IVF / SQ8 / PQ recall@10")
    from sparkplans.operators import similarity as S
    from sparkplans.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0),
            lambda a, x: a + x * x,
        )
    )
    nemb = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x / nrm
        ).alias("embedding"),
    ).localCheckpoint()
    probes = nemb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )
    exact = {
        (r.probe_id, r.vec_id)
        for r in S.brute_force_topk(nemb, probes, k=10).collect()
    }

    def recall(rows) -> float:
        got = {(r.probe_id, r.vec_id) for r in rows}
        return round(len(exact & got) / len(exact), 2)

    print("brute force: recall 1.0 (exact baseline), zero corpus shuffle")
    lsh = S.lsh_bucket_topk(nemb, probes, k=10, num_planes=6).collect()
    print(f"LSH buckets (6 planes): recall {recall(lsh)} — bucket-local scoring")
    assigned, cents = S.ivf_build(nemb, num_centroids=8, iters=1)
    ivf = S.ivf_topk(assigned, cents, probes, k=10, nprobe=2).collect()
    print(f"IVF (8 cells, nprobe 2): recall {recall(ivf)} — cluster-pruned scan")
    q = S.sq_quantize(nemb).localCheckpoint()
    sq_probes = q.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        F.col("qvec_recon").alias("probe_qvec_recon"),
    )
    sq = S.sq_topk(q, sq_probes, k=10).collect()
    print(f"SQ8 (1 byte/dim): recall {recall(sq)} — 4x scan-bandwidth saving")
    coded, books = S.pq_build(nemb, num_sub=16, k=16, iters=1)
    pq = S.pq_topk(coded.localCheckpoint(), books, probes, k=10).collect()
    print(f"PQ-ADC (16x16 codebooks): recall {recall(pq)} — codes-only corpus scan")

    # ---- 15: versioned tables ----------------------------------------
    section(15, "versioned tables: tx log, time travel, MERGE, compact")
    import shutil
    import tempfile

    from sparkplans.table import VersionedTable

    root = tempfile.mkdtemp(prefix="walkthrough_vt_")
    try:
        nation = load_table(spark, sf_dir, "nation")
        t = VersionedTable(spark, root)
        t.append(nation)
        t.append(nation.limit(5))
        print("after 2 appends:", t.read().count(), "rows,",
              [e["op"] for e in t.history()])
        patched = nation.limit(2).withColumn("n_name", F.lit("MERGED"))
        v = t.merge(patched, key="n_nationkey")
        n_patched = t.read().filter("n_name = 'MERGED'").count()
        n_prev = t.read(version=v - 1).count()
        print(f"merge -> v{v}: {n_patched} patched rows; "
              f"v{v - 1} still reads {n_prev} rows (time travel)")
        t.compact(target_files=1)
        dead = t.vacuum(keep_versions=1)
        print(f"compact+vacuum: {len(dead)} dead files reclaimed, "
              f"{t.read().count()} rows intact")
    finally:
        shutil.rmtree(root, ignore_errors=True)

    section(16, "real media codecs + incremental dedup (beyond the reference)")
    import numpy as np

    from sparkplans.operators import dedup, jpeg, multimodal

    img = np.stack(np.mgrid[0:16, 0:24], axis=-1).astype("uint8")
    img = np.concatenate([img, img[..., :1]], axis=-1) * 7 % 256
    for name, enc in (("png", multimodal.encode_png),
                      ("bmp", multimodal.encode_bmp),
                      ("ppm", multimodal.encode_ppm)):
        assert (multimodal.decode_image(enc(img)) == img).all()
    jp = jpeg.encode_jpeg(img, quality=90, subsample=True)
    print("codecs: png/bmp/ppm bit-exact;",
          f"jpeg 4:2:0 {len(jp)} bytes, decoded shape",
          multimodal.decode_image(jp).shape)
    docs = load_table(spark, sf_dir, "documents")
    b1 = docs.filter("doc_id % 2 = 0")
    b2 = docs.filter("doc_id % 2 = 1")
    clean1, seen = dedup.incremental_exact_dedup(b1, None)
    seen = seen.localCheckpoint()
    clean2, seen2 = dedup.incremental_exact_dedup(b2, seen)
    print(f"incremental dedup: batch1 kept {clean1.count()}, "
          f"batch2 kept {clean2.count()}, index {seen2.count()} fingerprints")

    # ---- 17: ExactSubstr spans, cluster reps, hard negatives, CBO ----
    section(17, "span dedup, cluster election, hard negatives, CBO stats")
    spans = dedup.remove_repeated_spans(docs, k=6)
    cut = spans.agg(F.sum("n_removed"), F.sum("n_tokens")).collect()[0]
    print(f"ExactSubstr: {cut[0]}/{cut[1]} tokens inside repeated "
          "6-word spans removed (first occurrence kept)")
    import sparkplans.queries as Q
    reps = Q.REGISTRY["cluster_representatives"].fn(spark, sf_dir)
    print("cluster representatives (longest member wins):",
          reps.count(), "near-dup clusters")
    hn = Q.REGISTRY["hard_negatives_per_probe"].fn(spark, sf_dir)
    print("hard negatives:", hn.count(),
          "probe -> closest other-label vector pairs")
    # CBO: stats flip a 3-table join into the selective-dim-first tree
    load_table(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable("wt_o")
    load_table(spark, sf_dir, "customer").write.mode("overwrite").saveAsTable("wt_c")
    load_table(spark, sf_dir, "lineitem").write.mode("overwrite").saveAsTable("wt_li")
    for t in ("wt_o", "wt_c", "wt_li"):
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    plan = spark.sql(
        "SELECT count(*) FROM wt_li l "
        "JOIN wt_o o ON l.l_orderkey = o.o_orderkey "
        "JOIN wt_c c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_mktsegment = 'BUILDING'"
    )._jdf.queryExecution().optimizedPlan().toString()
    reordered = plan.index("wt_c") < plan.index("wt_li")
    print("CBO join reorder moved the selective customer dim "
          f"innermost: {reordered}")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    for t in ("wt_o", "wt_c", "wt_li"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    section(18, "bloom prefilter, count-min sketch, schema evolution")
    from sparkplans.operators.bloom import bloom_build, bloom_fp_rate, bloom_member
    from sparkplans.operators.sketches import cms_build, cms_estimate

    docs = load_table(spark, sf_dir, "documents")
    from sparkplans.functions.text import doc_fingerprint

    fps = docs.select(doc_fingerprint("text").alias("fp"))
    seen = fps.filter(F.crc32("fp") % 2 == 0).distinct()
    words = bloom_build(seen, "fp", num_bits=1 << 14)
    hits = fps.filter(bloom_member("fp", words)).count()
    print(f"bloom prefilter: {hits}/{fps.count()} fingerprints flagged "
          f"(analytic FP {bloom_fp_rate(seen.count(), 1 << 14, 5):.4f}); "
          "probe plan has 0 exchanges")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    )
    cms = cms_build(toks, "tok", depth=4, width=1024)
    top = toks.groupBy("tok").agg(F.count("*").alias("cnt")) \
        .orderBy(F.desc("cnt")).limit(3)
    est = cms_estimate(top.select("tok"), "tok", cms, depth=4, width=1024)
    pairs = {r["tok"]: r for r in top.join(est, "tok").collect()}
    ok = all(r["cms_estimate"] >= r["cnt"] for r in pairs.values())
    print(f"count-min sketch: top-3 token estimates dominate exact: {ok}")
    root = tempfile.mkdtemp(prefix="walkthrough_evo_")
    try:
        t = VersionedTable(spark, root)
        t.append(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
        t.append(load_table(spark, sf_dir, "nation").limit(2)
                 .select("n_nationkey", "n_name", F.lit("v2").alias("note")))
        nulls = t.read().filter(F.col("note").isNull()).count()
        print(f"schema evolution: added 'note' column; {nulls} "
              "pre-evolution rows null-filled; time travel keeps old schema:",
              t.read(version=0).columns)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    section(19, "SQL DML on versioned tables; key-skew diagnostic")
    eng = Engine(spark=spark)
    root = tempfile.mkdtemp(prefix="walkthrough_dml_")
    try:
        vt = eng.create_versioned_table("wt_vt", root)
        vt.append(load_table(spark, sf_dir, "nation"))
        eng.table_at("wt_vt")
        eng.sql("DELETE FROM wt_vt WHERE n_regionkey = 4")
        eng.sql("UPDATE wt_vt SET n_name = lower(n_name) "
                "WHERE n_regionkey = 1")
        now = eng.sql("SELECT count(*) AS c FROM wt_vt").collect()[0]["c"]
        v0 = eng.sql(
            "SELECT count(*) AS c FROM wt_vt VERSION AS OF 0"
        ).collect()[0]["c"]
        print(f"SQL DML: DELETE+UPDATE -> {now} rows now, "
              f"{v0} at VERSION AS OF 0 (time travel intact)")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    from sparkplans.operators.skew import skew_report

    rep = skew_report(
        load_table(spark, sf_dir, "events"), "user_id"
    ).collect()[0]
    print(f"key-skew report on events.user_id: {rep['n_rows']} rows / "
          f"{rep['n_keys']} keys, top share {rep['top_share']}, "
          f"{rep['hot_keys_100x']} keys over 100x mean -> salting "
          f"{'recommended' if rep['hot_keys_100x'] else 'not needed'}")

    spark.stop()


if __name__ == "__main__":
    main()
