#!/usr/bin/env python
"""Streaming at scale — throughput, state, and exactness of the
Structured Streaming surface over a real event/document corpus::

    python examples/streaming_scale.py [sf_dir] [files_per_trigger]

Batch SCALE.md evidence answers "does the plan survive big data";
this script answers the streaming versions of the same questions,
measured (not argued) at any SF:

1. **windowed_counts** — watermarked tumbling-window aggregation over
   the events stream (each parquet part file is a micro-batch unit).
   Reports rows/s and aggregation state rows, and asserts EXACTNESS:
   every window the stream emits must equal the batch date_bin
   aggregation bit-for-bit (append mode may hold back the tail
   windows the watermark has not passed — that count is reported,
   everything emitted must match).
2. **sessionize** — per-user inactivity sessions via
   applyInPandasWithState (python workers hold the keyed state).
   Reports rows/s, emitted sessions, and state rows; asserts the
   conservation invariant sum(n_events) <= input rows.
3. **dedup_ingest_sink** — the production ingest shape: exact dedup
   of a document stream against a persisted fingerprint index with
   exactly-once batch+index commits.  Asserts the end state equals
   the batch truth: corpus rows == countDistinct(fingerprint) over
   the full input, and index rows == corpus rows.

Prints ONE JSON line with per-pipeline wall seconds, input rows,
rows/s, micro-batches, state rows, and the equality verdicts.
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


def _drain(q, timeout_s: float = 3600.0) -> dict:
    """Block until an availableNow query finishes; collect progress."""
    t0 = time.time()
    while q.isActive:
        if time.time() - t0 > timeout_s:
            q.stop()
            raise TimeoutError("stream did not drain in time")
        time.sleep(0.5)
    q.awaitTermination()
    n_rows = 0
    n_batches = 0
    state_rows = 0
    for p in q.recentProgress:
        n_rows += int(p["numInputRows"])
        if int(p["numInputRows"]) or p.get("stateOperators"):
            n_batches += 1
        for so in p.get("stateOperators") or []:
            state_rows = max(state_rows, int(so.get("numRowsTotal", 0)))
    return {"rows": n_rows, "batches": n_batches, "state_rows": state_rows}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    fpt = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from sparkplans import streaming
    from sparkplans.session import EngineOptions, build_session
    from sparkplans.sources import load_table

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
        app_name="sparkplans-streaming-scale",
        master=f"local[{cpus}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir, "files_per_trigger": fpt, "pipelines": {}}
    work = tempfile.mkdtemp(prefix="sparkplans_streamscale_")

    def _stage(table: str) -> str:
        # FileStreamSource needs a DIRECTORY of files, and it orders
        # them by MODIFICATION TIME, not name.  The generated tables'
        # part files are event-time-range partitioned by NAME but
        # carry arbitrary parallel-write mtimes, so streaming them
        # as-is ingests out of event-time order (measured: batch 0
        # contained the corpus tail, the watermark jumped to max-delay
        # after one batch, and most subsequent input raced it).  A
        # production log stream arrives roughly in time order, so the
        # stage COPIES the parts with sequential mtimes in name order
        # — modeling in-order arrival while leaving the source data
        # untouched.  Single-file tables (driver testdata) stage the
        # same way.
        p = f"{sf_dir}/{table}.parquet"
        d = os.path.join(work, f"{table}_stream")
        if os.path.isdir(d):
            return d
        os.makedirs(d)
        files = (
            sorted(
                f
                for f in os.listdir(p)
                if f.endswith(".parquet") or f.startswith("part-")
            )
            if os.path.isdir(p)
            else None
        )
        base = time.time() - 86400
        if files is None:
            dst = os.path.join(d, f"{table}.parquet")
            shutil.copyfile(p, dst)
            os.utime(dst, (base, base))
        else:
            for i, f in enumerate(files):
                dst = os.path.join(d, f)
                shutil.copyfile(os.path.join(p, f), dst)
                os.utime(dst, (base + i, base + i))
        return d

    # -- 1. windowed_counts ------------------------------------------------
    stream = streaming.stream_events(
        spark, _stage("events"), max_files_per_trigger=fpt
    )
    t0 = time.time()
    q = (
        streaming.windowed_counts(stream, window="5 minutes")
        .writeStream.format("memory")
        .queryName("ss_win")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    prog = _drain(q)
    wall = time.time() - t0
    got = {
        (r.bin, r.event_type): (r.cnt, round(r.sum_value, 6))
        for r in spark.table("ss_win").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.bin, r.event_type): (r.cnt, round(r.sum_value, 6))
        for r in ev.groupBy(
            F.window("ts", "5 minutes")["start"].alias("bin"), "event_type"
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    mismatch = sum(1 for k, v in got.items() if want.get(k) != v)
    out["pipelines"]["windowed_counts"] = {
        "wall_sec": round(wall, 1),
        "input_rows": prog["rows"],
        "rows_per_sec": round(prog["rows"] / wall),
        "micro_batches": prog["batches"],
        "state_rows": prog["state_rows"],
        "windows_emitted": len(got),
        "windows_batch_truth": len(want),
        "held_back_by_watermark": len(want) - len(got),
        "emitted_mismatches": mismatch,  # must be 0
    }

    # -- 2. sessionize (applyInPandasWithState) ---------------------------
    stream = streaming.stream_events(
        spark, _stage("events"), max_files_per_trigger=fpt
    )
    t0 = time.time()
    q = (
        streaming.sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("ss_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    prog = _drain(q)
    wall = time.time() - t0
    sess = spark.table("ss_sess").agg(
        F.count("*").alias("n"), F.sum("n_events").alias("ev")
    ).collect()[0]
    out["pipelines"]["sessionize"] = {
        "wall_sec": round(wall, 1),
        "input_rows": prog["rows"],
        "rows_per_sec": round(prog["rows"] / wall),
        "micro_batches": prog["batches"],
        "state_rows": prog["state_rows"],
        "sessions_emitted": int(sess["n"]),
        "events_conserved_ok": bool((sess["ev"] or 0) <= prog["rows"]),
    }

    # -- 3. dedup_ingest_sink (exactly-once corpus ingest) ----------------
    from sparkplans.functions.text import doc_fingerprint
    from sparkplans.table import VersionedTable

    docs_src = _stage("documents")
    doc_schema = spark.read.parquet(docs_src).select("doc_id", "text").schema
    root = os.path.join(work, "corpus_root")
    ckpt = os.path.join(work, "ckpt")
    stream_docs = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", str(fpt))
        .parquet(docs_src)
        .select("doc_id", "text")
    )
    n_docs = spark.read.parquet(docs_src).count()
    t0 = time.time()
    q = streaming.dedup_ingest_sink(stream_docs, root, ckpt).start()
    prog = _drain(q)
    wall = time.time() - t0
    # progress numInputRows double-counts here: the within-batch dedup
    # is a self-join (fp ⋈ groupBy(fp).min(id)), so the source scan
    # node fires twice per batch — report the true document count and
    # keep the raw metric visible as source_scan_rows
    prog["scan_rows"], prog["rows"] = prog["rows"], n_docs
    corpus_n = VersionedTable(spark, os.path.join(root, "corpus")).read().count()
    index_n = VersionedTable(spark, os.path.join(root, "fp_index")).read().count()
    truth = (
        spark.read.parquet(docs_src)
        .select(doc_fingerprint("text").alias("fp"))
        .agg(F.countDistinct("fp"))
        .collect()[0][0]
    )
    out["pipelines"]["dedup_ingest"] = {
        "wall_sec": round(wall, 1),
        "input_rows": prog["rows"],
        "source_scan_rows": prog["scan_rows"],
        "rows_per_sec": round(prog["rows"] / wall),
        "micro_batches": prog["batches"],
        "corpus_rows": int(corpus_n),
        "index_rows": int(index_n),
        "batch_truth_distinct_fp": int(truth),
        "exact_vs_batch_ok": bool(corpus_n == truth == index_n),
    }

    shutil.rmtree(work, ignore_errors=True)
    ok = (
        out["pipelines"]["windowed_counts"]["emitted_mismatches"] == 0
        and out["pipelines"]["sessionize"]["events_conserved_ok"]
        and out["pipelines"]["dedup_ingest"]["exact_vs_batch_ok"]
    )
    out["all_ok"] = ok
    print(json.dumps(out))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
