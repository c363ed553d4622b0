#!/usr/bin/env python
"""Standalone-daemon cluster proof — the last execution rung::

    python examples/daemon_cluster_proof.py [sf_dir] [names...]

``cluster_proof.py`` proves process boundaries with
``local-cluster[W,C,M]``, but that pseudo-cluster still shares the
driver's lifecycle: the master lives inside the driver JVM and the
workers are its children.  This script runs the engine against REAL
standalone daemons — a ``spark://`` Master process and two Worker
processes launched independently of any driver (the `sbin/
start-master.sh` topology, here driven programmatically via
``spark-class`` so the daemons are foreground children we can poll
and tear down deterministically).  What this adds over local-cluster:

- the driver discovers the cluster over the standalone RPC protocol
  (`spark://host:port`), exactly as `spark-submit --master spark://`
  would — app registration, executor allocation, heartbeats;
- workers outlive / predate the app: executors are launched by the
  WORKER daemon (fork from the worker's env, not the driver's), so
  env propagation (`PYSPARK_PYTHON`, `spark.executorEnv.PYTHONPATH`)
  is load-bearing, not inherited for free;
- ``spark.sparkplans.reliableCheckpoints=true`` routes materialize()
  lineage cuts through a SHARED filesystem store (the checkpoint dir
  doubles as the cluster's shared storage — the multi-node contract,
  where executor-local localCheckpoint blocks would be a
  correctness hazard on executor loss).

Three legs, all hash-compared (order-insensitive count/schema/value
signature) against a plain ``local[C]`` baseline run in its own
subprocess:

1. ``local[C]``   — single-JVM baseline;
2. ``spark://``   — the daemon cluster, default (local-checkpoint)
   materialize;
3. ``spark://`` + reliableCheckpoints into a shared dir.

Exit 0 = every query identical in all three + both workers
registered + the app's executors really came from the daemons.
Measured numbers and surprises belong in SCALE.md ("Standalone
daemons").
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cluster_proof import DEFAULT_SLATE, run_mode  # noqa: E402

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
MASTER_PORT = int(os.environ.get("SPARK_GRAFT_MASTER_PORT", "7077"))
MASTER_UI = int(os.environ.get("SPARK_GRAFT_MASTER_UI", "8089"))
MASTER_URL = f"spark://127.0.0.1:{MASTER_PORT}"


def _spawn(args: list[str], log_path: str, env: dict) -> subprocess.Popen:
    log = open(log_path, "w")
    return subprocess.Popen(
        args,
        stdout=log,
        stderr=subprocess.STDOUT,
        env=env,
        start_new_session=True,  # own process group -> clean teardown
    )


def _master_state() -> dict | None:
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{MASTER_UI}/json/", timeout=2
        ) as r:
            return json.load(r)
    except Exception:
        return None


def start_daemons(work_root: str) -> list[subprocess.Popen]:
    env = dict(os.environ)
    env.setdefault("SPARK_NO_DAEMONIZE", "1")
    # Executors are forked by the WORKER, so the python they use for
    # Arrow/pandas workers comes from the worker's env — set it here,
    # NOT on the driver (this is exactly the propagation local modes
    # hide).
    env["PYSPARK_PYTHON"] = sys.executable
    env.setdefault("SPARK_LOG_DIR", work_root)
    procs = [
        _spawn(
            [
                SPARK_CLASS,
                "org.apache.spark.deploy.master.Master",
                "--host", "127.0.0.1",
                "--port", str(MASTER_PORT),
                "--webui-port", str(MASTER_UI),
            ],
            os.path.join(work_root, "master.log"),
            env,
        )
    ]
    deadline = time.time() + 60
    while time.time() < deadline:
        if _master_state() is not None:
            break
        time.sleep(0.5)
    else:
        raise RuntimeError("master did not come up; see master.log")
    for i in range(2):
        wdir = os.path.join(work_root, f"worker{i}")
        os.makedirs(wdir, exist_ok=True)
        procs.append(
            _spawn(
                [
                    SPARK_CLASS,
                    "org.apache.spark.deploy.worker.Worker",
                    MASTER_URL,
                    "--cores", "8",
                    "--memory", "12g",
                    "--work-dir", wdir,
                    "--webui-port", str(MASTER_UI + 1 + i),
                ],
                os.path.join(work_root, f"worker{i}.log"),
                env,
            )
        )
    deadline = time.time() + 60
    while time.time() < deadline:
        st = _master_state() or {}
        alive = [w for w in st.get("workers", []) if w.get("state") == "ALIVE"]
        if len(alive) >= 2:
            return procs
        time.sleep(0.5)
    raise RuntimeError("workers did not register; see worker*.log")


def stop_daemons(procs: list[subprocess.Popen]) -> None:
    for p in reversed(procs):
        try:
            os.killpg(os.getpgid(p.pid), signal.SIGTERM)
        except ProcessLookupError:
            pass
    for p in procs:
        try:
            p.wait(timeout=20)
        except subprocess.TimeoutExpired:
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT_SLATE
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

    work_root = tempfile.mkdtemp(prefix="sparkplans_daemons_")
    ckpt_dir = os.path.join(work_root, "shared-ckpt")  # the "shared store"
    os.makedirs(ckpt_dir, exist_ok=True)

    local = run_mode(f"local[{os.environ['SPARK_GRAFT_CPUS']}]", sf_dir, names)

    procs = start_daemons(work_root)
    try:
        # standalone default executor memory is 1g — size it like the
        # local-cluster proofs (per-executor heap, 2 executors)
        os.environ["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(
            {"spark.executor.memory": "10g"}
        )
        daemon = run_mode(MASTER_URL, sf_dir, names)
        os.environ["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(
            {
                "spark.executor.memory": "10g",
                "spark.sparkplans.reliableCheckpoints": "true",
                "spark.sparkplans.checkpointDir": ckpt_dir,
            }
        )
        reliable = run_mode(MASTER_URL, sf_dir, names)
    finally:
        os.environ.pop("SPARK_GRAFT_EXTRA_CONF", None)
        st = _master_state() or {}
        stop_daemons(procs)

    mismatches = []
    for n in names:
        a = local["queries"][n]
        for tag, mode in (("daemon", daemon), ("reliable", reliable)):
            b = mode["queries"][n]
            if not (
                a["rows"] == b["rows"]
                and a["cols"] == b["cols"]
                and a["hash"] == b["hash"]
            ):
                mismatches.append(f"{n}:{tag}")
        print(
            f"{'ok  ' if not any(m.startswith(n + ':') for m in mismatches) else 'FAIL'}"
            f" {n}: rows={a['rows']} local={a['sec']}s"
            f" daemon={daemon['queries'][n]['sec']}s"
            f" reliable={reliable['queries'][n]['sec']}s",
            flush=True,
        )

    ck_files = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
    summary = {
        "sf_dir": sf_dir,
        "slate": len(names),
        "mismatches": mismatches,
        "master_url": MASTER_URL,
        "completed_apps": len(st.get("completedapps", [])),
        "workers_alive_at_teardown": len(
            [w for w in st.get("workers", []) if w.get("state") == "ALIVE"]
        ),
        "local_wall_sec": local["wall_sec"],
        "daemon_wall_sec": daemon["wall_sec"],
        "reliable_wall_sec": reliable["wall_sec"],
        "daemon_block_managers": daemon["block_managers"],
        "reliable_checkpoint_files": ck_files,
    }
    print(json.dumps(summary))
    shutil.rmtree(work_root, ignore_errors=True)
    # proof validity: 2 workers served the app, executors were real
    # (driver + 2 executor block managers), reliable leg actually
    # wrote checkpoints to the shared store
    if daemon["block_managers"] < 3:
        print("FAIL: daemon mode did not launch separate executors")
        return 1
    if ck_files == 0:
        print("FAIL: reliable leg wrote no checkpoint files")
        return 1
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
