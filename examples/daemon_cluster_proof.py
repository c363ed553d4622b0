#!/usr/bin/env python
"""Standalone-daemon cluster proof — the last execution rung::

    python examples/daemon_cluster_proof.py [sf_dir] [names...]
    python examples/daemon_cluster_proof.py --kill-worker [sf_dir] [names...]

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


def _launch_runner(sf_dir: str, names: list[str]):
    """Asynchronous twin of cluster_proof.run_mode — returns (proc,
    out_path); the runner appends each finished query name to
    ``out_path + '.progress'`` so the chaos legs can time their kills
    mid-slate."""
    from cluster_proof import _RUNNER

    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        out_path = f.name
    proc = subprocess.Popen(
        [
            sys.executable, "-c", _RUNNER, REPO, MASTER_URL, sf_dir,
            out_path, json.dumps(names),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    return proc, out_path


def _progress_count(out_path: str) -> int:
    try:
        with open(out_path + ".progress") as f:
            return len(f.read().splitlines())
    except FileNotFoundError:
        return 0


def _wait_progress(proc, out_path: str, n: int, timeout_s: float) -> int:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        done = _progress_count(out_path)
        if done >= n:
            return done
        if proc.poll() is not None:
            raise RuntimeError(
                f"runner exited rc={proc.returncode} before progress {n}:\n"
                + (proc.stdout.read()[-3000:] if proc.stdout else "")
            )
        time.sleep(0.1)
    raise TimeoutError(f"progress did not reach {n} in {timeout_s}s")


def _executor_pids_under(worker_pid: int) -> list[int]:
    """PIDs of CoarseGrainedExecutorBackend JVMs whose process
    ancestry contains ``worker_pid`` (executors are forked by the
    worker daemon — that parentage IS the topology being tested)."""
    out = []
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        pid = int(d)
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "CoarseGrainedExecutorBackend" not in cmd:
            continue
        # walk ancestry
        p = pid
        for _ in range(10):
            try:
                with open(f"/proc/{p}/stat") as f:
                    p = int(f.read().split(")")[-1].split()[1])
            except (OSError, ValueError, IndexError):
                p = 0
            if p == worker_pid:
                out.append(pid)
                break
            if p <= 1:
                break
    return out


def kill_chaos_main() -> int:
    """Worker-daemon kill chaos (r5 verdict item 4) — completes the
    fault ladder executor_loss_proof.py started on local-cluster:

    1. CLEAN leg: the slate on the 2-worker daemon cluster with
       reliable (shared-store) checkpoints — the baseline signature.
    2. CHAOS leg: the same slate; mid-slate, one EXECUTOR JVM under
       worker 1 is kill -9'd (the worker notices, the master
       relaunches; in-flight tasks retry); later, still mid-slate,
       worker 1's whole PROCESS GROUP (daemon + its executors) is
       kill -9'd — node loss.  Lost shuffle blocks surface as
       FetchFailed and the affected map stages recompute on the
       surviving worker; lineage cuts are RELIABLE checkpoints in the
       shared store, so materialize() state survives executor death
       (executor-local localCheckpoint blocks would not — this leg is
       exactly why reliableCheckpoints exists).

    Gate: the chaos leg completes every query with hashes identical
    to the clean leg, the kills verifiably landed mid-slate, and the
    master reports exactly one surviving worker at teardown."""
    argv = [a for a in sys.argv[1:] if a != "--kill-worker"]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    names = argv[1:] or DEFAULT_SLATE
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

    work_root = tempfile.mkdtemp(prefix="sparkplans_daemonkill_")
    ckpt_dir = os.path.join(work_root, "shared-ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    procs = start_daemons(work_root)
    os.environ["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(
        {
            "spark.executor.memory": "10g",
            "spark.sparkplans.reliableCheckpoints": "true",
            "spark.sparkplans.checkpointDir": ckpt_dir,
            # surface executor/node loss fast so the gate is not
            # dominated by default 120s timeouts
            "spark.executor.heartbeatInterval": "2s",
            "spark.network.timeout": "30s",
            "spark.network.timeoutInterval": "15s",
        }
    )
    summary: dict = {"sf_dir": sf_dir, "slate": len(names)}
    try:
        clean = run_mode(MASTER_URL, sf_dir, names)

        t_chaos = time.time()
        proc, out_path = _launch_runner(sf_dir, names)
        # slate-aware kill points: executor kill early, node loss a
        # third of the way in — both strictly mid-slate for any slate
        exec_kill_after = max(1, len(names) // 8)
        worker_kill_after = max(exec_kill_after + 1, len(names) // 3)
        # phase 1: kill one executor JVM under worker 1, mid-slate
        _wait_progress(proc, out_path, exec_kill_after, 900)
        w1 = procs[2]
        ex = _executor_pids_under(w1.pid)
        if not ex:
            raise RuntimeError("no executor found under worker 1")
        os.kill(ex[0], signal.SIGKILL)
        summary["executor_killed_after_queries"] = _progress_count(out_path)
        # phase 2: node loss — kill worker 1's whole process group
        # (daemon + executors), still mid-slate
        _wait_progress(proc, out_path, worker_kill_after, 900)
        os.killpg(os.getpgid(w1.pid), signal.SIGKILL)
        summary["worker_killed_after_queries"] = _progress_count(out_path)

        rc = proc.wait(timeout=3600)
        tail = proc.stdout.read()[-3000:] if proc.stdout else ""
        if rc != 0:
            print(tail)
            raise RuntimeError(f"chaos runner failed rc={rc}")
        with open(out_path) as f:
            chaos = json.load(f)
        os.unlink(out_path)

        mismatches = [
            n
            for n in names
            if not (
                clean["queries"][n]["rows"] == chaos["queries"][n]["rows"]
                and clean["queries"][n]["cols"] == chaos["queries"][n]["cols"]
                and clean["queries"][n]["hash"] == chaos["queries"][n]["hash"]
            )
        ]
        st = _master_state() or {}
        alive = [
            w for w in st.get("workers", []) if w.get("state") == "ALIVE"
        ]
        summary.update(
            {
                "mismatches": mismatches,
                "queries_total": len(names),
                "queries_after_worker_kill": len(names)
                - summary["worker_killed_after_queries"],
                "workers_alive_after_kill": len(alive),
                "clean_wall_sec": clean["wall_sec"],
                "chaos_wall_sec": round(time.time() - t_chaos, 1),
            }
        )
        mid_slate = (
            exec_kill_after
            <= summary["worker_killed_after_queries"]
            < len(names)
        )
        ok = not mismatches and len(alive) == 1 and mid_slate
        summary["all_ok"] = ok
        print(json.dumps(summary))
        return 0 if ok else 1
    finally:
        os.environ.pop("SPARK_GRAFT_EXTRA_CONF", None)
        stop_daemons(procs)
        shutil.rmtree(work_root, ignore_errors=True)


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
    if "--kill-worker" in sys.argv:
        sys.exit(kill_chaos_main())
    sys.exit(main())
