"""Materialization policy for corpus-sized intermediate frames.

Several operators cut lineage on a frame that is re-read by multiple
consumers (the tokenized corpus behind ``bigram_lm_scores``, the
basket table in ``copurchase_rules``, SemDeDup's cluster assignment).
``DataFrame.localCheckpoint`` is the right default — one in-memory/
local-disk materialization, no distributed-FS round trip — but it is
**non-replicated executor-local state**: on a real cluster, losing an
executor after the checkpoint loses its partitions, and because the
lineage was truncated Spark cannot recompute them; the job fails with
a fetch failure.  At test scale (single JVM) the distinction is moot;
at 100 TB on preemptible nodes it is not.

:func:`materialize` routes between the two per session:

* default — ``localCheckpoint`` (fast path, accepted executor-loss
  risk; the right call for short-lived jobs on stable nodes);
* ``spark.sparkplans.reliableCheckpoints=true`` — ``checkpoint()`` to
  the configured checkpoint directory (HDFS/S3/… in production),
  which survives executor loss at the cost of a write+read of the
  frame through the reliable FS.

Set ``spark.sparkplans.checkpointDir`` (or call
``sc.setCheckpointDir``) to choose the location; if neither is set a
session-scoped temp dir is used so enabling the flag never throws.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

RELIABLE_FLAG = "spark.sparkplans.reliableCheckpoints"
DIR_KEY = "spark.sparkplans.checkpointDir"
STORAGE_KEY = "spark.sparkplans.materializeStorage"

# localCheckpoint's stock storage level keeps DESERIALIZED rows in
# the unified memory store; its unroll-size estimates are loose
# enough that a corpus-sized frame (25M tokenized rows at sf10) can
# OOM the executor heap before the spill path engages — observed:
# bigram_lm_scores killed a 16g local[32] JVM at sf10.  Serialized
# storage accounts exact bytes per batch and spills incrementally, so
# it is the safe default; `disk` removes the memory store from the
# equation entirely for one local write+read.
_LEVELS = {
    "memory_deser": StorageLevel.MEMORY_AND_DISK_DESER,
    "memory_ser": StorageLevel.MEMORY_AND_DISK,
    "disk": StorageLevel.DISK_ONLY,
}


def reliable_enabled(spark) -> bool:
    try:
        return spark.conf.get(RELIABLE_FLAG, "false").lower() == "true"
    except Exception:
        return False


def _ensure_checkpoint_dir(spark) -> None:
    sc = spark.sparkContext
    current = sc._jsc.sc().getCheckpointDir()
    configured = None
    try:
        configured = spark.conf.get(DIR_KEY, None)
    except Exception:
        pass
    if configured:
        # honor a (re)configured location even if a dir is already set
        # (Spark appends a UUID subdir, so test by prefix containment)
        if not current.isDefined() or configured.rstrip("/") not in str(current.get()):
            sc.setCheckpointDir(configured)
        return
    if not current.isDefined():
        sc.setCheckpointDir(os.path.join(tempfile.gettempdir(), "sparkplans-ckpt"))


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut lineage and materialize ``df`` once for multiple consumers.

    ``localCheckpoint(eager)`` by default — at the SERIALIZED
    memory+disk level (see ``_LEVELS``: exact byte accounting,
    incremental spill; ``spark.sparkplans.materializeStorage`` picks
    ``memory_ser`` (default) / ``disk`` / ``memory_deser``) — or a
    reliable ``checkpoint`` to distributed storage when
    ``spark.sparkplans.reliableCheckpoints`` is true (see module
    docstring for the trade)."""
    spark = df.sparkSession
    if reliable_enabled(spark):
        _ensure_checkpoint_dir(spark)
        return df.checkpoint(eager=eager)
    try:
        key = spark.conf.get(STORAGE_KEY, "memory_ser")
    except Exception:
        key = "memory_ser"
    level = _LEVELS.get((key or "memory_ser").lower(), _LEVELS["memory_ser"])
    return df.localCheckpoint(eager=eager, storageLevel=level)
