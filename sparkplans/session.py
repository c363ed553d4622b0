"""Session facade: map the reference engine's knobs onto Spark conf.

The reference exposes configuration as first-class queryable state
(``docs/1_cli_information_schema.md:69-127``: ``SET key=value``,
``information_schema.df_settings``) and steers physical plans through
knobs like ``target_partitions``, ``repartition_joins``,
``prefer_existing_sort`` (``tests/opt_parallel_execution.rs:17-23``).

Spark equivalents are set here once, at session build time, plus a
small dict of *engine-level* flags that our own planning layer (not
Catalyst) consults — e.g. ``prefer_existing_sort`` drives sort
elision in :mod:`sparkplans.engine`.

Scale note: these defaults are written for a real cluster.  AQE is on
(runtime re-planning, skew-join splitting, partition coalescing),
shuffle partitions default to the parallelism target, and broadcast
thresholds stay at Spark defaults so small dimension tables broadcast
automatically.  Tests run the same code on ``local[N]``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, asdict
from typing import Any

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return os.cpu_count() or 8


@dataclass
class EngineOptions:
    """Engine knobs, mirroring the reference's session config surface.

    ============================  =====================================
    reference knob                 mapping
    ============================  =====================================
    ``target_partitions``          ``spark.sql.shuffle.partitions`` +
                                   ``spark.default.parallelism``
    ``batch_size``                 ``spark.sql.parquet.columnarReaderBatchSize``
    ``repartition_joins``          engine flag (join planning) + AQE
    ``repartition_aggregations``   engine flag + AQE coalescing
    ``repartition_file_scans``     ``spark.sql.files.maxPartitionBytes``
                                   split behaviour (off -> huge split)
    ``prefer_existing_sort``       engine flag: sort-elision layer
    ``collect_statistics``         CBO: ``spark.sql.cbo.enabled``
    ============================  =====================================
    """

    target_partitions: int = field(default_factory=_default_parallelism)
    batch_size: int = 8192
    repartition_joins: bool = True
    repartition_aggregations: bool = True
    repartition_file_scans: bool = True
    prefer_existing_sort: bool = True
    collect_statistics: bool = True
    # Spark-specific extras
    session_timezone: str = "UTC"
    adaptive: bool = True
    # Route corpus-sized lineage cuts (see sparkplans/materialize.py)
    # to reliable checkpoint storage instead of executor-local
    # localCheckpoint — survives executor loss on a real cluster at
    # the cost of a distributed-FS write+read per materialization.
    reliable_checkpoints: bool = False
    checkpoint_dir: str | None = None
    extra_conf: dict[str, str] = field(default_factory=dict)

    def to_spark_conf(self) -> dict[str, str]:
        conf = {
            "spark.sql.shuffle.partitions": str(self.target_partitions),
            "spark.default.parallelism": str(self.target_partitions),
            "spark.sql.parquet.columnarReaderBatchSize": str(self.batch_size),
            "spark.sql.session.timeZone": self.session_timezone,
            "spark.sql.adaptive.enabled": str(self.adaptive).lower(),
            "spark.sql.adaptive.coalescePartitions.enabled": str(self.adaptive).lower(),
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.cbo.enabled": str(self.collect_statistics).lower(),
            # Runtime filters = the reference's DynamicFilterPhysicalExpr
            # (docs/8_cli_read_plans_join.md:126,178): build-side join keys
            # prune the probe-side scan at runtime.
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
            # Allow the planner to pick shuffled-hash join when its size
            # conditions hold (guide §3.1: no sort, often faster than
            # sort-merge when one side is moderately small per
            # partition).  Measured round 9: the many-to-many
            # co-purchase self-join runs 4.5x faster as SHJ than SMJ
            # (group buffering), and mid-plan joins whose inputs follow
            # a checkpoint (no stats -> no broadcast) stop paying two
            # sorts.  The planner's own guard (build side under
            # autoBroadcastJoinThreshold x shuffle partitions, and 3x
            # smaller than probe) keeps the build per partition
            # bounded, so this is scale-safe: joins too big for the
            # guard still get sort-merge.  Explicit hints (merge_join)
            # still win over this preference.
            "spark.sql.join.preferSortMergeJoin": "false",
            # Let AQE convert a planned sort-merge join to shuffled
            # hash at runtime when every post-shuffle partition is
            # small (real sizes, not estimates; default 0 = never).
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
            # The driver's events table stores nanosecond timestamps,
            # which Spark's parquet reader rejects by default.
            "spark.sql.legacy.parquet.nanosAsLong": "true",
            # Arrow transfer for pandas UDFs / toPandas (vectorized python).
            "spark.sql.execution.arrow.pyspark.enabled": "true",
        }
        if self.reliable_checkpoints:
            conf["spark.sparkplans.reliableCheckpoints"] = "true"
        if self.checkpoint_dir:
            conf["spark.sparkplans.checkpointDir"] = self.checkpoint_dir
        if not self.repartition_file_scans:
            # Do not split files into byte-range partitions: one file,
            # one partition (preserves declared per-file sort order;
            # mirrors tests/setup_tables.rs:86-88 "each file a partition").
            conf["spark.sql.files.maxPartitionBytes"] = str(1 << 40)
            conf["spark.sql.files.openCostInBytes"] = str(1 << 40)
        conf.update(self.extra_conf)
        return conf

    def engine_flags(self) -> dict[str, Any]:
        return {
            "prefer_existing_sort": self.prefer_existing_sort,
            "repartition_joins": self.repartition_joins,
            "repartition_aggregations": self.repartition_aggregations,
        }


def configure_session(spark: SparkSession, options: EngineOptions | None = None) -> SparkSession:
    """Apply engine conf to an *existing* session (driver-provided)."""
    options = options or EngineOptions()
    for k, v in options.to_spark_conf().items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # some confs are static (e.g. already-started session);
            # leave them — they only affect perf, not correctness.
            pass
    return spark


def build_session(
    options: EngineOptions | None = None,
    app_name: str = "sparkplans",
    master: str | None = None,
) -> SparkSession:
    options = options or EngineOptions()
    master = master or os.environ.get(
        "SPARK_GRAFT_MASTER", f"local[{_default_parallelism()}]"
    )
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in options.to_spark_conf().items():
        builder = builder.config(k, v)
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    # Managed (bucketed) tables live outside the repo; static conf, so
    # it must be set before the session starts.
    builder = builder.config(
        "spark.sql.warehouse.dir",
        os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/sparkplans-warehouse"),
    )
    spark = builder.getOrCreate()
    # In case getOrCreate() returned a pre-existing session, re-apply
    # the runtime-settable confs.
    configure_session(spark, options)
    return spark


def settings(spark: SparkSession) -> dict[str, str]:
    """The reference's ``information_schema.df_settings`` analog
    (docs/1_cli_information_schema.md:69-108): current session conf."""
    return dict(spark.sparkContext.getConf().getAll()) | {
        k: v for k, v in _sql_conf_items(spark)
    }


def _sql_conf_items(spark: SparkSession):
    for row in spark.sql("SET").collect():
        yield row["key"], row["value"]
