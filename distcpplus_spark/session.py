"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]`` threads, but every config here is
chosen to also be the right default on a large cluster: AQE handles
runtime re-planning (partition coalescing, skew joins), Arrow speeds up
the Pandas-UDF slow path, and the session timezone is pinned to UTC so
timestamp semantics are deterministic and oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "distcpplus_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    Scale notes: on a real cluster, drop ``master`` (taken from
    spark-submit) and raise ``spark.sql.shuffle.partitions`` to
    ~2-3x total cores; AQE coalescing makes over-partitioning cheap
    while under-partitioning causes spills, so err high.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Prefer ShuffledHashJoin over SortMergeJoin when one side can
        # build per-partition hash maps (Spark still requires the build
        # side to be 3x smaller AND under threshold x num_partitions):
        # skips the full sort of the FACT side. Measured at sf10 on the
        # q05 lineitem(60M) x filtered-orders(7.5M) join: SMJ wall was
        # spill-jittery 7.5-23 s, SHJ steady 5.7-6.5 s. AQE's skew-join
        # splitting covers SHJ since Spark 3.2, and explicit merge()
        # hints still win where a sort is wanted, so the guardrails the
        # SMJ default existed for are all still in force.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
