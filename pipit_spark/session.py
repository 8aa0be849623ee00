"""SparkSession factory tuned for the pipit-spark engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); on a real
cluster callers pass their own session. All knobs here are scale-oriented:
AQE (runtime re-plan + skew-join splitting), Arrow for the pandas-UDF
matching pass, and a shuffle-partition count that callers can override per
deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pipit-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults favor the 100 TB design point: AQE on (coalesces
    post-shuffle partitions and splits skewed ones at runtime), broadcast
    threshold left to Spark, Arrow enabled so grouped-map pandas UDFs move
    batches in columnar form instead of pickled rows.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        # read TIMESTAMP(NANOS) parquet (driver testdata) as long ns
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Arrow transfers (mapInPandas/applyInPandas) allocate from the
        # JVM's DIRECT pool, whose default cap follows -Xmx. A
        # multi-stage local run (ingest → match in one JVM) can exhaust
        # that implicit cap even though each stage passes alone —
        # diagnosed as PLANS.md §21 Trap 1, previously mitigated by
        # raising SPARK_GRAFT_DRIVER_MEM by hand. Cap direct memory
        # EXPLICITLY and decoupled from heap so the headroom is a code
        # guarantee: direct buffers are lazily allocated, so a generous
        # cap costs nothing when unused. On a real cluster per-executor
        # pools make this a non-issue (callers pass their own session).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:MaxDirectMemorySize="
            + os.environ.get("SPARK_GRAFT_DIRECT_MEM", "16g"),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
