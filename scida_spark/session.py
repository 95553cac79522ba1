"""SparkSession factory tuned for this engine.

Local mode uses ``local[$SPARK_GRAFT_CPUS]`` (default all cores); on a
real cluster the same configs apply — AQE handles runtime re-planning
(partition coalescing, skew joins) so the static shuffle-partition
count only needs to be in the right order of magnitude.

Scale posture (100 TB): every knob here is chosen to survive a
1000-executor deployment —
  * AQE on (coalesce + skew join): replaces the reference's hand-rolled
    chunk cost model (scida ``map_group_operation`` planner,
    reference src/scida/customs/arepo/dataset.py:1381-1445).
  * Arrow execution for the Pandas-UDF escape hatches.
  * UTC session timezone so results are engine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "scida_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Vectorized-kernel batch size: the 10k default throttles the
        # Pandas-UDF kernels with Python round-trip overhead (measured
        # 3x on the 12M-row catalog-ID kernel). 128k rows ≈ 1-8 MB
        # Arrow batches for the numeric columns these kernels carry.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        # spark.sql.files.maxPartitionBytes stays at the 128 MB default:
        # measured at sf0.1, smaller splits change nothing once the JVM
        # is warm (per-query planning overhead dominates, not scan
        # parallelism), and at real scale 128 MB is the right split size.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # localCheckpoint blocks (the shared-scan pattern: clique maps,
        # signature tables, exact top-k) are only released when the JVM
        # GCs their RDD references and ContextCleaner follows up; the
        # default periodic-GC interval is 30 MIN, so a session that
        # re-runs checkpoint-heavy queries accumulates dead blocks and
        # each warm pass gets SLOWER (measured at the ×100 stress set:
        # sim_topk 54 s → 98 s across passes; with GC between runs it
        # stabilizes at ~42-46 s). Two minutes bounds the creep at
        # negligible GC cost.
        .config("spark.cleaner.periodicGC.interval", "2min")
        # PySpark 4 captures the Python call site for EVERY DataFrame
        # API call (errors/utils.py::_with_origin) — a getActiveSession
        # + JVM round-trip per call. On plan-construction-heavy queries
        # (sim_topk builds ~10k Column expressions) this is ~10% of
        # wall time and buys nothing outside interactive debugging.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to an externally-created session.

    The driver hands ``queries()`` callables its own session; pin the
    configs that affect result *values* (timezone, AQE) — these are all
    runtime-mutable SQL confs.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # Perf-only (never value-affecting): larger Arrow batches for the
    # Pandas-UDF kernels — see get_spark.
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
    # Externally-created sessions default to 200 shuffle partitions —
    # pointless task overhead at test scale; AQE still re-coalesces.
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
    # (spark.python.sql.dataFrameDebugging.enabled is STATIC — only
    # settable at session build; see get_spark. An externally-created
    # session keeps whatever its creator chose.)
    return spark
