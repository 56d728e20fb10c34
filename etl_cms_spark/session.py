"""SparkSession factory with scale-appropriate defaults.

All engine entry points build their session here so that Arrow,
AQE (including skew-join splitting), and shuffle sizing are set
uniformly.  On a real cluster the same builder is used via
``spark-submit --py-files``; only ``master`` changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    master: str | None = None,
    app_name: str = "etl-cms-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    ``shuffle_partitions`` defaults to the local core count — on a
    cluster you'd size this to ~2-3x total executor cores and let AQE
    coalesce small partitions.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]"))
        except (IndexError, ValueError):
            n = os.cpu_count() or 8
        shuffle_partitions = max(8, n)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for all pandas UDF exchange (the engine has no
        # per-row Python UDFs anywhere — BASELINE.json input_hint).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Keep timestamps deterministic across engines (oracle compare).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # bucketed-table metadata (producer-bucketed changelog path)
        # lives under the warehouse dir; keep it out of the repo.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def cluster_shape(spark: SparkSession) -> tuple[int, int]:
    """(n_executors, cores_per_executor) of the live session — the
    topology signal for ``dedup_mode="auto"`` (plans.pipeline).

    Local mode reports (1, defaultParallelism): one "executor" with
    all the cores.  On a cluster the executor count comes from the
    block-manager registry (minus the driver) and cores/executor from
    ``spark.executor.cores`` (falling back to defaultParallelism /
    executors when unset, e.g. under dynamic allocation defaults).

    The ``ETL_CMS_CLUSTER_SHAPE`` env var ("NxC", e.g. "250x4")
    overrides introspection — used by the sandbox bench to emulate the
    many-executor/few-core shape that local[k] cannot express (the
    pinned 2→8-core scaling rig), and usable operationally to pin the
    decision when dynamic allocation makes the live count misleading.
    """
    override = os.environ.get("ETL_CMS_CLUSTER_SHAPE")
    if override:
        n, c = override.lower().split("x")
        return (int(n), int(c))
    sc = spark.sparkContext
    if sc.master.startswith("local"):
        return (1, sc.defaultParallelism)
    try:
        n_exec = sc._jsc.sc().getExecutorMemoryStatus().size() - 1
    except Exception:  # py4j surface drift — fall back to conf
        n_exec = int(sc.getConf().get("spark.executor.instances", "0") or 0)
    n_exec = max(1, n_exec)
    cores = int(sc.getConf().get("spark.executor.cores", "0") or 0)
    if cores <= 0:
        cores = max(1, sc.defaultParallelism // n_exec)
    return (n_exec, cores)
