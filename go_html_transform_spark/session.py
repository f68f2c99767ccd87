"""SparkSession factory with scale-oriented defaults.

The reference engine (go-html-transform) is single-threaded and in-memory;
every knob here exists because we target a 1000-executor cluster instead:
AQE for runtime re-planning + skew-join splitting, Arrow for every
JVM<->Python crossing, UTC session time so timestamp arithmetic matches the
DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "go-html-transform-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` is the local parallelism (int) or "*"; on a real cluster the
    master URL comes from spark-submit and this arg is ignored via
    SPARK_GRAFT_MASTER. ``shuffle_partitions`` defaults to 2x cores locally —
    on a cluster you'd size it to total cores x 2-3 or rely on AQE coalescing.
    """
    master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        c = cores if cores is not None else os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{c}]"

    if shuffle_partitions is None:
        try:
            n = int(str(cores)) if cores not in (None, "*") else os.cpu_count() or 8
        except ValueError:
            n = os.cpu_count() or 8
        shuffle_partitions = max(8, 2 * n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalescing of small shuffle partitions + skew-join
        # splitting — the engine's answer to hot doc_id/source keys (north
        # rule), alongside explicit salting in operators/skew.py.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batches for every pandas UDF / applyInPandas crossing.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic timestamp arithmetic vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Keep parquet scan splits reasonable for the local testbed; on the
        # 100 TB cluster this stays at the 128m default.
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Shuffle/spill files on tmpfs: the sandbox's /tmp sits on a ~300MB/s
        # virtual disk that collapses under concurrent spill writers; a real
        # cluster node has local NVMe. RAM-backed local dirs remove that
        # artifact (the box has 126G of tmpfs).
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
