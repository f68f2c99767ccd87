"""Per-partition lineage checkpointing + partition-granular resume
(north rule: "every stage writes per-partition lineage rows (input
snapshot-id, row counts, checksum) to a checkpoint table so a killed job
resumes at partition granularity").

Reference precedent: ``Trace`` (/root/reference/html/transform/transform.go:314-328)
is the reference's only observability hook — log before/after per node.
The engine replaces it with structural, distributed lineage:

* partitions are LOGICAL and deterministic: ``bucket = pmod(xxhash64(key), n)``
  — stable across runs/cluster sizes, unlike spark_partition_id().
* per (stage, bucket): row count + order-insensitive checksum
  (sum of xxhash64 over the row's canonical string) — all JVM-side,
  no Python in the path.
* resume: anti-join the input's buckets against completed lineage rows,
  recompute only missing buckets, append.

The checkpoint table is parquet here; on a real cluster it is an Iceberg
table and ``snapshot_id`` records the input's Iceberg snapshot — in the
sandbox we record a content fingerprint instead (sources/sinks.py).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "stage string, bucket int, n_rows bigint, checksum bigint, "
    "snapshot_id string, run_id string, completed_at_us bigint"
)


def with_bucket(df: DataFrame, key: str = "doc_id", n_buckets: int = 64) -> DataFrame:
    """Deterministic logical partition id — survives restarts and differing
    physical parallelism (spark_partition_id would not)."""
    return df.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )


def partition_lineage(
    df: DataFrame,
    stage: str,
    key: str = "doc_id",
    n_buckets: int = 64,
    snapshot_id: str = "",
    run_id: str = "",
) -> DataFrame:
    """Compute per-bucket lineage rows for a stage output. One JVM-side
    aggregation: count + sum-of-hashes (order-insensitive, overflow wraps
    are fine — it's a fingerprint)."""
    hashed = with_bucket(df, key, n_buckets).withColumn(
        "__h", F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    )
    # accumulate in decimal(38,0) (no overflow under ANSI mode), then fold
    # back into a long fingerprint
    return (
        hashed.groupBy("__bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.pmod(F.sum(F.col("__h").cast("decimal(38,0)")), F.lit(2**62))
            .cast("long")
            .alias("checksum"),
        )
        .select(
            F.lit(stage).alias("stage"),
            F.col("__bucket").alias("bucket"),
            "n_rows",
            "checksum",
            F.lit(snapshot_id).alias("snapshot_id"),
            F.lit(run_id).alias("run_id"),
            F.lit(int(time.time() * 1e6)).alias("completed_at_us"),
        )
    )


class CheckpointTable:
    """Append-only lineage store with partition-granular resume."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.parquet(self.path)

    def append(self, lineage: DataFrame) -> None:
        lineage.write.mode("append").parquet(self.path)

    def completed_buckets(self, stage: str) -> DataFrame:
        return self.read().filter(F.col("stage") == stage).select("bucket").distinct()

    def pending(
        self, df: DataFrame, stage: str, key: str = "doc_id", n_buckets: int = 64
    ) -> DataFrame:
        """Rows of ``df`` whose bucket has NOT completed ``stage`` — the
        resume input. Anti-join on the (tiny, broadcast) completed set."""
        done = self.completed_buckets(stage)
        bucketed = with_bucket(df, key, n_buckets)
        return bucketed.join(
            F.broadcast(done),
            bucketed["__bucket"] == done["bucket"],
            "left_anti",
        ).drop("__bucket")

    def run_stage(
        self,
        df: DataFrame,
        stage: str,
        sink_path: str,
        key: str = "doc_id",
        n_buckets: int = 64,
        snapshot_id: str = "",
        run_id: str = "",
    ) -> int:
        """Execute a stage resumably: write only pending buckets to the
        sink, then record their lineage — INCLUDING zero-row lineage for
        pending buckets that turned out empty, so later resumes don't
        rescan them forever. Returns rows written. Idempotent: a second
        call after success writes nothing and marks nothing new.

        Driver-side assembly is safe: lineage is at most n_buckets rows."""
        done = {r.bucket for r in self.completed_buckets(stage).collect()}
        pending_ids = sorted(set(range(n_buckets)) - done)
        if not pending_ids:
            return 0
        todo = self.pending(df, stage, key, n_buckets)
        n = todo.count()
        if n > 0:
            todo.write.mode("append").parquet(sink_path)
            lin_rows = partition_lineage(
                todo, stage, key, n_buckets, snapshot_id, run_id
            ).collect()
        else:
            lin_rows = []
        observed = {r.bucket for r in lin_rows}
        now_us = int(time.time() * 1e6)
        zero_rows = [
            (stage, b, 0, 0, snapshot_id, run_id, now_us)
            for b in pending_ids
            if b not in observed
        ]
        rows = [tuple(r) for r in lin_rows] + zero_rows
        self.append(self.spark.createDataFrame(rows, LINEAGE_SCHEMA))
        return n
