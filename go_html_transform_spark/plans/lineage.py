"""Per-partition lineage checkpointing + partition-granular resume
(north rule: "every stage writes per-partition lineage rows (input
snapshot-id, row counts, checksum) to a checkpoint table so a killed job
resumes at partition granularity").

Reference precedent: ``Trace`` (/root/reference/html/transform/transform.go:314-328)
is the reference's only observability hook — log before/after per node.
The engine replaces it with structural, distributed lineage:

* partitions are LOGICAL and deterministic: ``bucket = pmod(hash(key), n)``
  — stable across runs/cluster sizes, unlike spark_partition_id().
* per (stage, bucket): row count + order-insensitive checksum
  (sum of per-row digests) — all JVM-side, no Python in the path.
* resume: anti-join the input's buckets against completed lineage rows
  FOR THE SAME INPUT SNAPSHOT, recompute only missing buckets, append.

Two hash families:

* default — ``xxhash64`` (JVM intrinsic, any column type): the production
  path.
* affine — ``(x * a + b) mod P`` over numeric columns (the MinHash
  constants from operators/dedup.py): bit-identical in DuckDB, so the
  lineage computation itself is oracle-checked (registry query
  ``lineage_partition_rows``).

The checkpoint table is parquet here; on a real cluster it is an Iceberg
table and ``snapshot_id`` records the input's Iceberg snapshot — in the
sandbox we record a content fingerprint instead (sources/sinks.py).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from go_html_transform_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
)

LINEAGE_SCHEMA = (
    "stage string, bucket int, n_rows bigint, checksum bigint, "
    "snapshot_id string, run_id string, completed_at_us bigint"
)

_CHECKSUM_MOD = 2**62


def _affine_const(i: int) -> tuple[int, int]:
    return (2 * i + 1) * MINHASH_A % MINHASH_P, i * MINHASH_B % MINHASH_P


def affine_digest(cols: list[Column]) -> Column:
    """Order-insensitive-safe per-row digest over NUMERIC columns with the
    MinHash affine family — every term < P^2 < 2^40, sum < 3*2^40: exact
    int64 in both Spark and DuckDB (the cross-engine twin of xxhash64)."""
    acc = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        a, b = _affine_const(i)
        acc = acc + ((c.cast("long") % MINHASH_P) * a + b)
    return acc % MINHASH_P


def affine_digest_sql(cols: list[str]) -> str:
    terms = []
    for i, c in enumerate(cols):
        a, b = _affine_const(i)
        terms.append(f"((CAST({c} AS BIGINT) % {MINHASH_P}) * {a} + {b})")
    return f"({' + '.join(terms)}) % {MINHASH_P}"


def with_bucket(
    df: DataFrame,
    key: str = "doc_id",
    n_buckets: int = 64,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Deterministic logical partition id — survives restarts and differing
    physical parallelism (spark_partition_id would not)."""
    expr = bucket_expr if bucket_expr is not None else F.xxhash64(F.col(key))
    return df.withColumn("__bucket", F.pmod(expr, F.lit(n_buckets)).cast("int"))


def partition_lineage(
    df: DataFrame,
    stage: str,
    key: str = "doc_id",
    n_buckets: int = 64,
    snapshot_id: str = "",
    run_id: str = "",
    bucket_expr: Column | None = None,
    digest_expr: Column | None = None,
) -> DataFrame:
    """Compute per-bucket lineage rows for a stage output. One JVM-side
    aggregation: count + sum-of-digests (order-insensitive, modular wrap
    is fine — it's a fingerprint). ``bucket_expr``/``digest_expr`` default
    to xxhash64; pass affine_digest(...) columns for the DuckDB-checkable
    form."""
    digest = (
        digest_expr
        if digest_expr is not None
        else F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    )
    hashed = with_bucket(df, key, n_buckets, bucket_expr).withColumn("__h", digest)
    # accumulate in decimal(38,0) (no overflow under ANSI mode), then fold
    # back into a long fingerprint
    return (
        hashed.groupBy("__bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.pmod(F.sum(F.col("__h").cast("decimal(38,0)")), F.lit(_CHECKSUM_MOD))
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
    """Append-only lineage store with partition-granular resume.

    Completion is scoped to (stage, snapshot_id): a bucket marked complete
    for one input snapshot — including a zero-row bucket — does NOT mask
    the same bucket when the stage later runs over a different snapshot
    (late-arriving data gets a new snapshot_id and reprocesses cleanly).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.parquet(self.path)

    def append(self, lineage: DataFrame) -> None:
        lineage.write.mode("append").parquet(self.path)

    def completed_buckets(self, stage: str, snapshot_id: str = "") -> DataFrame:
        return (
            self.read()
            .filter(
                (F.col("stage") == stage) & (F.col("snapshot_id") == snapshot_id)
            )
            .select("bucket")
            .distinct()
        )

    def pending(
        self,
        df: DataFrame,
        stage: str,
        key: str = "doc_id",
        n_buckets: int = 64,
        snapshot_id: str = "",
    ) -> DataFrame:
        """Rows of ``df`` whose bucket has NOT completed ``stage`` for this
        snapshot — the resume input. Anti-join on the (tiny, broadcast)
        completed set."""
        done = self.completed_buckets(stage, snapshot_id)
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
        pending buckets that turned out empty, so later resumes of the
        SAME snapshot don't rescan them forever. Returns rows written.
        Idempotent: a second call after success writes nothing new.

        The stage plan executes ONCE: ``todo`` is persisted across the
        sink write and the lineage aggregation (round 1 recomputed the
        pipeline up to 3x — count, write, lineage — which triples stage
        cost at 100 TB), and the row count is derived from the lineage
        rows instead of a separate count() action.

        Driver-side assembly is safe: lineage is at most n_buckets rows."""
        done = {
            r.bucket for r in self.completed_buckets(stage, snapshot_id).collect()
        }
        pending_ids = sorted(set(range(n_buckets)) - done)
        if not pending_ids:
            return 0
        todo = self.pending(df, stage, key, n_buckets, snapshot_id)
        todo.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            todo.write.mode("append").parquet(sink_path)
            lin_rows = partition_lineage(
                todo, stage, key, n_buckets, snapshot_id, run_id
            ).collect()
        finally:
            todo.unpersist()
        n = int(sum(r.n_rows for r in lin_rows))
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


METRICS_SCHEMA = (
    "stage string, metric string, value double, snapshot_id string, "
    "run_id string, recorded_at_us bigint"
)


class MetricsTable:
    """Append-only per-stage metrics store — the "metrics" half of the
    north rule's "per-partition lineage + metrics". Metric values are
    captured with ``df.observe`` DURING the stage's single execution
    (the accumulator rides the sink write — zero extra corpus passes,
    the same no-recompute discipline run_stage applies to lineage), so
    a metrics row is evidence the stage really ran over exactly the
    rows it wrote."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], METRICS_SCHEMA)

    def record(
        self,
        stage: str,
        values: dict[str, float],
        snapshot_id: str = "",
        run_id: str = "",
    ) -> None:
        now_us = int(time.time() * 1e6)
        rows = [
            (stage, k, float(v), snapshot_id, run_id, now_us)
            for k, v in sorted(values.items())
        ]
        self.spark.createDataFrame(rows, METRICS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)


def run_stage_with_metrics(
    ckpt: CheckpointTable,
    metrics: MetricsTable,
    df: DataFrame,
    stage: str,
    sink_path: str,
    metric_exprs: dict[str, Column] | None = None,
    key: str = "doc_id",
    n_buckets: int = 64,
    snapshot_id: str = "",
    run_id: str = "",
) -> int:
    """run_stage + observed metrics in ONE execution: the caller's
    aggregate expressions (e.g. ``{"sum_n_tok": F.sum("n_tok")}``) ride
    the sink write via ``df.observe`` — no second pass, no separate
    count job. ``rows_written`` is always recorded."""
    exprs = dict(metric_exprs or {})
    obs = None
    observed = df
    if exprs:
        from pyspark.sql import Observation

        # observe AFTER the pending filter so metrics cover exactly the
        # rows this run writes (a resumed run must not re-count completed
        # buckets); run_stage re-applies pending — idempotent, the second
        # anti-join filters nothing
        pending = ckpt.pending(df, stage, key, n_buckets, snapshot_id)
        obs = Observation()
        observed = pending.observe(
            obs, *[v.alias(k) for k, v in sorted(exprs.items())]
        )

    n = ckpt.run_stage(
        observed, stage, sink_path, key, n_buckets, snapshot_id, run_id
    )
    vals: dict[str, float] = {"rows_written": float(n)}
    if obs is not None and n > 0:
        got = obs.get
        vals.update({k: float(got[k]) for k in exprs})
    metrics.record(stage, vals, snapshot_id, run_id)
    return n
