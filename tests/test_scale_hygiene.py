"""M5 — skew salting + lineage checkpoint/resume tests."""

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.operators import skew
from go_html_transform_spark.plans.lineage import CheckpointTable, partition_lineage


@pytest.fixture()
def skewed(spark):
    # one hot key (90%), many cold keys
    hot = [("hot", f"id{i}") for i in range(900)]
    cold = [(f"k{i % 50}", f"cid{i}") for i in range(100)]
    return spark.createDataFrame(hot + cold, "key string, id string")


def test_salted_count_equals_plain(spark, skewed):
    plain = {r.key: r.cnt for r in skewed.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    salted = {r.key: r.cnt for r in skew.salted_count(skewed, "key", "id").collect()}
    assert salted == plain
    assert salted["hot"] == 900


def test_salt_distributes_hot_key(spark, skewed):
    s = skew.with_salt(skewed.filter("key='hot'"), "id", n_salts=16)
    per_salt = [r.cnt for r in s.groupBy("__salt").agg(F.count("*").alias("cnt")).collect()]
    assert len(per_salt) == 16  # all salts hit
    assert max(per_salt) < 900 * 0.25  # no salt holds the whole key


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(50)], "key string, w double"
    )
    plain = skewed.join(dim, "key").agg(F.sum("w").alias("s")).collect()[0].s
    salted = (
        skew.salted_join(skewed, dim, "key", "id", n_salts=8)
        .agg(F.sum("w").alias("s"))
        .collect()[0]
        .s
    )
    assert salted == plain


def test_lineage_checksum_order_insensitive(spark):
    df1 = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "doc_id string, v int")
    df2 = spark.createDataFrame([("c", 3), ("a", 1), ("b", 2)], "doc_id string, v int")
    l1 = partition_lineage(df1, "s", n_buckets=4).select("bucket", "n_rows", "checksum")
    l2 = partition_lineage(df2, "s", n_buckets=4).select("bucket", "n_rows", "checksum")
    assert sorted(map(tuple, l1.collect())) == sorted(map(tuple, l2.collect()))


def test_checkpoint_resume_partition_granular(spark, tmp_path):
    ckpt = CheckpointTable(spark, str(tmp_path / "lineage"))
    sink = str(tmp_path / "out")
    df = spark.createDataFrame(
        [(f"d{i:03d}", i) for i in range(200)], "doc_id string, v int"
    )

    n1 = ckpt.run_stage(df, "stage1", sink, n_buckets=8)
    assert n1 == 200
    # full rerun: everything checkpointed -> nothing recomputed or rewritten
    n2 = ckpt.run_stage(df, "stage1", sink, n_buckets=8)
    assert n2 == 0
    assert spark.read.parquet(sink).count() == 200

    # simulate a killed job: drop lineage for some buckets, rerun resumes
    # exactly those buckets
    lineage = spark.read.parquet(str(tmp_path / "lineage"))
    kept = lineage.filter(F.col("bucket") < 5)
    kept.write.mode("overwrite").parquet(str(tmp_path / "lineage2"))
    ckpt2 = CheckpointTable(spark, str(tmp_path / "lineage2"))
    sink2 = str(tmp_path / "out2")
    n3 = ckpt2.run_stage(df, "stage1", sink2, n_buckets=8)
    expected = (
        df.withColumn("b", F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int"))
        .filter("b >= 5")
        .count()
    )
    assert n3 == expected > 0


def test_checkpoint_completion_is_snapshot_scoped(spark, tmp_path):
    """A bucket marked complete (including zero-row markers) under one
    input snapshot must NOT mask the same bucket for a different snapshot
    — late-arriving data gets a new snapshot_id and reprocesses cleanly."""
    ckpt = CheckpointTable(spark, str(tmp_path / "lineage"))
    sink = str(tmp_path / "out")
    df = spark.createDataFrame(
        [(f"d{i:03d}", i) for i in range(50)], "doc_id string, v int"
    )
    n1 = ckpt.run_stage(df, "stage1", sink, n_buckets=8, snapshot_id="snap1")
    assert n1 == 50
    # same snapshot: idempotent no-op
    assert ckpt.run_stage(df, "stage1", sink, n_buckets=8, snapshot_id="snap1") == 0
    # NEW snapshot (late-arriving rows): all buckets pending again,
    # including ones that were empty/zero-row under snap1
    late = spark.createDataFrame(
        [(f"d{i:03d}", i) for i in range(50, 60)], "doc_id string, v int"
    )
    n2 = ckpt.run_stage(late, "stage1", sink, n_buckets=8, snapshot_id="snap2")
    assert n2 == 10
    assert spark.read.parquet(sink).count() == 60


def test_run_stage_executes_plan_once(spark, tmp_path):
    """The stage pipeline must compute ONCE per run_stage call (round-1
    recomputed it up to 3x: count, write, lineage agg). An accumulator
    bumped inside the plan counts actual row evaluations."""
    acc = spark.sparkContext.accumulator(0)

    def bump(v):
        acc.add(1)
        return v

    from pyspark.sql.types import IntegerType

    bump_udf = F.udf(bump, IntegerType())
    df = spark.createDataFrame(
        [(f"d{i:03d}", i) for i in range(100)], "doc_id string, v int"
    ).withColumn("v", bump_udf("v"))
    ckpt = CheckpointTable(spark, str(tmp_path / "lineage"))
    n = ckpt.run_stage(df, "stage1", str(tmp_path / "out"), n_buckets=4)
    assert n == 100
    # one evaluation per row (the lineage agg reads the persisted cache);
    # allow a small slack for a task retry but far below 2 full passes
    assert acc.value <= 120, acc.value


def test_pending_is_broadcast_anti_join(spark, tmp_path):
    ckpt = CheckpointTable(spark, str(tmp_path / "lineage"))
    df = spark.createDataFrame([("a", 1)], "doc_id string, v int")
    plan = ckpt.pending(df, "s")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_run_stage_with_metrics_single_pass_and_resume(spark, tmp_path):
    """Observed metrics ride the stage's ONE execution: values cover
    exactly the written rows, a fully-resumed re-run records
    rows_written=0, and a partial resume's metrics cover only the
    pending buckets."""
    from go_html_transform_spark.plans.lineage import (
        CheckpointTable,
        MetricsTable,
        run_stage_with_metrics,
    )

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 10).alias("n_tok")
    )
    ckpt = CheckpointTable(spark, str(tmp_path / "ckpt"))
    met = MetricsTable(spark, str(tmp_path / "metrics"))
    n = run_stage_with_metrics(
        ckpt, met, df, "s1", str(tmp_path / "sink"),
        metric_exprs={"sum_n_tok": F.sum("n_tok"),
                      "max_n_tok": F.max("n_tok")},
        key="doc_id", snapshot_id="snapA", run_id="r1",
    )
    assert n == 1000
    got = {r.metric: r.value for r in met.read().collect()}
    assert got["rows_written"] == 1000.0
    assert got["sum_n_tok"] == float(sum(i % 10 for i in range(1000)))
    assert got["max_n_tok"] == 9.0
    # fully resumed: no rows, no stale metric values
    n2 = run_stage_with_metrics(
        ckpt, met, df, "s1", str(tmp_path / "sink"),
        metric_exprs={"sum_n_tok": F.sum("n_tok")},
        key="doc_id", snapshot_id="snapA", run_id="r2",
    )
    assert n2 == 0
    r2 = {r.metric: r.value for r in met.read()
          .filter("run_id = 'r2'").collect()}
    assert r2 == {"rows_written": 0.0}
    # partial resume under a NEW snapshot: fresh metrics over all rows
    n3 = run_stage_with_metrics(
        ckpt, met, df, "s1", str(tmp_path / "sink3"),
        metric_exprs={"sum_n_tok": F.sum("n_tok")},
        key="doc_id", snapshot_id="snapB", run_id="r3",
    )
    assert n3 == 1000
    r3 = {r.metric: r.value for r in met.read()
          .filter("run_id = 'r3'").collect()}
    assert r3["sum_n_tok"] == float(sum(i % 10 for i in range(1000)))
