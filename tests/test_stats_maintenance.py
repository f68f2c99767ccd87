"""Incremental corpus-stats maintenance (plans/stats_maintenance.py):
incremental merge == full recompute BIT-EXACTLY for every maintained
sketch, delta scans touch only appended files, and overwrite falls back
to a full recompute."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.plans.stats_maintenance import (
    STATS,
    IncrementalCorpusStats,
)
from go_html_transform_spark.sources.manifest_table import ManifestTable


def _corpus(spark, seed, n):
    rng = random.Random(seed)
    rows = [
        (
            seed * 100000 + i,
            [rng.randrange(1024) for _ in range(rng.randrange(1, 30))],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_key long, tokens array<int>"
    ).withColumn("n_tok", F.size("tokens"))


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def setup(spark, tmp_path):
    table = ManifestTable(str(tmp_path / "tbl"))
    stats = IncrementalCorpusStats(spark, str(tmp_path / "stats"))
    return table, stats


def test_incremental_equals_full_recompute(spark, setup):
    table, stats = setup
    table.append(_corpus(spark, 1, 400))
    r1 = stats.update(table)
    assert r1["mode"] == "full" and r1["snapshot"] == 1

    table.append(_corpus(spark, 2, 300))
    r2 = stats.update(table)
    assert r2["mode"] == "incremental"
    # only the appended commit's files were scanned
    n_snap2_files = len(table.files(snapshot=2))
    n_snap1_files = len(table.files(snapshot=1))
    assert r2["files_scanned"] == n_snap2_files - n_snap1_files > 0

    # bit-exact equality vs full recompute of the current snapshot
    fresh = IncrementalCorpusStats(spark, str(stats.store) + "_fresh")
    fresh.update(table)
    for name in STATS:
        assert _sorted_rows(stats.stat(name)) == _sorted_rows(
            fresh.stat(name)
        ), name


def test_noop_and_multi_append_chain(spark, setup):
    table, stats = setup
    table.append(_corpus(spark, 1, 200))
    stats.update(table)
    assert stats.update(table)["mode"] == "noop"
    for seed in (2, 3, 4):
        table.append(_corpus(spark, seed, 150))
        assert stats.update(table)["mode"] == "incremental"
    fresh = IncrementalCorpusStats(spark, str(stats.store) + "_fresh")
    fresh.update(table)
    for name in STATS:
        assert _sorted_rows(stats.stat(name)) == _sorted_rows(
            fresh.stat(name)
        ), name
    # tf total equals the corpus token count exactly
    total = stats.stat("tf").agg(F.sum("tf")).collect()[0][0]
    assert total == table.scan(spark).select(
        F.sum(F.size("tokens"))
    ).collect()[0][0]


def test_overwrite_triggers_full_recompute(spark, setup):
    table, stats = setup
    table.append(_corpus(spark, 1, 200))
    stats.update(table)
    table.overwrite(_corpus(spark, 9, 100))
    r = stats.update(table)
    assert r["mode"] == "full"
    fresh = IncrementalCorpusStats(spark, str(stats.store) + "_fresh")
    fresh.update(table)
    for name in STATS:
        assert _sorted_rows(stats.stat(name)) == _sorted_rows(
            fresh.stat(name)
        ), name
