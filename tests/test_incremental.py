"""Incremental feature backfill (plans/incremental.py): equivalence with
full recompute, delta-bounded plan shape, and the temporal-leakage audit."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.plans import incremental as INC

BASE = dt.datetime(2026, 1, 1)


def _corpus(seed=7, n_docs=12, n_events=300, n_labels=80):
    rng = random.Random(seed)
    ev = [
        (
            f"d{rng.randrange(n_docs):03d}",
            BASE + dt.timedelta(seconds=rng.randrange(0, 200_000)),
            i,
            [rng.randrange(30) for _ in range(rng.randrange(0, 8))],
            rng.randrange(1, 50),
            rng.choice(["web", "wiki"]),
            round(rng.random(), 3),
        )
        for i in range(n_events)
    ]
    lab = [
        (
            f"d{rng.randrange(n_docs):03d}",
            BASE + dt.timedelta(seconds=rng.randrange(0, 200_000)),
            round(rng.random(), 3),
        )
        for i in range(n_labels)
    ]
    return ev, lab


EV_SCHEMA = (
    "doc_id string, event_time timestamp, event_id int, tokens array<int>, "
    "n_tok int, source string, value double"
)
LAB_SCHEMA = "doc_id string, obs_time timestamp, label_value double"


def _key(r):
    return (r["doc_id"], r["event_time"], r["event_id"])


def _rows(df):
    return sorted((tuple(str(v) for v in r) for r in df.collect()))


@pytest.fixture(scope="module")
def data(spark):
    ev, lab = _corpus()
    # split: first 240 events + 60 labels are "yesterday"; rest is the delta
    old_ev = spark.createDataFrame(ev[:240], EV_SCHEMA)
    new_ev = spark.createDataFrame(ev[240:], EV_SCHEMA)
    old_lab = spark.createDataFrame(lab[:60], LAB_SCHEMA)
    new_lab = spark.createDataFrame(lab[60:], LAB_SCHEMA)
    all_ev = spark.createDataFrame(ev, EV_SCHEMA)
    all_lab = spark.createDataFrame(lab, LAB_SCHEMA)
    return old_ev, new_ev, old_lab, new_lab, all_ev, all_lab


def test_incremental_equals_full_recompute(spark, data):
    old_ev, new_ev, old_lab, new_lab, all_ev, all_lab = data
    prev = INC.compute_features(old_ev, old_lab)
    got = INC.incremental_features(prev, new_ev, old_lab, new_labels=new_lab)
    want = INC.compute_features(all_ev, all_lab)
    assert sorted(got.columns) == sorted(want.columns)
    assert _rows(got.select(*want.columns)) == _rows(want)


def test_incremental_events_only_delta(spark, data):
    old_ev, new_ev, old_lab, _, all_ev, _ = data
    prev = INC.compute_features(old_ev, old_lab)
    got = INC.incremental_features(prev, new_ev, old_lab)
    want = INC.compute_features(all_ev, old_lab)
    assert _rows(got.select(*want.columns)) == _rows(want)


def test_untouched_entities_pass_through_unshuffled(spark, data, tmp_path):
    """The pass-through branch must be a broadcast anti-join of the
    materialized prior feature table — the only hash exchanges in the
    whole plan belong to the delta (dirty-key distinct) and the dirty-
    slice recompute."""
    old_ev, new_ev, old_lab, new_lab, _, _ = data
    p = str(tmp_path / "prev")
    INC.compute_features(old_ev, old_lab).write.parquet(p)
    prev = spark.read.parquet(p)
    out = INC.incremental_features(prev, new_ev, old_lab, new_labels=new_lab)
    assert len(out.collect()) > 0  # execute THIS plan so AQE finalizes
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight" in plan  # broadcast anti pass-through
    # The load-bearing property: the untouched majority (the prev-features
    # parquet scan) streams STRAIGHT into the broadcast anti-join — no
    # Exchange may sit between that scan and the join. Every remaining
    # exchange in the plan hangs off the delta (dirty-key distinct, reused
    # across its three consumers, + the dirty-slice as-of/window sort),
    # all delta-bounded.
    final = plan.split("== Initial Plan ==")[0]  # executed section only
    lines = final.splitlines()
    anti_idx = next(i for i, l in enumerate(lines) if "LeftAnti" in l)
    # streamed side = the next two lines (ColumnarToRow + FileScan);
    # neither may be an Exchange
    probe = "\n".join(lines[anti_idx + 1 : anti_idx + 3])
    assert "FileScan parquet" in probe and "Exchange" not in probe, final
    # and the dirty-key distinct exchange is reused, not recomputed 3x:
    # final plan carries exactly the dirty distinct + the dirty-slice
    # as-of/window exchange
    n_exchanges = final.count("Exchange hashpartitioning") - final.count(
        "ReusedExchange"
    )
    assert n_exchanges <= 2, final


def test_audit_clean_output_has_no_violations(spark, data):
    old_ev, _, old_lab, _, _, _ = data
    enriched = INC.compute_features(old_ev, old_lab)
    bad = INC.audit_temporal_leakage(enriched, old_lab)
    assert bad.count() == 0


def test_audit_catches_leaked_future_label(spark, data):
    """Corrupt one row's label to the value of a FUTURE observation —
    the audit must flag exactly the corrupted (key, time) rows."""
    old_ev, _, old_lab, _, _, _ = data
    enriched = INC.compute_features(old_ev, old_lab)
    victim = enriched.filter(F.col("label_value").isNotNull()).first()
    corrupted = enriched.withColumn(
        "label_value",
        F.when(
            (F.col("doc_id") == victim["doc_id"])
            & (F.col("event_time") == victim["event_time"]),
            F.lit(victim["label_value"] + 1000.0),
        ).otherwise(F.col("label_value")),
    )
    bad = INC.audit_temporal_leakage(corrupted, old_lab).collect()
    assert len(bad) >= 1
    assert all(b["doc_id"] == victim["doc_id"] for b in bad)
    assert all(b["stored_label"] == victim["label_value"] + 1000.0 for b in bad)


def test_audit_catches_fabricated_label_for_unlabeled_key(spark, data):
    """A non-null label on an entity with no label history at all is a
    fabrication — expected side is NULL, must be flagged."""
    old_ev, _, old_lab, _, _, _ = data
    labeled = {r["doc_id"] for r in old_lab.select("doc_id").distinct().collect()}
    unlabeled = (
        INC.compute_features(old_ev, old_lab)
        .filter(~F.col("doc_id").isin(*labeled))
    )
    if unlabeled.count() == 0:
        pytest.skip("corpus has no unlabeled entity")
    forged = unlabeled.withColumn("label_value", F.lit(0.123))
    bad = INC.audit_temporal_leakage(forged, old_lab)
    assert bad.count() == forged.count()


def test_incremental_features_from_snapshots(spark, tmp_path):
    """Manifest-snapshot-driven backfill == full recompute over the
    current snapshot, scanning only the appended files; same-snapshot
    call is a no-op; non-append history raises."""
    from go_html_transform_spark.plans.incremental import (
        compute_features,
        incremental_features_from_snapshots,
    )
    from go_html_transform_spark.sources.manifest_table import ManifestTable

    ev, lab = _corpus(seed=11)
    ev0 = spark.createDataFrame(ev[:240], EV_SCHEMA)
    ev1 = spark.createDataFrame(ev[240:], EV_SCHEMA)
    labels = spark.createDataFrame(lab, LAB_SCHEMA)

    table = ManifestTable(str(tmp_path / "facts"))
    table.append(ev0)
    snap1 = table.current_snapshot_id()
    feats0 = compute_features(table.scan(spark), labels)

    same, info0 = incremental_features_from_snapshots(
        spark, table, feats0, snap1, labels
    )
    assert info0["files_scanned"] == 0 and same is feats0

    table.append(ev1)
    got, info = incremental_features_from_snapshots(
        spark, table, feats0, snap1, labels
    )
    n_new = len(table.files()) - len(table.files(snapshot=snap1))
    assert info["files_scanned"] == n_new > 0
    want = compute_features(table.scan(spark), labels)
    assert _rows(got) == _rows(want.select(got.columns))

    # overwrite breaks append-only -> loud failure, never a silent scan
    table.overwrite(ev0)
    with pytest.raises(ValueError):
        incremental_features_from_snapshots(
            spark, table, feats0, snap1, labels
        )
