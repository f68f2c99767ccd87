"""Incremental feature backfill + temporal-leakage audit — the
entity-granular complement to plans/lineage.py's partition-granular
resume, closing the north rule's operational loop: a daily delta of
events/labels lands, and ONLY the touched entities' timelines are
recomputed; everything else passes through untouched.

Why entity granularity: point-in-time features (as-of label, lag/lead,
rolling, sessionization, forward-fill — operators/window.add_features)
are functions of an entity's WHOLE ordered timeline, so one new event
invalidates exactly that entity's rows and no others. A partition-level
resume (lineage.py) re-runs whole buckets; this module narrows the
recompute to `|dirty entities| / |entities|` of the work — at 10^12 rows
with a daily delta touching ~0.1% of entities, a ~1000x saving over full
recompute.

Scale shape:

* the dirty-key set (distinct keys of the delta) is delta-bounded →
  BROADCAST to both the pass-through anti-join and the prior-rows
  semi-join: the untouched majority of the feature table is NEVER
  shuffled (plan-asserted in tests/test_incremental.py);
* only dirty entities' prior event rows + the delta flow into the
  standard as-of + window bundle (one exchange + one sort over the
  dirty slice);
* output = pass-through ∪ recomputed — union is narrow, and with the
  Iceberg layout (sources/iceberg.py bucket(doc_id)) the replaced rows
  align with a MERGE-on-bucket write.

Reference analogue: none (engine-added operational layer; the reference
is single-document batch, SURVEY §2.14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_html_transform_spark.operators.asof import asof_join
from go_html_transform_spark.operators.window import add_features

#: columns appended by the standard bundle (asof label + add_features),
#: i.e. output schema = event schema + these.
FEATURE_COLS = (
    "label_value",
    "n_tok_lag1",
    "value_lag1",
    "n_tok_rsum3",
    "n_tok_rmean3",
    "session_id",
    "value_ffill",
    "event_seq",
)


def compute_features(
    events: DataFrame,
    labels: DataFrame,
    key_col: str = "doc_id",
    time_col: str = "event_time",
) -> DataFrame:
    """The standard full-recompute bundle: backward as-of label join +
    windowed features. One exchange on the entity key + one sort total
    (the window subtree reuses the as-of partitioning — BENCH/PLANS.md)."""
    return add_features(
        asof_join(events, labels, on=key_col, left_time=time_col)
    )


def dirty_keys(
    new_events: DataFrame,
    new_labels: DataFrame | None,
    key_col: str = "doc_id",
) -> DataFrame:
    """Distinct entity keys invalidated by the delta: any new event
    re-orders its entity's windows; any new label can change label_value
    and value_ffill for every event at-or-after it."""
    d = new_events.select(key_col)
    if new_labels is not None:
        d = d.unionByName(new_labels.select(key_col))
    return d.distinct()


def incremental_features(
    prev_features: DataFrame,
    new_events: DataFrame,
    labels: DataFrame,
    new_labels: DataFrame | None = None,
    key_col: str = "doc_id",
    time_col: str = "event_time",
) -> DataFrame:
    """Next feature-table state from the previous state + a delta,
    bit-identical to ``compute_features(all_events, all_labels)``
    (tests pin the equivalence) while touching only dirty entities.

    ``prev_features`` must be the output of :func:`compute_features`
    over the prior event set — its non-feature columns ARE the prior
    events, so no second copy of the raw table is needed (features are
    recomputed, never incrementally patched: lag/rolling/session chains
    don't compose across an append, and a recompute of the dirty slice
    is one exchange of delta-bounded data anyway).

    ``labels`` is the full prior label table (as-of needs each dirty
    entity's complete label history, not just the delta);
    ``new_labels`` appends to it and widens the dirty set.
    """
    dirty = dirty_keys(new_events, new_labels, key_col)
    all_labels = (
        labels if new_labels is None else labels.unionByName(new_labels)
    )

    # untouched majority: broadcast anti-join, never shuffled
    untouched = prev_features.join(F.broadcast(dirty), key_col, "left_anti")

    # prior raw events of dirty entities live inside prev_features
    prior_events = prev_features.drop(*FEATURE_COLS).join(
        F.broadcast(dirty), key_col, "left_semi"
    )
    events_dirty = prior_events.unionByName(
        new_events.select(prior_events.columns)
    )
    # label side narrowed to dirty entities too: the as-of's exchange
    # then carries only delta-bounded rows on BOTH sides
    labels_dirty = all_labels.join(F.broadcast(dirty), key_col, "left_semi")

    recomputed = compute_features(events_dirty, labels_dirty, key_col, time_col)
    return untouched.unionByName(recomputed.select(untouched.columns))


def audit_temporal_leakage(
    enriched: DataFrame,
    labels: DataFrame,
    key_col: str = "doc_id",
    time_col: str = "event_time",
    label_time_col: str = "obs_time",
    label_value_col: str = "label_value",
) -> DataFrame:
    """Violation rows proving (or refuting) the north rule's zero-
    temporal-leakage contract on an ACTUAL enriched output: recompute
    the backward as-of expectation independently and return every row
    whose stored label differs — a leaked future label, a stale label,
    or a fabricated one. Empty result = audit passed.

    This is the runtime data-quality gate (run it on a sample or a
    suspect partition); the perturbation-based PROPERTY tests
    (tests/test_window.py::test_zero_temporal_leakage,
    tests/test_asof.py::test_asof_zero_leakage_property) are the
    compile-time complement. Cost: one as-of recompute over the audited
    slice + a key-equi join diff."""
    expect = asof_join(
        enriched.select(key_col, time_col).distinct(),
        labels,
        on=key_col,
        left_time=time_col,
        right_time=label_time_col,
        direction="backward",
    ).withColumnRenamed(label_value_col, "__expected")
    joined = enriched.join(expect, [key_col, time_col], "left")
    stored, expected = F.col(label_value_col), F.col("__expected")
    return joined.filter(
        ~(
            (stored.isNull() & expected.isNull())
            | (stored.isNotNull() & expected.isNotNull() & (stored == expected))
        )
    ).select(
        key_col,
        time_col,
        stored.alias("stored_label"),
        expected.alias("expected_label"),
    )


def incremental_features_from_snapshots(
    spark: SparkSession,
    table,
    prev_features: DataFrame,
    prev_snapshot: int,
    labels: DataFrame,
    key_col: str = "doc_id",
    time_col: str = "event_time",
) -> tuple[DataFrame, dict]:
    """Snapshot-driven backfill: the event delta is read from the
    ManifestTable's manifests — exactly the data files appended since
    ``prev_snapshot`` (sources/manifest_table.py), never a table diff.
    Composes manifest bookkeeping with :func:`incremental_features`:
    at a 0.1% daily append the job reads 0.1% of the fact data plus the
    dirty entities' history, and the untouched majority of the feature
    table is a broadcast anti-join away.

    Requires an append-only history between the snapshots (the
    stats_maintenance contract); raises on a non-append history because
    a silent full diff would hide a 100 TB scan behind this API.
    Returns (next feature table, {"files_scanned", "snapshot"})."""
    cur = table.current_snapshot_id()
    if cur == prev_snapshot:
        return prev_features, {"files_scanned": 0, "snapshot": cur}
    old_paths = {f.path for f in table.files(snapshot=prev_snapshot)}
    cur_files = table.files(snapshot=cur)
    if not old_paths.issubset({f.path for f in cur_files}):
        raise ValueError(
            "non-append history between snapshots "
            f"{prev_snapshot}->{cur}: run a full recompute"
        )
    new_paths = [f.path for f in cur_files if f.path not in old_paths]
    if not new_paths:
        return prev_features, {"files_scanned": 0, "snapshot": cur}
    new_events = spark.read.parquet(*new_paths)
    out = incremental_features(
        prev_features, new_events, labels, None, key_col, time_col
    )
    return out, {"files_scanned": len(new_paths), "snapshot": cur}
