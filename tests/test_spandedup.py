"""Substring-level exact span dedup (operators/spandedup.py): canonical
keep-first semantics vs a Python brute-force oracle, the DuckDB SQL twin,
plan hygiene, and dirty-shape edges."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.operators import spandedup as SP

N = 8

ROWS = [
    ("d1", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),  # canonical holder of 1..8
    ("d2", [1, 2, 3, 4, 5, 6, 7, 8, 99, 98]),  # loses span at pos 0
    ("d3", [7] * 11),  # internal repeats: pos 0 canonical, 1-3 removed
    ("d4", [50, 51, 52]),  # shorter than n: untouched
    ("d5", []),  # empty: untouched
]


def brute_force(rows, n):
    """Reference semantics in plain Python: hash every n-window by VALUE
    (tuples — collisions out of scope at fixture size), keep the
    (id, pos)-smallest occurrence of each duplicated value, drop tokens
    covered by any removed span."""
    occ = {}
    for doc, toks in rows:
        for p in range(max(0, len(toks) - n + 1)):
            occ.setdefault(tuple(toks[p : p + n]), []).append((doc, p))
    removed = {}
    for locs in occ.values():
        if len(locs) >= 2:
            for doc, p in sorted(locs)[1:]:
                removed.setdefault(doc, set()).add(p)
    out = {}
    for doc, toks in rows:
        starts = sorted(removed.get(doc, ()))
        kept = [
            t
            for i, t in enumerate(toks)
            if not any(s <= i < s + n for s in starts)
        ]
        out[doc] = (starts, kept)
    return out


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(ROWS, "doc_id string, tokens array<int>")


def test_fixture_matches_brute_force(spark, fixture_df):
    want = brute_force(ROWS, N)
    got = SP.remove_duplicated_spans(fixture_df, n=N).collect()
    assert len(got) == len(ROWS)
    for r in got:
        starts, kept = want[r["doc_id"]]
        assert list(r["dup_starts"]) == starts, r["doc_id"]
        assert list(r["tokens_span_deduped"]) == kept, r["doc_id"]
        assert r["n_spans_removed"] == len(starts)


def test_duckdb_twin_matches_engine(spark, fixture_df):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE doc AS SELECT * FROM (VALUES "
        + ",".join(f"('{d}', {t})" for d, t in ROWS)
        + ") v(doc_id, tokens)"
    )
    duck = {
        r[0]: r[1:]
        for r in con.execute(
            f"SELECT * FROM ({SP.span_dedup_stats_sql('doc', n=N)})"
        ).fetchall()
    }
    eng = SP.remove_duplicated_spans(fixture_df, n=N).filter(
        F.col("n_spans_removed") > 0
    )
    eng_rows = {
        r["doc_id"]: (
            r["n_spans_removed"],
            len(r["tokens_span_deduped"]),
            sum(r["tokens_span_deduped"]),
        )
        for r in eng.collect()
    }
    assert duck == eng_rows


def test_randomized_vs_brute_force(spark):
    """Random corpus with planted duplicated spans (plus clean docs) —
    the copy mechanism guarantees real cross-doc duplicates."""
    rng = random.Random(20260817)
    rows = []
    for i in range(60):
        toks = [rng.randrange(40) for _ in range(rng.randrange(0, 25))]
        rows.append((f"r{i:03d}", toks))
    # plant verbatim copies of spans from earlier docs into later docs
    for i in range(60, 80):
        src = rows[rng.randrange(40)][1]
        toks = [rng.randrange(40) for _ in range(5)]
        if len(src) >= N:
            p = rng.randrange(len(src) - N + 1)
            toks += src[p : p + N]
        toks += [rng.randrange(40) for _ in range(5)]
        rows.append((f"r{i:03d}", toks))
    want = brute_force(rows, N)
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = SP.remove_duplicated_spans(df, n=N).collect()
    n_removed = 0
    for r in got:
        starts, kept = want[r["doc_id"]]
        assert list(r["dup_starts"]) == starts, r["doc_id"]
        assert list(r["tokens_span_deduped"]) == kept, r["doc_id"]
        n_removed += len(starts)
    assert n_removed > 0  # non-vacuous: the planted copies were caught


def test_null_token_elements_handle_like_oracle(spark):
    """NULL elements hash as 0 (decontaminate contract) in BOTH engines;
    removal still drops the covered positions."""
    rows = [
        ("n1", [1, None, 3, 4, 5, 6, 7, 8]),
        ("n2", [1, None, 3, 4, 5, 6, 7, 8, 9]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {
        r["doc_id"]: (list(r["dup_starts"]), list(r["tokens_span_deduped"]))
        for r in SP.remove_duplicated_spans(df, n=N).collect()
    }
    assert got["n1"] == ([], [1, None, 3, 4, 5, 6, 7, 8])
    assert got["n2"] == ([0], [9])
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE doc AS SELECT 'n1' AS doc_id, [1, NULL, 3, 4, 5, 6, 7, 8] AS tokens "
        "UNION ALL SELECT 'n2', [1, NULL, 3, 4, 5, 6, 7, 8, 9]"
    )
    duck = con.execute(
        f"SELECT * FROM ({SP.span_dedup_stats_sql('doc', n=N)})"
    ).fetchall()
    assert duck == [("n2", 1, 1, 9)]


def test_plan_corpus_not_shuffled_before_final_join(spark, fixture_df):
    """The heavy lifting happens on narrow (id, pos, hash) rows, and the
    hot-hash path must be skew-robust: the per-hash (count, canonical)
    table comes from a PARTIAL-AGGREGATED groupBy (map-side combine — a
    span repeated 10^9 times collapses before the exchange) and the
    non-canonical marking is an equi-join (AQE-skew-splittable), with NO
    Window and NO per-partition sort of the occurrence set anywhere."""
    starts = SP.duplicated_span_starts(fixture_df, n=N)
    plan = starts._jdf.queryExecution().executedPlan().toString()
    assert "span_hash" in plan
    assert "Window" not in plan, plan
    # partial (map-side) agg feeds the span_hash exchange
    assert "partial" in plan and "min(" in plan, plan
    # span_hash agg + occ-side join shuffle + doc_id groupBy — never more
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    # no Python evaluation anywhere in the operator
    full = SP.remove_duplicated_spans(fixture_df, n=N)
    fplan = full._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in fplan and "ArrowEvalPython" not in fplan
