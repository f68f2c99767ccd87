"""Boilerplate removal (operators/boilerplate.py) and bigram-LM scoring
(operators/sketches.py): DuckDB parity on clean and dirty fixtures, a
python reference oracle, and the zero-corpus-exchange plan contract."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.operators import boilerplate as BP
from go_html_transform_spark.operators import sketches as SK

# 'nav bar here' repeats in 4 docs (hot at MIN_DOCS=4); 'one two three'
# in 3 (cold). d4 is ALL boilerplate; d5 empty; d6 multi-space + trailing
# partial segment.
CORPUS = [
    ("d0", "nav bar here one two three body text zero alpha"),
    ("d1", "nav bar here one two three other words go here"),
    ("d2", "nav bar here one two three more unique content x"),
    ("d3", "prefix words nav bar here something else entirely y"),
    ("d4", "nav bar here"),
    ("d5", ""),
    ("d6", "  spaced   words  nav bar here tail  "),
]


def py_segments(text: str, n: int = 3) -> list[str]:
    w = [x for x in text.split(" ") if x]
    return [" ".join(w[i : i + n]) for i in range(0, len(w), n)]


def py_remove(corpus, n=3, min_docs=4):
    from collections import Counter

    dfc = Counter()
    for _, t in corpus:
        dfc.update(set(py_segments(t, n)))
    hot = {s for s, c in dfc.items() if c >= min_docs}
    out = {}
    for i, t in corpus:
        segs = py_segments(t, n)
        kept = [s for s in segs if s not in hot]
        out[i] = (len(segs) - len(kept), " ".join(kept))
    return hot, out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id string, text string")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE rel (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO rel VALUES (?, ?)", CORPUS)
    yield con
    con.close()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_segments_parity_and_reassembly(corpus_df, duck):
    got = _rows(
        corpus_df.withColumn("__w", BP._words(F.col("text"))).select(
            "doc_id", BP.segments_col(F.col("__w")).alias("segs")
        )
        .select("doc_id", F.array_join("segs", " ").alias("re"))
    )
    want = sorted(
        (i, " ".join(py_segments(t))) for i, t in CORPUS
    )
    assert got == [tuple(r) for r in want]
    dk = sorted(
        duck.execute(
            f"SELECT doc_id, COALESCE(array_to_string("
            f"{BP.segments_sql(BP.words_sql('text'))}, ' '), '') FROM rel"
        ).fetchall()
    )
    assert got == dk


def test_hot_segments_parity(corpus_df, duck):
    got = _rows(BP.hot_segments(corpus_df))
    want = sorted(
        duck.execute(BP.hot_segments_sql("rel")).fetchall()
    )
    assert got == want
    hot, _ = py_remove(CORPUS)
    assert {s for s, _ in got} == hot == {"nav bar here"}


def test_remove_boilerplate_matches_python_and_duckdb(corpus_df, duck):
    got = _rows(
        BP.remove_boilerplate(corpus_df).select(
            "doc_id", "bp_removed", "text"
        )
    )
    _, ref = py_remove(CORPUS)
    assert got == sorted((i, *ref[i]) for i in ref)
    dk = sorted(
        duck.execute(
            f"WITH {BP.remove_boilerplate_ctes('rel')} "
            "SELECT doc_id, bp_removed, cleaned FROM bp_clean"
        ).fetchall()
    )
    assert got == dk
    by_id = {r[0]: r for r in got}
    assert by_id["d4"] == ("d4", 1, "")  # fully-boilerplate doc
    assert by_id["d5"] == ("d5", 0, "")  # empty doc
    # multi-space input is whitespace-normalized; segmentation is
    # chunk-ALIGNED, so d6's unaligned 'nav bar here' span survives
    assert by_id["d6"][2] == "spaced words nav bar here tail"


def test_remove_boilerplate_out_col_keeps_original(corpus_df):
    out = BP.remove_boilerplate(corpus_df, "text", out_col="clean")
    row = out.filter(F.col("doc_id") == "d0").first()
    assert row["text"] == CORPUS[0][1]
    assert row["clean"] == "one two three body text zero alpha"


def test_remove_boilerplate_corpus_never_exchanges(corpus_df):
    p = (
        BP.remove_boilerplate(corpus_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # hot-set subtree: one hashpartitioning (segment df counts) + the
    # single-row fold; corpus side: broadcast join only — a doc-keyed
    # exchange would show up as a second hashpartitioning
    assert p.count("Exchange hashpartitioning") <= 1, p
    assert "BroadcastNestedLoopJoin" in p, p


# ---------------------------------------------------------------------------
# bigram LM scoring
# ---------------------------------------------------------------------------

DIRTY = [
    ("d0", [1, 2, 3, 1, 2]),
    ("d1", [1, 2]),
    ("d2", [7]),  # no pairs -> drops out
    ("d3", []),
    ("d4", None),
    ("d5", [2, None, 3, 1, 2]),  # NULL dropped BEFORE pairing
]


@pytest.fixture(scope="module")
def lm_df(spark):
    return spark.createDataFrame(DIRTY, "doc_id string, tokens array<int>")


@pytest.fixture(scope="module")
def lm_duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE rel (doc_id VARCHAR, tokens INTEGER[])")
    con.executemany("INSERT INTO rel VALUES (?, ?)", DIRTY)
    yield con
    con.close()


def test_bigram_lm_parity_dirty(lm_df, lm_duck):
    got = _rows(SK.bigram_lm_stats(lm_df, "doc_id"))
    want = sorted(
        tuple(r)
        for r in lm_duck.execute(
            SK.bigram_lm_stats_sql("rel", "doc_id")
        ).fetchall()
    )
    assert got == want
    ids = {r[0] for r in got}
    assert ids == {"d0", "d1", "d5"}  # pairless docs drop on both engines


def test_bigram_lm_self_scoring_semantics(lm_df):
    rows = {r["doc_id"]: r for r in SK.bigram_lm_stats(lm_df).collect()}
    # corpus pairs: (1,2)x3 [d0 twice + d1] + d5's (2,3),(3,1),(1,2)...
    # d1 = single pair (1,2): lm_sum == tf of (1,2) across corpus
    d1 = rows["d1"]
    assert d1["lm_pairs"] == 1 and d1["lm_sum"] == 4
    for r in rows.values():
        assert r["lm_avg"] == r["lm_sum"] / r["lm_pairs"]


def test_bigram_lm_plan_broadcasts_lm(lm_df):
    p = (
        SK.bigram_lm_stats(lm_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
