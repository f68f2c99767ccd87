"""BM25 retrieval + DSIR importance selection: python-reference parity,
integer-path exactness, plan shapes (broadcast joins, no corpus sort)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.operators import retrieval as R
from go_html_transform_spark.operators import selection as SEL


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(23)
    rows = []
    for i in range(30):
        n = rng.randrange(3, 60)
        toks = [rng.randrange(40) for _ in range(n)]
        rows.append((f"d{i:06d}", toks, "en" if i % 3 else "de"))
    rows.append(("d000030", [7], "en"))  # too short for a bigram
    rows.append(("d000031", [], "en"))  # empty
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, lang string"
    )


QUERIES = [(0, [1, 2, 3]), (1, [5, 17]), (2, [39])]


def _py_bm25(rows, queries, k1=1.2, b=0.75):
    """Textbook reference, plain python."""
    n = len(rows)
    total = sum(len(t) for _, t, _ in rows)
    avgdl = total / n
    df = {}
    for _, toks, _ in rows:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, qtoks in queries:
        scores = {}
        for did, toks, _ in rows:
            s = 0.0
            for qt in qtoks:
                tf = toks.count(qt)
                if tf == 0:
                    continue
                idf = math.log(1.0 + (n - df[qt] + 0.5) / (df[qt] + 0.5))
                sat = tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * len(toks) / avgdl)
                )
                s += idf * sat
            if s > 0:
                scores[did] = s
        out[qid] = scores
    return out


def test_bm25_double_matches_python_reference(spark, docs):
    rows = [(r.doc_id, list(r.tokens), r.lang) for r in docs.collect()]
    ref = _py_bm25(rows, QUERIES)
    got = R.bm25_topk(docs, QUERIES, topk=1000).collect()
    for r in got:
        assert abs(r.score - ref[r.query_id][r.doc_id]) < 1e-9
    # ranks follow (score desc, doc asc) and are dense from 1
    for qid, scores in ref.items():
        want = sorted(scores, key=lambda d: (-scores[d], d))
        have = [r.doc_id for r in sorted(
            (x for x in got if x.query_id == qid), key=lambda x: x.rank
        )]
        assert have == want


def _py_bm25_int(rows, queries, topk):
    """Integer-exact reference of the quantized path (python bigints)."""
    n = len(rows)
    total = sum(len(t) for _, t, _ in rows)
    df = {}
    for _, toks, _ in rows:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    avgdl_ppm = (total * 1_000_000) // n
    out = []
    for qid, qtoks in queries:
        scores = {}
        for did, toks, _ in rows:
            s = 0
            dl = len(toks)
            for qt in qtoks:
                tf = toks.count(qt)
                if tf == 0:
                    continue
                idf = min(((n - df[qt]) * 1_000_000) // (df[qt] + 1), R.IDF_PPM_CAP)
                tfc = min(tf, R.TF_SAT_CAP)
                ln_ppm = 250000 + (dl * 750_000_000_000) // avgdl_ppm
                den = tfc * 1_000_000 + (12 * ln_ppm) // 10
                sat = (tfc * 2_200_000 * 1_000_000) // den
                s += (idf * sat) // 1_000_000_000
            if s:
                scores[did] = s
        ranked = sorted(scores, key=lambda d: (-scores[d], d))[:topk]
        out.extend((qid, d, scores[d], i + 1) for i, d in enumerate(ranked))
    return sorted(out)


def test_bm25_int_exact_vs_python_bigints(spark, docs):
    rows = [(r.doc_id, list(r.tokens), r.lang) for r in docs.collect()]
    ref = _py_bm25_int(rows, QUERIES, topk=7)
    got = sorted(
        (r.query_id, r.doc_id, r.score_milli, r.rank)
        for r in R.bm25_int_topk(docs, QUERIES, topk=7).collect()
    )
    assert got == ref


def test_bm25_plan_broadcasts_queries_and_df(spark, docs):
    """The probe set and the vocab-bounded df dimension must broadcast;
    the only corpus exchange is the postings partial-agg."""
    plan = (
        R.bm25_int_topk(docs, QUERIES, topk=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def _py_dsir(rows, target_langs=("en",)):
    B = SEL.DSIR_BUCKETS
    ct, cr = {}, {}
    feats = {}
    for did, toks, lang in rows:
        fs = [
            (toks[i] * SEL.DSIR_A + toks[i + 1] * SEL.DSIR_B)
            % SEL.DSIR_P % B
            for i in range(len(toks) - 1)
        ]
        feats[did] = fs
        for f in fs:
            cr[f] = cr.get(f, 0) + 1
            if lang in target_langs:
                ct[f] = ct.get(f, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    term = {
        f: round(
            (math.log((ct.get(f, 0) + 1.0) / (tt + B))
             - math.log((cr[f] + 1.0) / (tr + B))) * 1000.0
        )
        for f in cr
    }
    return {
        did: sum(term[f] for f in fs) for did, fs in feats.items()
    }


def test_dsir_weights_match_python_reference(spark, docs):
    rows = [(r.doc_id, list(r.tokens), r.lang) for r in docs.collect()]
    ref = _py_dsir(rows)
    got = {
        r.doc_id: (r.weight_milli, r.selected)
        for r in SEL.dsir_weights(docs, F.col("lang") == "en").collect()
    }
    assert set(got) == {d for d, _, _ in rows}  # every doc present
    for did, toks, _ in rows:
        w = ref.get(did, 0) if len(toks) >= 2 else 0
        assert got[did] == (w, 1 if w > 0 else 0), did
    # the likelihood-ratio test separates: target-language docs dominate
    # the selected set on this fixture (en docs reuse en bigram mass)
    sel_langs = [
        lang for did, toks, lang in rows if got[did][1] == 1
    ]
    assert sel_langs.count("en") > len(sel_langs) / 2


def test_dsir_logratio_table_bounded_and_broadcast(spark, docs):
    tab = SEL.dsir_logratio_table(docs, F.col("lang") == "en")
    assert tab.count() <= SEL.DSIR_BUCKETS
    plan = (
        SEL.dsir_weights(docs, F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_bm25_int_terms_fit_int64_within_documented_bounds():
    """Property (pure python, no Spark): every ENGINE-SIDE intermediate
    of the quantized BM25 stays inside int64 across the whole documented
    domain — N < 9.2e12 docs, dl <= 1.2e7 tokens, tf <= dl, df <= N,
    avgdl in [1, 1e4]. (avgdl_ppm itself is computed driver-side in
    python bigints, so T * 1e6 never enters an engine int64 — writing
    the first version of this test surfaced that the original
    750000*dl*N formulation overflowed at N=1e12, dl=1e4.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    I64 = 2**63 - 1

    @settings(max_examples=300, deadline=None)
    @given(
        n=st.integers(1, 9_200_000_000_000),
        avgdl=st.integers(1, 10_000),
        dl=st.integers(1, 12_000_000),
        tf_frac=st.floats(0.0, 1.0),
        df_frac=st.floats(0.0, 1.0),
    )
    def check(n, avgdl, dl, tf_frac, df_frac):
        t = n * avgdl
        tf = max(1, int(tf_frac * dl))
        df = max(1, int(df_frac * n))
        idf_num = (n - df) * 1_000_000
        assert 0 <= idf_num <= I64
        idf = min(idf_num // (df + 1), R.IDF_PPM_CAP)
        avgdl_ppm = (t * 1_000_000) // n  # driver-side bigint
        ln_num = dl * 750_000_000_000
        assert ln_num <= I64  # engine-side product, whole domain
        ln_ppm = 250_000 + ln_num // avgdl_ppm
        tfc = min(tf, R.TF_SAT_CAP)  # review finding: unclamped tf
        # overflowed sat_num from ~4.19e6 occurrences up
        den = tfc * 1_000_000 + (12 * ln_ppm) // 10
        assert den <= I64
        sat_num = tfc * 2_200_000 * 1_000_000
        assert sat_num <= I64
        sat = sat_num // den
        assert sat <= 2_200_000
        assert idf * sat <= I64
        assert (idf * sat) // 1_000_000_000 >= 0

    check()


def test_bm25_duplicate_probe_tokens_count_once(spark, docs):
    """A duplicated token inside one probe list must not double the
    nonlinear saturation term — dedup happens on ingestion, both
    engines (review finding: Spark summed the term twice while the SQL
    twin folded the duplicate into tf)."""
    once = sorted(
        (r.query_id, r.doc_id, r.score_milli)
        for r in R.bm25_int_topk(docs, [(0, [5, 17])], topk=50).collect()
    )
    dup = sorted(
        (r.query_id, r.doc_id, r.score_milli)
        for r in R.bm25_int_topk(docs, [(0, [5, 5, 17])], topk=50).collect()
    )
    assert once == dup
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW doc AS SELECT * FROM (VALUES "
        + ", ".join(
            f"('{r.doc_id}', {list(r.tokens)})" for r in docs.collect()
        )
        + ") AS t(doc_id, tokens)"
    )
    sql = R.bm25_int_sql([(0, [5, 5, 17])], topk=50)
    oracle = sorted(
        (r[0], r[1], r[2]) for r in con.execute(sql).fetchall()
    )
    assert oracle == dup


def test_bm25_empty_corpus_returns_empty(spark):
    empty = spark.createDataFrame([], "doc_id string, tokens array<int>")
    assert R.bm25_int_topk(empty, [(0, [1])]).count() == 0
    assert R.bm25_topk(empty, [(0, [1])]).count() == 0


def test_bm25_empty_corpus_schema_mirrors_id_type(spark):
    """The empty branch must return the SAME id type as the non-empty
    path (it used to hardcode string), so unions of the two branches and
    schema-sensitive consumers never diverge on non-string ids."""
    empty_long = spark.createDataFrame([], "doc_id bigint, tokens array<int>")
    got = R.bm25_int_topk(empty_long, [(0, [1])])
    assert got.schema["doc_id"].dataType.simpleString() == "bigint"
    got2 = R.bm25_topk(empty_long, [(0, [1])])
    assert got2.schema["doc_id"].dataType.simpleString() == "bigint"
    # union with a non-empty result of the same corpus type must not raise
    nonempty = spark.createDataFrame(
        [(7, [1, 2, 1])], "doc_id bigint, tokens array<int>"
    )
    got.unionByName(R.bm25_int_topk(nonempty, [(0, [1])])).collect()


def test_bm25_index_at_rest_prunes_and_matches(spark, docs, tmp_path):
    """The at-rest inverted index returns EXACTLY the in-memory
    integer-path result while reading a strict subset of the postings
    files (manifest range-prune on token footer stats)."""
    from go_html_transform_spark.sources.manifest_table import ManifestTable

    table = ManifestTable(str(tmp_path / "bm25_idx"))
    snap, n_docs, total = R.bm25_write_index(table, docs, n_files=8)
    assert n_docs == docs.count()

    queries = [(0, [1, 2]), (1, [39])]
    got_df, files_read, files_total = R.bm25_topk_indexed(
        table, spark, queries, n_docs, total, topk=7
    )
    got = sorted(
        (r.query_id, r.doc_id, r.score_milli, r.rank) for r in got_df.collect()
    )
    want = sorted(
        (r.query_id, r.doc_id, r.score_milli, r.rank)
        for r in R.bm25_int_topk(docs, queries, topk=7).collect()
    )
    assert got == want
    assert 0 < files_read < files_total  # the prune did real work

    # a probe for a token outside the vocabulary: the range stats
    # exclude it entirely (beyond every file's token_max), so ZERO
    # files are read and the result is empty — not a crash
    empty, nread, _ = R.bm25_topk_indexed(
        table, spark, [(0, [999999])], n_docs, total
    )
    assert empty.count() == 0
    assert nread == 0


def test_bm25_int_sql_empty_queries_parse(spark):
    """bm25_int_sql([]) must parse in DuckDB and return zero rows
    (review finding: `VALUES ()` was a parser error)."""
    import duckdb

    assert duckdb.sql(R.bm25_int_sql([])).fetchall() == []
    assert duckdb.sql(R.bm25_int_sql([(0, [])])).fetchall() == []
