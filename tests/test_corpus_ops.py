"""Corpus-composition operators: deterministic sampling / source mixing
(operators/sampling.py), sequence packing (operators/packing.py), and
benchmark decontamination (operators/decontaminate.py).

Each op is checked three ways where applicable: semantic unit tests,
layout-independence (repartition/shuffle must not change any decision),
and strict DuckDB parity through the driver's dtype-sensitive pandas
path (the _strict pattern of tests/test_oracle_fuzz.py)."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.operators import decontaminate as DC
from go_html_transform_spark.operators import packing as PK
from go_html_transform_spark.operators import sampling as SA
from go_html_transform_spark.operators.sharding import assign_shards, assign_shards_sql

SEED = 20260817


def _strict(df, duck_rows, key="id"):
    got = df.toPandas().sort_values(key).reset_index(drop=True)
    want = duck_rows.df().sort_values(key).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a = [str(x) for x in got[c].tolist()]
        b = [str(x) for x in want[c].tolist()]
        assert a == b, (c, [(x, y) for x, y in zip(a, b) if x != y][:5])


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _doc_rows(n=400):
    rng = random.Random(SEED)
    sources = ["web", "wiki", "code"]
    return [
        (
            i,
            sources[rng.randrange(3)],
            [rng.randrange(1024) for _ in range(rng.randrange(0, 40))],
        )
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def corpus(spark, duck):
    rows = _doc_rows()
    df = spark.createDataFrame(
        [(i, s, t, len(t)) for i, s, t in rows],
        "id long, source string, tokens array<int>, n_tok int",
    )
    duck.execute(
        "CREATE OR REPLACE TABLE corpus (id BIGINT, source VARCHAR,"
        " tokens INTEGER[], n_tok INTEGER)"
    )
    duck.executemany(
        "INSERT INTO corpus VALUES (?, ?, ?, ?)",
        [(i, s, t, len(t)) for i, s, t in rows],
    )
    return df


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_sample_rate_and_determinism(spark, corpus):
    kept = SA.sample_deterministic(corpus, F.col("id"), 250_000, seed=3)
    ids1 = {r.id for r in kept.select("id").collect()}
    # layout independence: decisions survive any repartition
    ids2 = {
        r.id
        for r in SA.sample_deterministic(
            corpus.repartition(13), F.col("id"), 250_000, seed=3
        )
        .select("id")
        .collect()
    }
    assert ids1 == ids2
    assert 0.15 < len(ids1) / 400 < 0.35  # ~25% +- sampling noise
    # monotone in rate: raising the rate only adds rows
    more = {
        r.id
        for r in SA.sample_deterministic(corpus, F.col("id"), 500_000, seed=3)
        .select("id")
        .collect()
    }
    assert ids1 <= more
    # different seed -> different (overlapping ~ rate^2) subset
    other = {
        r.id
        for r in SA.sample_deterministic(corpus, F.col("id"), 250_000, seed=4)
        .select("id")
        .collect()
    }
    assert ids1 != other


def test_sample_flag_duckdb_parity(spark, corpus, duck):
    eng = corpus.select(
        "id", SA.sample_flag(F.col("id"), 123_456, seed=9).alias("keep")
    )
    ora = duck.sql(
        f"SELECT id, {SA.sample_flag_sql('id', 123_456, seed=9)} AS keep"
        " FROM corpus ORDER BY id"
    )
    _strict(eng, ora)


def test_stratified_sample_parity_and_rates(spark, corpus, duck):
    rates = {"web": 100_000, "wiki": 1_000_000, "code": 0}
    kept = SA.stratified_sample(corpus, F.col("id"), "source", rates, seed=5)
    got = {(r.id, r.source) for r in kept.select("id", "source").collect()}
    assert all(s != "code" for _, s in got)
    n_wiki = sum(1 for r in corpus.collect() if r.source == "wiki")
    assert sum(1 for _, s in got if s == "wiki") == n_wiki  # rate 1.0 keeps all
    pred = SA.stratified_sample_sql("id", "source", rates, seed=5)
    ora = duck.sql(
        f"SELECT id, source FROM corpus WHERE {pred} ORDER BY id"
    )
    _strict(kept.select("id", "source"), ora)


def test_sample_flag_production_rate(spark):
    # xxhash64 path: rate honored on a key range (no P-residue classes)
    df = spark.range(0, 20_000)
    kept = df.filter(SA.sample_flag_production(F.col("id"), 100_000, seed=1))
    frac = kept.count() / 20_000
    assert 0.08 < frac < 0.12


def test_mix_weights_to_rates():
    counts = {"web": 1000, "code": 100, "wiki": 100}
    rates = SA.mix_weights_to_rates(counts, {"web": 0.5, "code": 0.3, "wiki": 0.2})
    # scarcest-relative stratum (code: 100/0.3) binds -> keeps 100%
    assert rates["code"] == SA.PPM
    # web trimmed to (100/0.3)*0.5/1000
    assert abs(rates["web"] - round(100 / 0.3 * 0.5 / 1000 * SA.PPM)) <= 1
    assert rates["wiki"] == round(100 / 0.3 * 0.2 / 100 * SA.PPM)
    # zero-weight and missing strata keep nothing
    assert SA.mix_weights_to_rates(counts, {"web": 0, "code": 1})["web"] == 0
    assert SA.mix_weights_to_rates({}, {"web": 1}) == {"web": 0}


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

CTX = 64


@pytest.fixture(scope="module")
def packed(spark, corpus):
    sharded = assign_shards(corpus, F.col("id"), 4)
    return PK.pack_assign(sharded, F.col("id"), "n_tok", CTX), sharded


def test_pack_assign_is_gapless_per_shard(packed):
    assigned, _ = packed
    rows = assigned.collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.tok_before)
        expect = 0
        for r in docs:
            # head-to-tail: no gaps, no overlaps
            assert r.tok_before == expect
            assert r.pack_id == r.tok_before // CTX
            assert r.pack_offset == r.tok_before % CTX
            expect += r.n_tok


def test_pack_assign_layout_independent(spark, packed):
    assigned, sharded = packed
    again = PK.pack_assign(
        sharded.repartition(17), F.col("id"), "n_tok", CTX
    )
    a = {(r.id, r.pack_id, r.pack_offset) for r in assigned.collect()}
    b = {(r.id, r.pack_id, r.pack_offset) for r in again.collect()}
    assert a == b


def test_pack_chunks_cover_documents_exactly(packed):
    assigned, _ = packed
    chunks = PK.pack_chunks(assigned, "n_tok", CTX).collect()
    per_doc: dict[int, list] = {}
    for c in chunks:
        assert 0 <= c.doc_begin < c.doc_end <= c.n_tok
        assert 0 <= c.pack_begin < CTX
        # chunk fits inside its pack
        assert c.pack_begin + (c.doc_end - c.doc_begin) <= CTX
        per_doc.setdefault(c.id, []).append(c)
    docs = {r.id: r for r in assigned.collect()}
    for doc_id, r in docs.items():
        cs = sorted(per_doc.get(doc_id, []), key=lambda c: c.doc_begin)
        if r.n_tok == 0:
            assert cs == []
            continue
        # chunks tile [0, n_tok) without gap or overlap
        assert cs[0].doc_begin == 0 and cs[-1].doc_end == r.n_tok
        for prev, nxt in zip(cs, cs[1:]):
            assert prev.doc_end == nxt.doc_begin
            # successive chunks land in successive packs starting at 0
            assert nxt.pack_begin == 0
        # every pack slot [pack_id*CTX + pack_begin + len) is consistent
        # with the document's global placement
        for c in cs:
            assert c.pack_id * CTX + c.pack_begin == r.tok_before + c.doc_begin


def test_pack_full_packs_have_no_holes(packed):
    """Every pack except the last of each shard is filled to CTX."""
    assigned, _ = packed
    chunks = PK.pack_chunks(assigned, "n_tok", CTX)
    fill = (
        chunks.groupBy("shard", "pack_id")
        .agg(F.sum(F.col("doc_end") - F.col("doc_begin")).alias("filled"))
        .collect()
    )
    by_shard: dict[int, dict[int, int]] = {}
    for r in fill:
        by_shard.setdefault(r.shard, {})[r.pack_id] = r.filled
    for shard, packs in by_shard.items():
        last = max(packs)
        assert set(packs) == set(range(last + 1))  # contiguous pack ids
        for pid, filled in packs.items():
            assert filled == CTX if pid < last else filled <= CTX


def test_pack_assign_duckdb_parity(spark, corpus, duck):
    sharded = assign_shards(corpus, F.col("id"), 4)
    eng = PK.pack_assign(sharded, F.col("id"), "n_tok", CTX).select(
        "id", "tok_before", "pack_id", "pack_offset"
    )
    duck.execute(
        "CREATE OR REPLACE TABLE doc AS SELECT *, "
        + assign_shards_sql("id", 4)
        + " AS shard FROM corpus"
    )
    ora = duck.sql(
        "SELECT id, tok_before, pack_id, pack_offset FROM ("
        + PK.pack_assign_sql("id", "n_tok", CTX)
        + ") ORDER BY id"
    )
    _strict(eng, ora)


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

NGRAM = 5


@pytest.fixture(scope="module")
def eval_set(spark, corpus):
    # eval set = 20 excerpts of corpus docs (guaranteed contamination)
    # + 20 fresh random docs (guaranteed novel n-grams)
    rng = random.Random(SEED + 1)
    rows = _doc_rows()
    excerpts = []
    long_docs = [r for r in rows if len(r[2]) >= NGRAM + 4]
    for i in range(20):
        _, _, toks = long_docs[rng.randrange(len(long_docs))]
        s = rng.randrange(0, len(toks) - NGRAM)
        excerpts.append((1000 + i, toks[s : s + NGRAM + 3]))
    fresh = [
        (2000 + i, [rng.randrange(1024, 4096) for _ in range(NGRAM + 5)])
        for i in range(20)
    ]
    return spark.createDataFrame(
        excerpts + fresh, "id long, tokens array<int>"
    )


def test_ngram_hashes_duckdb_parity(spark, corpus, duck):
    eng = corpus.select(
        "id",
        F.concat_ws(",", DC.ngram_hashes(F.col("tokens"), NGRAM)).alias("ng"),
    )
    # DuckDB array_to_string([]) is NULL where Spark concat_ws gives ''
    ora = duck.sql(
        "SELECT id, COALESCE(array_to_string("
        f"{DC.ngram_hashes_sql('tokens', NGRAM)}, ','), '')"
        " AS ng FROM corpus ORDER BY id"
    )
    _strict(eng, ora)


def test_ngram_hashes_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 3, 4, 5]), (2, [5, 4, 3, 2, 1])],
        "id long, tokens array<int>",
    )
    h = {
        r.id: r.ng
        for r in df.select(
            "id", DC.ngram_hashes(F.col("tokens"), NGRAM)[0].alias("ng")
        ).collect()
    }
    assert h[1] != h[2]


def test_decontaminate_drops_exactly_overlapping_docs(spark, corpus, eval_set):
    flagged = DC.decontaminate(
        corpus, eval_set, "id", n=NGRAM, mode="flag"
    )
    rows = {r.id: r.contaminated for r in flagged.collect()}
    # independent oracle: python set intersection on raw n-grams
    eval_ngrams = set()
    for r in eval_set.collect():
        t = r.tokens
        for i in range(len(t) - NGRAM + 1):
            eval_ngrams.add(tuple(t[i : i + NGRAM]))
    for r in corpus.collect():
        t = r.tokens
        doc_ngrams = {
            tuple(t[i : i + NGRAM]) for i in range(len(t) - NGRAM + 1)
        }
        assert rows[r.id] == bool(doc_ngrams & eval_ngrams), r.id
    # drop mode = flag mode's clean rows
    dropped = DC.decontaminate(corpus, eval_set, "id", n=NGRAM, mode="drop")
    assert {r.id for r in dropped.select("id").collect()} == {
        i for i, c in rows.items() if not c
    }
    # some contamination and some survivors, or the test is vacuous
    assert any(rows.values()) and not all(rows.values())


def test_contamination_counts(spark, corpus, eval_set):
    counts = {
        r.id: r.n_contaminated
        for r in DC.contamination_counts(
            corpus, eval_set, "id", n=NGRAM
        ).collect()
    }
    assert counts and all(v >= 1 for v in counts.values())


def test_decontaminate_no_corpus_exchange(spark, corpus, eval_set):
    """The corpus side must reach the semi/anti joins without an
    Exchange: eval set broadcasts, corpus never shuffles."""
    plan = DC.decontaminate(
        corpus, eval_set, "id", n=NGRAM, mode="drop"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_eval_contamination_report_matches_bruteforce(spark, corpus, eval_set):
    """Eval-side report (the model-card number): per eval doc, the
    fraction of its distinct n-grams found anywhere in the corpus —
    against a python set-intersection oracle on raw token tuples."""
    rep = {
        r.id: r
        for r in DC.eval_contamination_report(
            corpus, eval_set, "id", n=NGRAM
        ).collect()
    }
    corpus_ngrams = set()
    for r in corpus.collect():
        t = r.tokens
        corpus_ngrams.update(
            tuple(t[i : i + NGRAM]) for i in range(len(t) - NGRAM + 1)
        )
    for r in eval_set.collect():
        t = r.tokens
        ngs = {tuple(t[i : i + NGRAM]) for i in range(len(t) - NGRAM + 1)}
        found = len(ngs & corpus_ngrams)
        row = rep[r.id]
        assert row.n_ngrams == len(ngs) and row.n_found == found, r.id
        assert row.contamination_ppm == (
            found * 1_000_000 // len(ngs) if ngs else 0
        )
    # excerpts are verbatim corpus slices -> fully contaminated; the
    # fresh docs use a disjoint token range -> clean
    assert all(rep[1000 + i].contaminated for i in range(20))
    assert not any(rep[2000 + i].contaminated for i in range(20))


def test_eval_contamination_short_docs_reported_zero(spark, corpus):
    """Eval docs shorter than n have no n-grams: reported (not dropped)
    with n_ngrams = 0, ppm = 0, contaminated = False."""
    ev = spark.createDataFrame(
        [(1, [1, 2]), (2, [])], "id long, tokens array<int>"
    )
    rows = {
        r.id: r
        for r in DC.eval_contamination_report(
            corpus, ev, "id", n=NGRAM
        ).collect()
    }
    assert set(rows) == {1, 2}
    for i in (1, 2):
        assert rows[i].n_ngrams == 0
        assert rows[i].contamination_ppm == 0
        assert not rows[i].contaminated


def test_eval_contamination_report_duckdb_parity(spark, corpus, eval_set, duck):
    eng = DC.eval_contamination_report(corpus, eval_set, "id", n=NGRAM)
    duck.execute(
        "CREATE OR REPLACE TABLE evalset (id BIGINT, tokens INTEGER[])"
    )
    duck.executemany(
        "INSERT INTO evalset VALUES (?, ?)",
        [(r.id, list(r.tokens)) for r in eval_set.collect()],
    )
    ora = duck.sql(
        DC.eval_contamination_report_sql("corpus", "evalset", "id", n=NGRAM)
    )
    _strict(eng, ora)


def test_eval_contamination_no_corpus_exchange(spark, corpus, eval_set):
    """The corpus side must reach the broadcast semi-join unshuffled;
    the only hash exchanges operate on the matched minority (bounded by
    |eval n-grams|) and the per-eval-doc aggregate."""
    plan = (
        DC.eval_contamination_report(corpus, eval_set, "id", n=NGRAM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_assign_split_disjoint_exhaustive_stable(spark):
    """train/val/test assignment: every key gets exactly one label
    (CASE is disjoint+exhaustive), proportions track the ppm knobs, the
    assignment is layout-independent, and changing the seed reshuffles."""
    from go_html_transform_spark.operators import sampling as SAM

    df = spark.range(0, 20000).select(F.col("id").alias("doc_key"))
    out = df.select(
        "doc_key",
        SAM.assign_split(F.col("doc_key"), 50_000, 50_000, seed=1).alias("s"),
    )
    counts = {r["s"]: r["n"] for r in
              out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 20000
    # 5% +- 1% absolute for each holdout at n=20k
    for k in ("val", "test"):
        assert abs(counts[k] / 20000 - 0.05) < 0.01, counts
    # layout independence: same labels after a repartition+sort shuffle
    relabeled = (
        df.repartition(17, "doc_key")
        .sortWithinPartitions(F.desc("doc_key"))
        .select(
            "doc_key",
            SAM.assign_split(F.col("doc_key"), 50_000, 50_000, seed=1).alias("s"),
        )
    )
    a = {r.doc_key: r.s for r in out.collect()}
    b = {r.doc_key: r.s for r in relabeled.collect()}
    assert a == b
    # seed sensitivity: a different seed must move some keys
    c = {
        r.doc_key: r.s
        for r in df.select(
            "doc_key",
            SAM.assign_split(F.col("doc_key"), 50_000, 50_000, seed=2).alias("s"),
        ).collect()
    }
    assert a != c
    # DuckDB twin parity
    import duckdb

    duck = duckdb.connect()
    duck.execute("CREATE TABLE k AS SELECT range AS doc_key FROM range(20000)")
    ora = dict(duck.sql(
        f"SELECT doc_key, {SAM.assign_split_sql('doc_key', 50000, 50000, seed=1)}"
        f" FROM k"
    ).fetchall())
    assert a == ora


# ---------------------------------------------------------------------------
# sliding-window document chunking (packing.chunk_documents)
# ---------------------------------------------------------------------------


def _py_chunks(tokens, window, stride, min_len=1):
    n = len(tokens)
    out = []
    for i, b in enumerate(range(0, max(n, 1), stride)):
        if b >= n:
            break
        c = tokens[b : b + window]
        if i > 0 and len(c) < min_len:
            continue
        out.append((i, b, c))
    return out


def test_chunk_documents_tiling_covers_exactly(spark, corpus):
    """stride == window: chunks tile the document — concatenating them
    in chunk_idx order reproduces the token array; empty docs vanish."""
    out = PK.chunk_documents(corpus, window=7).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.id, []).append(r)
    src = {r.id: r.tokens for r in corpus.collect()}
    for i, toks in src.items():
        if not toks:
            assert i not in by_doc
            continue
        rows = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        assert [r.chunk_begin for r in rows] == [7 * k for k in range(len(rows))]
        cat = [t for r in rows for t in r.chunk_tokens]
        assert cat == toks
        assert all(r.chunk_n_tok == len(r.chunk_tokens) for r in rows)


@pytest.mark.parametrize("window,stride,min_len", [(8, 5, 1), (8, 5, 4), (4, 4, 2), (6, 9, 1)])
def test_chunk_documents_matches_python(spark, corpus, window, stride, min_len):
    """Overlap, gap (stride > window) and short-tail-drop semantics all
    match the plain-python reference; chunk 0 always survives min_len."""
    out = PK.chunk_documents(
        corpus, window=window, stride=stride, min_len=min_len
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.id, []).append((r.chunk_idx, r.chunk_begin, list(r.chunk_tokens)))
    src = {r.id: list(r.tokens) for r in corpus.collect()}
    for i, toks in src.items():
        want = _py_chunks(toks, window, stride, min_len)
        assert sorted(got.get(i, [])) == [(a, b, c) for a, b, c in want], i


def test_chunk_documents_duckdb_parity(spark, corpus, duck):
    eng = PK.chunk_documents(corpus, window=8, stride=5, min_len=4).select(
        "id", "chunk_idx", "chunk_begin", "chunk_tokens"
    )
    ora = duck.sql(
        "SELECT id, chunk_idx, chunk_begin, chunk_tokens FROM ("
        + PK.chunk_documents_sql("corpus", window=8, stride=5, min_len=4)
        + ") ORDER BY id, chunk_idx"
    )
    got = eng.toPandas().sort_values(["id", "chunk_idx"]).reset_index(drop=True)
    want = ora.df().sort_values(["id", "chunk_idx"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in got.columns:
        a = [str(list(x)) if hasattr(x, "__len__") and not isinstance(x, str) else str(x) for x in got[c]]
        b = [str(list(x)) if hasattr(x, "__len__") and not isinstance(x, str) else str(x) for x in want[c]]
        assert a == b, c


def test_chunk_documents_no_shuffle_no_python(spark, corpus):
    out = PK.chunk_documents(corpus, window=8, stride=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_chunk_documents_arg_validation(spark, corpus):
    with pytest.raises(ValueError, match="window"):
        PK.chunk_documents(corpus, window=0)
    with pytest.raises(ValueError, match="stride"):
        PK.chunk_documents(corpus, window=4, stride=0)
    with pytest.raises(ValueError, match="collision"):
        PK.chunk_documents(corpus.withColumn("chunk_idx", F.lit(1)), window=4)


def test_eval_contamination_report_duplicate_eval_ids_pool_once(spark, corpus):
    """ADVICE r4: rows sharing an eval_id (a chunked eval doc) must
    yield ONE report row pooling their n-grams — not one duplicated
    pooled row per input row; DuckDB twin in lockstep."""
    import duckdb

    tok = [r.tokens for r in corpus.limit(2).collect()]
    # two rows share id 1; one unique id 2
    rows = [(1, tok[0]), (1, tok[1]), (2, tok[0])]
    ev = spark.createDataFrame(rows, "id long, tokens array<int>")
    rep = DC.eval_contamination_report(corpus, ev, "id", n=NGRAM)
    got = {r.id: r for r in rep.collect()}
    assert set(got) == {1, 2} and rep.count() == 2

    con = duckdb.connect()
    import pandas as pd  # noqa: F401

    con.register("corpus_pd", corpus.toPandas())
    con.register("evalset_pd", ev.toPandas())
    con.execute("CREATE VIEW corpus AS SELECT * FROM corpus_pd")
    con.execute("CREATE VIEW evalset AS SELECT * FROM evalset_pd")
    sql = DC.eval_contamination_report_sql("corpus", "evalset", "id", n=NGRAM)
    oracle = {
        r[0]: r
        for r in con.execute(sql).fetchall()
    }
    assert set(oracle) == {1, 2}
    for k in got:
        assert (
            got[k].n_ngrams,
            got[k].n_found,
            got[k].contamination_ppm,
            got[k].contaminated,
        ) == tuple(oracle[k][1:5])
