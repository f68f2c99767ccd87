"""BPE tokenizer training: sequential-reference parity (batch=1),
batched-round invariants, apply semantics on runs, determinism across
partitionings."""

import random

import pytest

from go_html_transform_spark.operators import bpe as B


def _py_count(corpus):
    counts = {}
    for toks in corpus:
        for i in range(len(toks) - 1):
            p = (toks[i], toks[i + 1])
            counts[p] = counts.get(p, 0) + 1
    return counts


def _py_apply_one(toks, a, b, new):
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(new)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _py_bpe(corpus, num_merges, next_id, min_count=2):
    corpus = [list(t) for t in corpus]
    merges = []
    for _ in range(num_merges):
        counts = _py_count(corpus)
        counts = {p: c for p, c in counts.items() if c >= min_count}
        if not counts:
            break
        (a, b), _ = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, next_id))
        corpus = [_py_apply_one(t, a, b, next_id) for t in corpus]
        next_id += 1
    return merges, corpus


@pytest.fixture(scope="module")
def corpus_rows():
    rng = random.Random(5)
    rows = []
    for i in range(60):
        n = rng.randrange(0, 30)
        rows.append((i, [rng.randrange(12) for _ in range(n)]))
    rows.append((60, [3, 3, 3, 3, 3]))  # run: overlap semantics
    rows.append((61, []))
    return rows


@pytest.fixture(scope="module")
def corpus(spark, corpus_rows):
    return spark.createDataFrame(corpus_rows, "id long, tokens array<int>")


def test_bpe_batch1_matches_sequential_reference(spark, corpus, corpus_rows):
    ref_merges, ref_corpus = _py_bpe([t for _, t in corpus_rows], 6, next_id=12)
    merges, out = B.bpe_train(corpus, 6, batch=1, next_id=12)
    assert merges == ref_merges
    got = {r.id: list(r.tokens) for r in out.collect()}
    for (i, _), ref in zip(corpus_rows, ref_corpus):
        assert got[i] == ref, i


def test_bpe_apply_run_semantics(spark):
    df = spark.createDataFrame([(0, [3, 3, 3, 3, 3])], "id long, tokens array<int>")
    out = B.bpe_apply(df, [(3, 3, 99)]).collect()[0].tokens
    assert list(out) == [99, 99, 3]  # leftmost-first non-overlapping


def test_bpe_batched_round_invariants(spark, corpus, corpus_rows):
    """batch=4: chosen pairs within a round never share a token id; the
    returned merge list applied sequentially in python reproduces the
    returned corpus exactly; merge count honored."""
    sizes: list[int] = []
    merges, out = B.bpe_train(corpus, 8, batch=4, next_id=12, round_sizes=sizes)
    assert len(merges) == 8
    assert sum(sizes) == 8 and all(1 <= s <= 4 for s in sizes)
    # non-interacting within each count round
    start = 0
    for s in sizes:
        seen = set()
        for a, b, _ in merges[start:start + s]:
            assert a not in seen and b not in seen
            seen.update((a, b))
        start += s
    ref = {
        i: B._apply_merges_row(list(t), merges) for i, t in corpus_rows
    }
    got = {r.id: list(r.tokens) for r in out.collect()}
    assert got == ref


def test_bpe_deterministic_across_partitionings(spark, corpus):
    m1, _ = B.bpe_train(corpus, 5, batch=2, next_id=12)
    m2, _ = B.bpe_train(corpus.repartition(7), 5, batch=2, next_id=12)
    assert m1 == m2


def test_bpe_stops_when_no_pair_reaches_min_count(spark):
    df = spark.createDataFrame(
        [(0, [1, 2]), (1, [3, 4]), (2, [5])], "id long, tokens array<int>"
    )
    merges, out = B.bpe_train(df, 10, min_count=2)
    assert merges == []
    assert {tuple(r.tokens) for r in out.collect()} == {(1, 2), (3, 4), (5,)}


def test_bpe_train_then_apply_held_out(spark, corpus):
    """A trained table tokenizes held-out text with the same python
    semantics (priority order, leftmost-first)."""
    merges, _ = B.bpe_train(corpus, 4, batch=1, next_id=12)
    held = spark.createDataFrame(
        [(0, [0, 1, 2, 3, 3, 4, 5, 0, 1])], "id long, tokens array<int>"
    )
    got = list(B.bpe_apply(held, merges).collect()[0].tokens)
    assert got == B._apply_merges_row([0, 1, 2, 3, 3, 4, 5, 0, 1], merges)


def test_bpe_apply_preserves_null_token_arrays(spark):
    """NULL arrays pass through apply as NULL (pair_counts tolerates
    them, so the apply pass must not crash the job)."""
    df = spark.createDataFrame(
        [(0, [3, 3]), (1, None)], "id long, tokens array<int>"
    )
    got = {r.id: r.tokens for r in B.bpe_apply(df, [(3, 3, 99)]).collect()}
    assert list(got[0]) == [99]
    assert got[1] is None


@pytest.fixture(scope="module")
def separated_corpus(spark):
    """Pair frequencies separated far beyond 50%-sampling noise: any
    hash sample of ~half the rows preserves the full-corpus pair
    ranking, so sample-trained merges must equal full-corpus merges."""
    rows = []
    i = 0
    for toks, reps in (
        ([1, 2, 1, 2, 1, 2, 1, 2], 400),
        ([3, 4, 3, 4], 150),
        ([5, 6, 5, 6], 50),
    ):
        for _ in range(reps):
            rows.append((i, list(toks)))
            i += 1
    return spark.createDataFrame(rows, "id long, tokens array<int>")


def test_bpe_sampled_matches_full_on_separated_fixture(spark, separated_corpus):
    """The scale path (train on a deterministic hash sample, apply to
    the full corpus) learns the SAME merge table as full-corpus
    training when pair frequencies are separated beyond sampling noise
    — the fidelity contract of bpe_train_sampled."""
    full_merges, _ = B.bpe_train(separated_corpus, 4, batch=1)
    sizes: list[int] = []
    s_merges, out = B.bpe_train_sampled(
        separated_corpus,
        4,
        key_cols=["id"],
        sample_rows=350,  # ~half the 700 rows
        batch=1,
        round_sizes=sizes,
    )
    assert s_merges == full_merges
    assert sum(sizes) == len(s_merges)
    # and the corpus output is exactly bpe_apply(full corpus, merges)
    ref = {
        r.id: (None if r.tokens is None else B._apply_merges_row(list(r.tokens), s_merges))
        for r in separated_corpus.collect()
    }
    got = {r.id: list(r.tokens) for r in out.collect()}
    assert got == ref


def test_bpe_sampled_is_exact_when_sample_covers_corpus(spark, corpus, corpus_rows):
    """sample_rows >= corpus rows degrades to exact bpe_train (same
    merges, same next_id allocation from the corpus max)."""
    ref_merges, _ = B.bpe_train(corpus, 5, batch=1, next_id=12)
    s_merges, _ = B.bpe_train_sampled(
        corpus, 5, key_cols=["id"], sample_rows=10_000, batch=1
    )
    assert s_merges == ref_merges


def test_bpe_sampled_layout_independent(spark, separated_corpus):
    """The hash-threshold sample is a pure function of the key, so the
    learned table is identical under any partitioning."""
    m1, _ = B.bpe_train_sampled(
        separated_corpus, 3, key_cols=["id"], sample_rows=350,
        apply_to_corpus=False,
    )
    m2, _ = B.bpe_train_sampled(
        separated_corpus.repartition(13), 3, key_cols=["id"], sample_rows=350,
        apply_to_corpus=False,
    )
    assert m1 == m2


def test_sample_corpus_threshold_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, [i % 5]) for i in range(1000)], "id long, tokens array<int>"
    )
    s = B.sample_corpus(df, 200, ["id"])
    n = s.count()
    assert 100 <= n <= 320  # ~200 expected, binomial noise
    ids1 = sorted(r.id for r in s.collect())
    ids2 = sorted(r.id for r in B.sample_corpus(df.repartition(7), 200, ["id"]).collect())
    assert ids1 == ids2
    # sample of a superset corpus is a superset-consistent keep set:
    # membership is a pure function of (key, threshold)
    assert B.sample_corpus(df, 2000, ["id"]).count() == 1000


def test_sample_threshold_tracks_tiny_fractions():
    # 1e5 rows from 1e12: a ppm threshold floors at 1e-6 (10x the asked
    # fraction — and a 10x-oversized sample per count round); the 2^40
    # denominator tracks the asked fraction to <1%.
    thr, den = B.sample_threshold(100_000, 10**12)
    assert abs(thr / den - 1e-7) / 1e-7 < 0.01
    # never zero, even past the design scale
    thr, den = B.sample_threshold(1, 10**15)
    assert thr == 1


def test_bpe_train_tolerates_null_arrays(spark):
    df = spark.createDataFrame(
        [(0, [1, 2, 1, 2]), (1, None), (2, [1, 2])],
        "id long, tokens array<int>",
    )
    merges, out = B.bpe_train(df, 1, next_id=10)
    assert merges == [(1, 2, 10)]
    got = {r.id: r.tokens for r in out.collect()}
    assert list(got[0]) == [10, 10] and got[1] is None and list(got[2]) == [10]
