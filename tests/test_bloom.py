"""Bloom-filter pre-filtering: no false negatives, bounded FPR,
cross-engine word determinism, pre-filter+exact-verify composition."""

import random

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.operators import bloom as BL
from go_html_transform_spark.operators import decontaminate as DC
from go_html_transform_spark.operators.dedup import MINHASH_P
from go_html_transform_spark.operators.sharding import _seeded_const


def _py_positions(h, m_bits=4096, k=3):
    out = []
    for seed in BL.BLOOM_SEEDS[:k]:
        a, b = _seeded_const(seed)
        out.append((h % MINHASH_P) * a % MINHASH_P * 1 % MINHASH_P)  # placeholder
    return out


def _py_words(keys, m_bits=4096, k=3):
    words = {}
    for h in keys:
        for seed in BL.BLOOM_SEEDS[:k]:
            a, b = _seeded_const(seed)
            p = ((h % MINHASH_P) * a + b) % MINHASH_P % m_bits
            words[p // 32] = words.get(p // 32, 0) | (1 << (p % 32))
    return words


def _py_contains(words, h, m_bits=4096, k=3):
    for seed in BL.BLOOM_SEEDS[:k]:
        a, b = _seeded_const(seed)
        p = ((h % MINHASH_P) * a + b) % MINHASH_P % m_bits
        if not words.get(p // 32, 0) & (1 << (p % 32)):
            return False
    return True


@pytest.fixture(scope="module")
def key_sets():
    rng = random.Random(31)
    inserted = sorted(rng.sample(range(MINHASH_P * MINHASH_P), 300))
    probes = sorted(rng.sample(range(MINHASH_P * MINHASH_P), 500))
    return inserted, probes


def test_bloom_words_match_python_and_partitioning(spark, key_sets):
    inserted, _ = key_sets
    keys = spark.createDataFrame([(h,) for h in inserted], "h long")
    got = {
        r.word_idx: r.word for r in BL.bloom_build(keys, "h").collect()
    }
    assert got == _py_words(inserted)
    got7 = {
        r.word_idx: r.word
        for r in BL.bloom_build(keys.repartition(7), "h").collect()
    }
    assert got7 == got
    assert len(got) <= 4096 // 32


def test_bloom_no_false_negatives_and_bounded_fpr(spark, key_sets):
    inserted, probes = key_sets
    keys = spark.createDataFrame([(h,) for h in inserted], "h long")
    words = BL.bloom_fold(BL.bloom_build(keys, "h"))
    probe_df = spark.createDataFrame(
        [(h,) for h in sorted(set(inserted) | set(probes))], "h long"
    )
    hits = {
        r.h
        for r in probe_df.crossJoin(F.broadcast(words))
        .filter(BL.bloom_contains(F.col("bloom_words"), F.col("h")))
        .collect()
    }
    assert set(inserted) <= hits  # a bloom filter NEVER misses a member
    pywords = _py_words(inserted)
    for h in sorted(set(probes) - set(inserted)):
        assert (h in hits) == _py_contains(pywords, h)
    outside = set(probes) - set(inserted)
    fpr = len(hits & outside) / len(outside)
    # 300 keys * 3 bits in 4096 -> (1-e^-900/4096)^3 ~ 0.8%; allow slack
    assert fpr < 0.05, fpr


def test_bloom_fold_dense_array(spark, key_sets):
    inserted, _ = key_sets
    keys = spark.createDataFrame([(h,) for h in inserted], "h long")
    row = BL.bloom_fold(BL.bloom_build(keys, "h")).collect()[0]
    dense = list(row.bloom_words)
    assert len(dense) == 4096 // 32
    py = _py_words(inserted)
    for i, w in enumerate(dense):
        assert w == py.get(i, 0)


def test_bloom_prefilter_composes_with_exact_verify(spark):
    """n_exact counts true distinct contaminated n-grams (python-set
    parity); candidates always dominate; eval docs self-flag fully."""
    rng = random.Random(9)
    rows = []
    for i in range(40):
        rows.append((f"d{i:06d}", [rng.randrange(1024) for _ in range(30)]))
    # doc 3 copies doc 0's tokens -> shares every 8-gram
    rows[3] = ("d000003", list(rows[0][1]))
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    corpus = df.select(
        "doc_id", DC.ngram_hashes(F.col("tokens"), 8).alias("ngram_hashes")
    )
    ev = (
        corpus.filter(F.col("doc_id") == "d000000")
        .select(F.explode("ngram_hashes").alias("h"))
        .distinct()
    )
    got = {
        r.doc_id: (r.n_candidates, r.n_exact)
        for r in BL.bloom_prefilter_contaminated(corpus, ev).collect()
    }
    ev_set = {r.h for r in ev.collect()}
    doc_hashes = {
        r.doc_id: set(r.ngram_hashes) for r in corpus.collect()
    }
    for did, (nc, ne) in got.items():
        assert ne <= nc
        assert ne == len(doc_hashes[did] & ev_set), did
    # every truly contaminated doc must appear (no false negatives)
    for did, hs in doc_hashes.items():
        if hs & ev_set:
            assert did in got
    assert got["d000000"][1] == len(ev_set)
    assert got["d000003"][1] == len(ev_set)


def test_bloom_rejects_partial_word_m_bits(spark):
    """m_bits not divisible by 32 would silently drop the trailing
    partial word in the dense fold — false negatives. Fail fast."""
    keys = spark.createDataFrame([(1,)], "h long")
    with pytest.raises(ValueError, match="multiple of 32"):
        BL.bloom_build(keys, "h", m_bits=1000)
    with pytest.raises(ValueError, match="multiple of 32"):
        BL.bloom_fold(BL.bloom_build(keys, "h"), m_bits=1000)
