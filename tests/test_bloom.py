"""Bloom-filter pre-filtering: no false negatives, bounded FPR,
cross-engine word determinism, pre-filter+exact-verify composition."""

import random

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.operators import bloom as BL
from go_html_transform_spark.operators import decontaminate as DC
from go_html_transform_spark.operators.dedup import MINHASH_P
from go_html_transform_spark.operators.sharding import _seeded_const


def _py_words(keys, m_bits=4096, k=3):
    words = {}
    for h in keys:
        for p in BL._positions_py(h, m_bits, k):
            words[p // 32] = words.get(p // 32, 0) | (1 << (p % 32))
    return words


def _py_contains(words, h, m_bits=4096, k=3):
    return all(
        words.get(p // 32, 0) & (1 << (p % 32))
        for p in BL._positions_py(h, m_bits, k)
    )


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


def test_bloom_rejects_bad_k_and_oversized_m(spark):
    """k beyond the seed list used to silently truncate to 3 hashes
    (higher FPR than designed, no signal); m_bits past the P^2 position
    address space would leave the tail permanently zero. Both fail fast."""
    keys = spark.createDataFrame([(1,)], "h long")
    with pytest.raises(ValueError, match="one seed per hash"):
        BL.bloom_build(keys, "h", k=4)
    with pytest.raises(ValueError, match="one seed per hash"):
        BL.bloom_build(keys, "h", k=0)
    too_big = (MINHASH_P * MINHASH_P // 32 + 1) * 32
    with pytest.raises(ValueError, match="address space"):
        BL.bloom_build(keys, "h", m_bits=too_big)
    with pytest.raises(ValueError, match="one seed per hash"):
        BL._positions_sql("h", 4096, 5)


def test_bloom_positions_use_full_key_width(spark):
    """The round-3 hash reduced keys mod P before hashing, capping every
    position below P = 524287 — no bit above 2^19 could ever be set and
    m_bits > P silently degraded to FPR ~ 1. The widened hash must (a)
    place bits above P for a large array and (b) distinguish keys that
    collide mod P."""
    m_bits = 1 << 21  # 2 Mbit: 4x the old ceiling
    rng = random.Random(7)
    keys = [rng.randrange(MINHASH_P * MINHASH_P) for _ in range(2000)]
    pos = [p for h in keys for p in BL._positions_py(h, m_bits, 3)]
    assert max(pos) > MINHASH_P, "no position ever lands above the old P cap"
    # spread: upper half of the array must receive its fair share
    upper = sum(p >= m_bits // 2 for p in pos)
    assert 0.4 < upper / len(pos) < 0.6
    # keys equal mod P must hash differently (full key width used)
    h1, h2 = 123, 123 + MINHASH_P
    assert BL._positions_py(h1, m_bits, 3) != BL._positions_py(h2, m_bits, 3)
    # per-key probe independence: a one-round composed hash collapsed to
    # <=2 distinct positions per key at power-of-two m (P = 2^19-1 is -1
    # mod 2^k so (g1*P+g2)%m = (g2-g1)%m, constant across seeds because
    # _seeded_const is linear in seed) — the two-round hash must give 3
    # distinct positions for essentially every key at both small and
    # large m
    for m in (4096, m_bits):
        dup = sum(len(set(BL._positions_py(h, m, 3))) < 3 for h in keys)
        assert dup <= 2, f"m={m}: {dup}/2000 keys have duplicate probe bits"
    # spark twin agrees with python twin on the widened family
    df = spark.createDataFrame([(h,) for h in keys[:64]], "h long")
    got = df.select(
        "h", F.array(*BL._positions(F.col("h"), m_bits, 3)).alias("ps")
    ).collect()
    for r in got:
        assert list(r.ps) == BL._positions_py(r.h, m_bits, 3)


def test_bloom_low_field_not_folded_mod_p(spark):
    """A 19-bit low split folded lo = P = 0x7ffff to 0 mod P, so keys
    differing ONLY in an all-ones vs all-zeros low field probed
    identical bits for every seed — a deterministic structured
    collision class outside the FPR model. With the 18-bit split
    (lo < 2^18 < P, injective) those pairs must differ."""
    for m in (4096, 1 << 21):
        for h in (1, 7, 12345, 99999):
            k1 = h << 19
            k2 = (h << 19) | 0x7FFFF
            assert BL._positions_py(k1, m, 3) != BL._positions_py(k2, m, 3), (
                f"structured collision at h={h}, m={m}"
            )
