"""Bloom-filter broadcast pre-filtering: a mergeable bit-array sketch
over a key set (Bloom 1970), built with a ``bit_or`` aggregation and
shipped as ONE folded array row — the pressure-relief valve for the
broadcast joins the pipeline leans on (decontamination eval sets,
boilerplate hot sets, loser-id sets) when the exact key set outgrows a
comfortable broadcast.

Exact-integer by construction: positions come from a TWO-ROUND hash
built on the engine's shared affine family (sharding._seeded_const)
applied to the FULL int64 key — the key splits into (hi = key >> 18,
lo = key & 0x3ffff): lo < 2^18 < P stays INJECTIVE under the mod-P
arithmetic (an 19-bit lo would alias lo = P with lo = 0, making keys
that differ only in an all-ones vs all-zeros low field collide on all
k probes — a deterministic structured collision class outside the FPR
model; with 18 bits a collision needs hi ≡ hi' (mod P), i.e. full-hash
territory); round one mixes (hi, lo) into x, round two derives two
sub-hashes OF x whose composition y * P + z lands in [0, P^2) ~
2.75e11, so bit arrays up to ~2^38 bits are genuinely addressable
(``_check_m`` enforces the cap). The second round is load-bearing, not
belt-and-braces: ``_seeded_const`` is linear in its seed mod P, so any
ONE-round family has constant seed-to-seed differences — and because
P = 2^19 - 1 is ≡ -1 mod every power-of-two m <= 2^19, a one-round
composition (g1 * P + g2) % m collapses to (g2 - g1) % m, i.e. all k
probes of a key land on <= 2 distinct bits (measured FPR 6x designed).
Routing the seed-varying second round through x makes positions
quadratic in seed, restoring independence (pinned by
test_bloom_per_key_positions_are_distinct). Words are 32-bit masks
stored in int64 (no sign games — ``1 << bit`` with bit <= 31 stays
positive in Spark and DuckDB alike), so the whole sketch is
deterministically identical across engines, partitionings and merge
orders — the words table itself is hash-checkable.

Scale shape:

* build: explode k positions per key (narrow), ONE partial-agg'd
  ``bit_or`` exchange keyed on word index; output bounded at
  m_bits/32 rows regardless of key-set size.
* fold: the bounded words table collapses to a single dense
  ``array<long>`` row (collect_list map + sequence fill) — broadcast
  via the same folded-single-row crossJoin pattern as
  boilerplate.hot_segments.
* probe: row-local bit tests against the folded array — zero shuffle,
  zero UDF, whole-stage codegen; survivors (true hits + FPR ~
  (1 - e^(-k*n/m))^k) continue to the EXACT broadcast semi-join, so the
  filter only ever shrinks the exact join's input, never changes its
  answer.

Sizing: 10 bits/key, k=3 gives ~1.7% FPR — at 10^9 eval n-grams that is
a 1.25 GB bit array (10^10 bits, well inside the 2.7e11-bit address
space of the composed position hash) versus ~8 GB (plus overhead) for
the exact int64 hash set, and the exact verify then touches ~2% of
corpus n-grams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_html_transform_spark.operators.dedup import MINHASH_P
from go_html_transform_spark.operators.sharding import _seeded_const

BLOOM_SEEDS = (1001, 1002, 1003)  # one composed position hash per seed
_LO_BITS = 18  # lo < 2^18 < P: injective under mod P (19 would fold lo=P to 0)
_LO_MASK = (1 << _LO_BITS) - 1
_SUB_SEED_OFFSET = 467  # second sub-hash seed; keeps all sub-seeds distinct
# positions live in [0, P^2): the hard addressability ceiling for m_bits
_MAX_M_BITS = MINHASH_P * MINHASH_P

# 1 << b for b in 0..31 as an exact int64 literal array — pyspark's
# shiftleft wants a python-int shift amount, so bit masks come from a
# 32-entry lookup instead (codegen'd element_at, no HOF). Built lazily:
# Column construction needs an active session.


def _bit_masks() -> Column:
    return F.array(*[F.lit(1 << b).cast("long") for b in range(32)])


def _check_m(m_bits: int) -> None:
    # a partial trailing word would be silently dropped by the dense
    # fold, turning missing bits into false NEGATIVES — the one failure
    # a bloom filter must never have; and any m_bits past the position
    # hash's P^2 address space would leave the tail permanently zero,
    # silently concentrating probes in the low bits (FPR -> 1)
    if m_bits <= 0 or m_bits % 32:
        raise ValueError(f"m_bits must be a positive multiple of 32, got {m_bits}")
    if m_bits > _MAX_M_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds the position hash address space "
            f"P^2 = {_MAX_M_BITS}"
        )


def _check_k(k: int) -> None:
    # silently truncating k to len(BLOOM_SEEDS) would deliver a higher
    # FPR than the (1-e^(-kn/m))^k the caller designed for, with no signal
    if not 1 <= k <= len(BLOOM_SEEDS):
        raise ValueError(
            f"k must be in [1, {len(BLOOM_SEEDS)}] (one seed per hash), got {k}"
        )


def _round_consts(seed: int) -> tuple[int, int, int, int, int, int, int]:
    """(a1, a2, b1, a3, b2, a4, b3) for one seed's two-round position
    hash: round one mixes x = (hi*a1 + lo*a2 + b1) % P; round two
    derives y = (x*a3 + b2) % P and z = (x*a4 + b3) % P. All four
    multiplier seeds are disjoint across BLOOM_SEEDS (offset spacing)."""
    a1, b1 = _seeded_const(seed)
    a2, _ = _seeded_const(seed + _SUB_SEED_OFFSET)
    a3, b2 = _seeded_const(seed + 2 * _SUB_SEED_OFFSET)
    a4, b3 = _seeded_const(seed + 3 * _SUB_SEED_OFFSET)
    return a1, a2, b1, a3, b2, a4, b3


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a nonnegative int64 key. The full key is
    hashed — (hi = key >> 18) mod P and (lo = key & 0x3ffff) mix into x
    (every product < 2^38, exact in int64), then two second-round
    hashes of x compose into y * P + z in [0, P^2), so positions cover
    bit arrays up to ~2.7e11 bits with seed-independent probes (see
    module docstring for why one round is not enough)."""
    _check_m(m_bits)
    _check_k(k)
    kl = key.cast("long")
    hi = F.shiftright(kl, _LO_BITS) % MINHASH_P
    lo = kl.bitwiseAND(F.lit(_LO_MASK))

    out = []
    for seed in BLOOM_SEEDS[:k]:
        a1, a2, b1, a3, b2, a4, b3 = _round_consts(seed)
        x = (hi * a1 + lo * a2 + b1) % MINHASH_P
        y = (x * a3 + b2) % MINHASH_P
        z = (x * a4 + b3) % MINHASH_P
        out.append((y * MINHASH_P + z) % m_bits)
    return out


def _positions_sql(key: str, m_bits: int, k: int) -> list[str]:
    _check_m(m_bits)
    _check_k(k)
    kl = f"CAST({key} AS BIGINT)"
    hi = f"(({kl} >> {_LO_BITS}) % {MINHASH_P})"
    lo = f"({kl} & {_LO_MASK})"

    out = []
    for seed in BLOOM_SEEDS[:k]:
        a1, a2, b1, a3, b2, a4, b3 = _round_consts(seed)
        x = f"(({hi} * {a1} + {lo} * {a2} + {b1}) % {MINHASH_P})"
        y = f"(({x} * {a3} + {b2}) % {MINHASH_P})"
        z = f"(({x} * {a4} + {b3}) % {MINHASH_P})"
        out.append(f"(({y} * {MINHASH_P} + {z}) % {m_bits})")
    return out


def _positions_py(key: int, m_bits: int, k: int) -> list[int]:
    """Pure-python twin (tests)."""
    _check_m(m_bits)
    _check_k(k)
    hi = (key >> _LO_BITS) % MINHASH_P
    lo = key & _LO_MASK

    out = []
    for seed in BLOOM_SEEDS[:k]:
        a1, a2, b1, a3, b2, a4, b3 = _round_consts(seed)
        x = (hi * a1 + lo * a2 + b1) % MINHASH_P
        y = (x * a3 + b2) % MINHASH_P
        z = (x * a4 + b3) % MINHASH_P
        out.append((y * MINHASH_P + z) % m_bits)
    return out


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """(word_idx, word): the sparse 32-bit-word bit array over the key
    set. One bit_or exchange; <= m_bits/32 output rows."""
    pos = F.explode(
        F.array(*_positions(F.col(key_col), m_bits, k))
    ).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.expr("pos div 32").cast("int").alias("word_idx"),
            F.element_at(_bit_masks(), (F.col("pos") % 32).cast("int") + 1).alias(
                "__m"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__m").alias("word"))
    )


def bloom_build_sql(
    rel: str, key: str, m_bits: int = 4096, k: int = 3
) -> str:
    """DuckDB twin of ``bloom_build`` (identical positions and words)."""
    ps = ", ".join(_positions_sql(key, m_bits, k))
    return f"""
        SELECT CAST(pos // 32 AS INTEGER) AS word_idx,
               CAST(bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS BIGINT)
                 AS word
        FROM (SELECT unnest([{ps}]) AS pos FROM {rel})
        GROUP BY 1
    """


def bloom_fold(words: DataFrame, m_bits: int = 4096) -> DataFrame:
    """Collapse the sparse words table to ONE row holding the dense
    ``bloom_words array<long>`` (length m_bits/32, zeros filled) — the
    broadcastable at-rest form."""
    _check_m(m_bits)
    nwords = m_bits // 32
    return (
        words.groupBy()
        .agg(
            F.map_from_arrays(
                F.collect_list("word_idx"), F.collect_list("word")
            ).alias("__m")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(nwords - 1)),
                lambda i: F.coalesce(F.element_at(F.col("__m"), i), F.lit(0)),
            ).alias("bloom_words")
        )
    )


def bloom_contains(
    words: Column, key: Column, m_bits: int = 4096, k: int = 3
) -> Column:
    """Row-local membership test against the folded dense array (true
    for every inserted key; false positives at the designed FPR)."""
    cond = F.lit(True)
    for p in _positions(key, m_bits, k):
        # p < m_bits (driver-validated well under 2^50): the floor-div
        # by 32 is double-exact
        word = F.element_at(words, F.floor(p / 32).cast("int") + F.lit(1))
        bit = F.element_at(_bit_masks(), (p % 32).cast("int") + 1)
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_prefilter_contaminated(
    corpus: DataFrame,
    eval_hashes: DataFrame,
    id_col: str = "doc_id",
    hashes_col: str = "ngram_hashes",
    eval_hash_col: str = "h",
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Two-stage contamination counts: the bloom probe (row-local, zero
    shuffle) shrinks the exploded corpus n-gram stream to candidates;
    the exact broadcast semi-join then runs only over survivors.
    Returns one row per doc with >= 1 candidate:
    (id, n_candidates, n_exact) over DISTINCT n-gram hashes —
    n_exact <= n_candidates always; the gap is the realized FPR.
    ``corpus`` must already carry the hash array (decontaminate.
    ngram_hashes); ``eval_hashes`` one row per eval n-gram hash."""
    words = bloom_fold(
        bloom_build(eval_hashes, eval_hash_col, m_bits, k), m_bits
    )
    # per-doc distinct is ROW-LOCAL (array_distinct before the explode,
    # the contaminated_hits trick) and the bloom probe is row-local too,
    # so candidates reach the per-doc count without any corpus-sized
    # exchange — only matches + false positives ever shuffle
    cand = (
        corpus.select(
            F.col(id_col),
            F.explode(F.array_distinct(F.col(hashes_col))).alias("__h"),
        )
        .crossJoin(F.broadcast(words))
        .filter(bloom_contains(F.col("bloom_words"), F.col("__h"), m_bits, k))
        .select(id_col, "__h")
    )
    # ONE pass over the candidate stream: the exact check rides as a
    # broadcast LEFT join hit flag, so candidates and exact matches
    # aggregate together (a left_semi + separate count would evaluate
    # the corpus-sized candidate subtree twice)
    hits = F.broadcast(
        eval_hashes.select(F.col(eval_hash_col).alias("__h"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        cand.join(hits, "__h", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_candidates"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_exact"),
        )
    )
