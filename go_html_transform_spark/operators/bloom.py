"""Bloom-filter broadcast pre-filtering: a mergeable bit-array sketch
over a key set (Bloom 1970), built with a ``bit_or`` aggregation and
shipped as ONE folded array row — the pressure-relief valve for the
broadcast joins the pipeline leans on (decontamination eval sets,
boilerplate hot sets, loser-id sets) when the exact key set outgrows a
comfortable broadcast.

Exact-integer by construction: positions come from the engine's shared
affine hash family (sharding._seeded_const), words are 32-bit masks
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
a 1.25 GB bit array versus ~8 GB (plus overhead) for the exact int64
hash set, and the exact verify then touches ~2% of corpus n-grams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_html_transform_spark.operators.dedup import MINHASH_P
from go_html_transform_spark.operators.sharding import _seeded_const

BLOOM_SEEDS = (1001, 1002, 1003)  # one affine position hash per seed

# 1 << b for b in 0..31 as an exact int64 literal array — pyspark's
# shiftleft wants a python-int shift amount, so bit masks come from a
# 32-entry lookup instead (codegen'd element_at, no HOF). Built lazily:
# Column construction needs an active session.


def _bit_masks() -> Column:
    return F.array(*[F.lit(1 << b).cast("long") for b in range(32)])


def _check_m(m_bits: int) -> None:
    # a partial trailing word would be silently dropped by the dense
    # fold, turning missing bits into false NEGATIVES — the one failure
    # a bloom filter must never have
    if m_bits <= 0 or m_bits % 32:
        raise ValueError(f"m_bits must be a positive multiple of 32, got {m_bits}")


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a nonnegative int64 key (exact int64: key
    folds through mod P first, so products stay < 2^38)."""
    _check_m(m_bits)
    out = []
    for seed in BLOOM_SEEDS[:k]:
        a, b = _seeded_const(seed)
        out.append(((key.cast("long") % MINHASH_P) * a + b) % MINHASH_P % m_bits)
    return out


def _positions_sql(key: str, m_bits: int, k: int) -> list[str]:
    out = []
    for seed in BLOOM_SEEDS[:k]:
        a, b = _seeded_const(seed)
        out.append(f"((CAST({key} AS BIGINT) % {MINHASH_P}) * {a} + {b})"
                   f" % {MINHASH_P} % {m_bits}")
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
