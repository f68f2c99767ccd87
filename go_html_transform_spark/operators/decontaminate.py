"""Benchmark decontamination — remove (or flag) training documents that
share an n-gram with an evaluation set, the standard pretraining hygiene
step (n = 13 words in the GPT-3/PaLM recipe; here n-grams over token
ids).

* ``ngram_hashes`` — array<bigint> of dual-affine rolling hashes of every
  n-gram of ``tokens`` (exact int64 arithmetic, DuckDB twin below).
* ``contamination_counts`` — per-document count of distinct n-grams that
  appear in the eval set.
* ``decontaminate`` — drop every contaminated document (``mode="drop"``)
  or just add the boolean ``contaminated`` flag (``mode="flag"``).

Scale shape: the eval set is benchmark-sized (10^3-10^6 n-grams), so its
distinct hash set BROADCASTS; the corpus side is explode -> broadcast
LEFT SEMI join -> per-doc count — the corpus itself is NEVER shuffled
(the explode is narrow, the semi-join is map-side, the count groups on
the exploded minority that matched). The final removal is a broadcast
anti-join of the corpus against the (small) contaminated-id set. Total:
zero corpus exchanges.

Hash collisions: two independent affine hashes (family of
operators/sharding.py) composed into ~2^38 distinct values; a collision
falsely flags a document (never falsely clears one under the dual-hash
assumption's FPR ~ |eval| / 2^38 per n-gram) — the conservative
direction for decontamination.

Reference analogue: none (engine-added training-data hygiene, alongside
operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_html_transform_spark.operators.dedup import MINHASH_P
from go_html_transform_spark.operators.sharding import _seeded_const

_SEED_A, _SEED_B = 7_777_777, 13_131_313
_BASE_A, _BASE_B = 31, 1021  # distinct bases -> linearly independent sums


def _roll_terms(n: int, seed: int, base: int) -> tuple[int, int, list[int]]:
    """(a, b, weights): hash(g) = (b + sum_i a*w_i*g_i) mod P with
    w_i = base^(n-1-i) mod P — order-sensitive, exact in int64
    (each term < P * P < 2^38, n terms < 2^43).

    The two composed hashes MUST use different ``base`` values: with a
    shared base the affine ``a`` factors out and both hashes become
    functions of the same weighted sum mod P — the pair would collide
    whenever that single sum collides (~|corpus-ngrams|x|eval|/P events,
    observed in testing), defeating the dual-hash FPR claim."""
    a, b = _seeded_const(seed)
    weights = [pow(base, n - 1 - i, MINHASH_P) for i in range(n)]
    return a, b, weights


def _ngram_hash_one(
    tokens: Column, i: Column, n: int, seed: int, base: int
) -> Column:
    # `tokens` is the MATERIALIZED array column — capturing a computed
    # expression here would re-evaluate it per element (the interpreted-
    # HOF O(n^2) trap, plans/rules.py:363); NULL elements coalesce to 0
    # post-index instead.
    a, b, w = _roll_terms(n, seed, base)
    acc = F.lit(b).cast("long")
    for k in range(n):
        elem = F.coalesce(
            F.element_at(tokens, i + (k + 1)).cast("long"), F.lit(0).cast("long")
        )
        term = (elem % MINHASH_P * ((a * w[k]) % MINHASH_P)) % MINHASH_P
        acc = (acc + term) % MINHASH_P
    return acc


def ngram_hashes(tokens: Column, n: int = 13) -> Column:
    """array<bigint> of combined dual-hash values, one per n-gram;
    empty when n_tok < n. NULL token elements hash as 0 (both engines)."""
    sz = F.size(tokens)
    idx = F.when(sz >= n, F.sequence(F.lit(0), sz - n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: _ngram_hash_one(tokens, i, n, _SEED_A, _BASE_A) * MINHASH_P
        + _ngram_hash_one(tokens, i, n, _SEED_B, _BASE_B),
    )


def ngram_hashes_sql(tokens: str = "tokens", n: int = 13) -> str:
    """DuckDB twin (1-based list indexing; identical arithmetic)."""

    def one(seed: int, base: int) -> str:
        a, b, w = _roll_terms(n, seed, base)
        terms = " + ".join(
            f"(COALESCE(CAST({tokens}[i + {k + 1}] AS BIGINT), 0)"
            f" % {MINHASH_P} * {(a * w[k]) % MINHASH_P}) % {MINHASH_P}"
            for k in range(n)
        )
        return f"(({b} + {terms}) % {MINHASH_P})"

    body = f"{one(_SEED_A, _BASE_A)} * {MINHASH_P} + {one(_SEED_B, _BASE_B)}"
    return (
        f"CASE WHEN len({tokens}) >= {n} THEN "
        f"[{body} FOR i IN range(0, len({tokens}) - {n} + 1)] "
        f"ELSE [] END"
    )


def eval_ngram_set(
    eval_df: DataFrame,
    tokens_col: str = "tokens",
    n: int = 13,
    distinct: bool = True,
) -> DataFrame:
    """n-gram hashes of the evaluation set — the broadcast side.
    ``distinct`` only shrinks the broadcast (it costs the plan's sole
    hash exchange); a LEFT SEMI probe never duplicates left rows, so the
    matching semantics are identical either way."""
    out = eval_df.select(
        F.explode(ngram_hashes(F.col(tokens_col), n)).alias("__ng")
    )
    return out.distinct() if distinct else out


def contaminated_hits(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    tokens_col: str = "tokens",
    n: int = 13,
) -> DataFrame:
    """One row per (document, matched distinct n-gram) — NOT de-duplicated
    by document, so it reaches the caller without any exchange: explode
    (narrow) -> broadcast semi-join (map-side). Anti-join semantics don't
    need the right side distinct, so ``decontaminate(mode="drop")``
    consumes this directly."""
    ngrams = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngram_hashes(F.col(tokens_col), n))).alias(
            "__ng"
        ),
    )
    return ngrams.join(
        F.broadcast(eval_ngram_set(eval_df, tokens_col, n, distinct=False)),
        "__ng",
        "left_semi",
    )


def contamination_counts(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    tokens_col: str = "tokens",
    n: int = 13,
) -> DataFrame:
    """(id, n_contaminated) for every document with >= 1 eval n-gram.
    The only exchange groups the matched MINORITY, never the corpus."""
    return (
        contaminated_hits(df, eval_df, id_col, tokens_col, n)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )


def eval_contamination_report(
    df: DataFrame,
    eval_df: DataFrame,
    eval_id_col: str,
    tokens_col: str = "tokens",
    n: int = 13,
    threshold_ppm: int = 500_000,
) -> DataFrame:
    """The EVAL-side direction of decontamination — the model-card
    number: per evaluation document, what fraction of ITS distinct
    n-grams appears anywhere in the training corpus.

    Returns ONE row per distinct eval_id (rows sharing an id — e.g. a
    chunked eval doc — pool their distinct-per-row n-gram counts into a
    single report row) with (eval_id, n_ngrams, n_found,
    contamination_ppm, contaminated): exact-integer ppm fraction (0 for
    docs shorter than ``n``, which are reported, not dropped) and the standard
    threshold flag (``>= threshold_ppm`` of n-grams found ⇒ treat the
    eval doc as contaminated — GPT-3 appendix-C style reporting).

    Scale shape (the corpus is the 10^12-doc side): the eval n-gram set
    is benchmark-sized, so it BROADCASTS as the probe; the corpus
    explodes n-gram hashes (narrow) into a broadcast LEFT SEMI join —
    map-side, zero corpus exchanges — and only the matched minority
    (bounded by |eval n-grams|) reaches the distinct + the per-doc
    count. Collisions overcount contamination (~|corpus-ngrams|/2^38
    per eval n-gram) — the conservative direction, same contract as
    ``decontaminate``."""
    ev = eval_df.select(
        F.col(eval_id_col),
        F.array_distinct(ngram_hashes(F.col(tokens_col), n)).alias("__ngs"),
    )
    # explode_outer: a row whose doc is shorter than n (empty __ngs)
    # still yields one NULL-n-gram row, so the per-id groupBy below
    # covers EVERY distinct eval id in one pass — no re-attach join, and
    # duplicate eval_id values (a chunked eval doc) pool into exactly
    # one report row instead of one duplicated pooled row per input row
    ev_ng = ev.select(eval_id_col, F.explode_outer("__ngs").alias("__ng"))
    probe = ev_ng.filter(F.col("__ng").isNotNull()).select("__ng").distinct()
    corpus_ng = df.select(
        F.explode(ngram_hashes(F.col(tokens_col), n)).alias("__ng")
    )
    found = (
        corpus_ng.join(F.broadcast(probe), "__ng", "left_semi")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per = (
        ev_ng.join(F.broadcast(found), "__ng", "left")
        .groupBy(eval_id_col)
        .agg(
            # count(__ng) skips the NULL sentinel rows -> 0 for short docs
            F.count("__ng").cast("long").alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_found"),
        )
    )
    n_ngrams = F.col("n_ngrams")
    ppm = F.when(
        n_ngrams > 0, F.expr("n_found * 1000000 div n_ngrams")
    ).otherwise(F.lit(0).cast("long"))
    return per.select(
        F.col(eval_id_col),
        "n_ngrams",
        "n_found",
        ppm.alias("contamination_ppm"),
        ((n_ngrams > 0) & (ppm >= threshold_ppm)).alias("contaminated"),
    )


def eval_contamination_report_sql(
    corpus_rel: str,
    eval_rel: str,
    eval_id_col: str,
    tokens_col: str = "tokens",
    n: int = 13,
    threshold_ppm: int = 500_000,
) -> str:
    """DuckDB twin of :func:`eval_contamination_report` (same dual-hash
    family via ``ngram_hashes_sql``, same distinct-per-doc counting,
    same exact-integer ppm)."""
    hs = ngram_hashes_sql(tokens_col, n)
    return f"""
    WITH ecr_ev AS (
        SELECT {eval_id_col}, list_distinct({hs}) AS ngs FROM {eval_rel}
    ),
    ecr_evng AS (
        -- explode_outer twin: empty ngs -> one NULL sentinel row, so the
        -- per-id GROUP BY covers every distinct id (short docs included)
        SELECT {eval_id_col},
               unnest(CASE WHEN len(ngs) = 0
                           THEN [CAST(NULL AS BIGINT)] ELSE ngs END) AS ng
        FROM ecr_ev
    ),
    ecr_found AS (
        SELECT DISTINCT ng
        FROM (SELECT unnest({hs}) AS ng FROM {corpus_rel})
        WHERE ng IN (SELECT ng FROM ecr_evng WHERE ng IS NOT NULL)
    )
    SELECT {eval_id_col},
           n_ngrams,
           n_found,
           CASE WHEN n_ngrams > 0
                THEN n_found * 1000000 // n_ngrams
                ELSE 0 END AS contamination_ppm,
           (n_ngrams > 0 AND
            CASE WHEN n_ngrams > 0
                 THEN n_found * 1000000 // n_ngrams
                 ELSE 0 END >= {int(threshold_ppm)}) AS contaminated
    FROM (
        SELECT {eval_id_col},
               CAST(COUNT(ng) AS BIGINT) AS n_ngrams,
               CAST(COALESCE(SUM(CASE WHEN ng IN (SELECT ng FROM ecr_found)
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_found
        FROM ecr_evng GROUP BY {eval_id_col}
    )
    """


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    tokens_col: str = "tokens",
    n: int = 13,
    mode: str = "drop",
) -> DataFrame:
    """``mode="drop"``: corpus minus contaminated docs — broadcast
    anti-join against the (non-distinct) hit set, zero hash exchanges in
    the whole plan. ``mode="flag"``: corpus + boolean ``contaminated``
    (the flag join needs the hit ids distinct first — one exchange over
    the matched minority)."""
    hits = contaminated_hits(df, eval_df, id_col, tokens_col, n).select(
        F.col(id_col).alias("__bad_id")
    )
    if mode == "drop":
        return df.join(
            F.broadcast(hits), df[id_col] == hits["__bad_id"], "left_anti"
        )
    if mode == "flag":
        bad = hits.distinct()
        out = df.join(
            F.broadcast(bad), df[id_col] == bad["__bad_id"], "left"
        )
        return out.withColumn(
            "contaminated", F.col("__bad_id").isNotNull()
        ).drop("__bad_id")
    raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
