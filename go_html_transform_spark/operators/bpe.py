"""Distributed BPE tokenizer training: learn byte-pair-encoding merges
over a token-array corpus (Sennrich et al. 2016, arXiv:1508.07909), and
apply a trained merge table — the vocabulary-construction op of a
training-data pipeline.

Semantics (classic BPE, pinned by a pure-python reference in tests):

* counting: every adjacent position contributes — "a a a" counts the
  pair (a,a) twice;
* selection: most frequent pair wins, ties break to the smallest (a,b);
* replacement: leftmost-first non-overlapping — "a a a" + merge (a,a)
  -> [new, a].

Design for 10^12 rows:

* each training round is ONE corpus pass: the adjacent-pair count is
  the posexplode + partial-agg'd groupBy of sketches.bigram_counts
  (no HOF-capture, whole-stage codegen), and only the driver-sized
  top-of-the-count-table crosses to the driver.
* `batch` > 1 amortizes passes: one count pass yields up to `batch`
  merges, greedily chosen from the ranked pair table so that no chosen
  pair shares a token id with an earlier choice (non-interacting:
  neither member of a later pair can be created or consumed by an
  earlier one, so applying them in priority order equals applying them
  sequentially — asserted in tests). batch=1 is EXACTLY sequential BPE;
  batch>1 is the standard scalable approximation (it may pick a pair
  whose count would have changed under an earlier merge of the same
  round, never one whose members overlap).
* merge application is inherently per-row sequential, so it runs as an
  Arrow-batched mapInPandas (the sanctioned python tier — never
  row-at-a-time F.udf); lineage is truncated with localCheckpoint every
  `checkpoint_every` rounds so the iterative plan doesn't grow without
  bound (same discipline as dedup.connected_components).
* new token ids are allocated from `next_id` upward (default: corpus
  max + 1 via one agg), deterministic and partitioning-independent.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_counts(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """(a, b, cnt) adjacent-pair counts over the current corpus — the
    per-round statistic. Delegates to sketches.bigram_counts (ONE copy
    of the codegen-safe posexplode + element_at machinery, including its
    NULL-array/NULL-element guard)."""
    from go_html_transform_spark.operators.sketches import bigram_counts

    return bigram_counts(df, tokens_col)


def _apply_merges_row(toks: list[int], merges: list[tuple[int, int, int]]) -> list[int]:
    """Apply merges in priority order, each leftmost-first non-overlapping."""
    for a, b, new in merges:
        out: list[int] = []
        i, n = 0, len(toks)
        while i < n:
            if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                out.append(new)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[int, int, int]],
    tokens_col: str = "tokens",
) -> DataFrame:
    """Tokenize with a trained merge table: schema-preserving
    mapInPandas, merges applied in priority order per row."""
    if not merges:
        return df
    schema = df.schema
    cols = [f.name for f in schema.fields]
    ti = cols.index(tokens_col)
    mlist = [(int(a), int(b), int(n)) for a, b, n in merges]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[cols[ti]] = pd.Series(
                [
                    # NULL arrays pass through as NULL (pair_counts
                    # tolerates them, so apply must too)
                    None if t is None else _apply_merges_row(list(t), mlist)
                    for t in pdf.iloc[:, ti]
                ],
                index=pdf.index,
                dtype=object,
            )
            yield pdf

    return df.mapInPandas(run, schema=schema)


def sample_corpus(
    df: DataFrame,
    sample_rows: int,
    key_cols: list[str],
    corpus_rows: int | None = None,
) -> DataFrame:
    """Deterministic hash-threshold sample of ~``sample_rows`` rows:
    keep rows whose xxhash64(key) lands under the ppm threshold
    sample_rows/corpus_rows. Layout- and partitioning-independent (the
    keep set is a pure function of the key), and fully parallel — no
    orderBy+limit funnel through one partition, so it is the shape that
    survives a 10^12-row corpus (the _sample_vectors orderBy+limit
    pattern is for KB-sized driver pulls; here the sample stays a
    distributed frame). If ``corpus_rows`` is not passed it costs one
    columnar count pass."""
    if corpus_rows is None:
        corpus_rows = df.count()
    if corpus_rows <= sample_rows:
        return df
    thr, den = sample_threshold(sample_rows, corpus_rows)
    key = F.xxhash64(*[F.col(c) for c in key_cols])
    return df.filter(F.pmod(key, F.lit(den)) < F.lit(thr))


# threshold denominator: 2^40 gives ~1e-12 fraction granularity, so the
# kept fraction tracks sample_rows/corpus_rows faithfully up to the
# 10^12-row design scale (a ppm denominator floors at 1e-6: sampling
# 1e5 rows from 1e12 would keep 1e6 — 10x the bound — and silently
# desync any fraction-derived scaling like bpe_train_sampled's
# min_count). den * sample_rows stays well inside int64.
_SAMPLE_DEN = 1 << 40


def sample_threshold(sample_rows: int, corpus_rows: int) -> tuple[int, int]:
    """(threshold, denominator) for the hash-keep filter; exact integer
    math so the ACTUAL kept fraction threshold/denominator is what
    callers scaling by the fraction must use."""
    return max(1, (_SAMPLE_DEN * sample_rows) // corpus_rows), _SAMPLE_DEN


def bpe_train_sampled(
    df: DataFrame,
    num_merges: int,
    tokens_col: str = "tokens",
    key_cols: list[str] | None = None,
    sample_rows: int = 100_000,
    corpus_rows: int | None = None,
    batch: int = 1,
    min_count: int = 2,
    checkpoint_every: int = 1,
    round_sizes: list[int] | None = None,
    apply_to_corpus: bool = True,
) -> tuple[list[tuple[int, int, int]], DataFrame]:
    """Scale path for BPE training: learn the merge table on a
    deterministic bounded sample, then apply it to the FULL corpus in
    one mapInPandas pass. ``bpe_train`` is one full corpus pass PER
    COUNT ROUND — a production 32k-merge vocabulary over 10^12 rows is
    thousands of corpus passes; here every round touches only the
    ~``sample_rows``-row sample (persisted once), and the corpus pays
    exactly one sampling filter plus one merge-apply pass. min_count is
    scaled down by the sampling fraction so the early-stop threshold
    means the same corpus frequency. New token ids still start above
    the FULL corpus max (one agg) so they can never collide with ids
    the sample missed. checkpoint_every defaults to 1 here (vs 4 for
    the full-corpus trainer): the sample is small enough that an eager
    materialization per round is cheap, and it bounds every count round
    to exactly ONE python apply pass instead of a growing mapInPandas
    chain. Fidelity is a fixture-pinned property (sampled
    merges == full-corpus merges when pair frequencies are separated
    beyond sampling noise, tests/test_bpe.py) — the standard
    train-on-a-slice BPE tradeoff, not an approximation of apply."""
    if key_cols is None:
        key_cols = [tokens_col]
    # one corpus pass for both setup scalars (id ceiling + row count)
    row = df.select(
        F.coalesce(F.max(F.array_max(F.col(tokens_col))), F.lit(-1)).alias("m"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    next_id = int(row["m"]) + 1
    if corpus_rows is None:
        corpus_rows = int(row["n"])
    sample = sample_corpus(df, sample_rows, key_cols, corpus_rows=corpus_rows)
    if corpus_rows <= sample_rows:
        frac = 1.0
    else:
        # the ACTUAL kept fraction (threshold granularity included), so
        # the scaled early-stop threshold means the same corpus
        # frequency the caller asked for
        thr, den = sample_threshold(sample_rows, corpus_rows)
        frac = thr / den
    eff_min = max(2, int(min_count * frac))
    sample = sample.persist()
    try:
        merges, _trained = bpe_train(
            sample,
            num_merges,
            tokens_col=tokens_col,
            batch=batch,
            next_id=next_id,
            min_count=eff_min,
            checkpoint_every=checkpoint_every,
            round_sizes=round_sizes,
        )
    finally:
        sample.unpersist()
    out = bpe_apply(df, merges, tokens_col) if apply_to_corpus else df
    return merges, out


def bpe_apply_fixed_ctes(
    merges: list[tuple[int, int, int]],
    rel: str = "doc",
    id_col: str = "doc_id",
    tokens: str = "tokens",
) -> str:
    """DuckDB twin of ``bpe_apply`` for a FIXED merge table with a != b
    in every merge: when the pair members differ, two matches can never
    share a token index (overlap needs t[i+1] = a = b), so leftmost-
    first non-overlapping replacement degenerates to 'replace every
    matched pair' — position j emits the new id when (t[j], t[j+1])
    matches, is dropped when (t[j-1], t[j]) matches, else passes
    through. One CTE layer per merge (column refs, never nested
    expressions) chained in priority order exactly like the python
    apply — a later merge may consume an earlier one's output id. The
    chain ends in ``bpe_out`` (id_col, t). a == b runs (leftmost parity
    inside token runs) are not SQL-shaped; those stay pytest-pinned
    against the pure-python reference."""
    if not merges:
        raise ValueError("bpe_apply_fixed_ctes needs at least one merge")
    parts = [f"bpe_l0 AS (SELECT {id_col}, {tokens} AS t FROM {rel})"]
    for li, (a, b, new) in enumerate(merges):
        if a == b:
            raise ValueError(
                f"bpe_apply_fixed_ctes requires a != b per merge, got ({a},{b})"
            )
        parts.append(f"""bpe_l{li + 1} AS (
          SELECT {id_col}, list_filter(
            list_transform(range(len(t)), j ->
              CASE WHEN t[j + 1] = {a}
                        AND COALESCE(t[j + 2], -1) = {b} THEN {new}
                   WHEN j > 0 AND t[j] = {a} AND t[j + 1] = {b} THEN NULL
                   ELSE t[j + 1] END),
            x -> x IS NOT NULL) AS t
          FROM bpe_l{li})""")
    parts.append(
        f"bpe_out AS (SELECT {id_col}, t FROM bpe_l{len(merges)})"
    )
    return ",\n".join(parts)


def bpe_train(
    df: DataFrame,
    num_merges: int,
    tokens_col: str = "tokens",
    batch: int = 1,
    next_id: int | None = None,
    min_count: int = 2,
    checkpoint_every: int = 4,
    round_sizes: list[int] | None = None,
) -> tuple[list[tuple[int, int, int]], DataFrame]:
    """Learn up to ``num_merges`` BPE merges. Returns (merge table in
    priority order, the corpus with all merges applied). Stops early
    when no pair reaches ``min_count``. If ``round_sizes`` is passed,
    the number of merges chosen by each count round is appended to it
    (a round may yield fewer than ``batch`` when the ranked table runs
    out of non-interacting pairs)."""
    if next_id is None:
        next_id = int(
            df.select(
                F.coalesce(
                    F.max(F.array_max(F.col(tokens_col))), F.lit(-1)
                ).alias("m")
            ).collect()[0]["m"]
        ) + 1
    merges: list[tuple[int, int, int]] = []
    cur = df
    rounds = 0
    while len(merges) < num_merges:
        want = min(batch, num_merges - len(merges))
        # over-fetch: after dropping interacting pairs we still want `want`
        top = (
            pair_counts(cur, tokens_col)
            .filter(F.col("cnt") >= min_count)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(want * 4)
            .collect()
        )
        chosen: list[tuple[int, int, int]] = []
        used: set[int] = set()
        for r in top:
            a, b = int(r["a"]), int(r["b"])
            if a in used or b in used:
                continue
            chosen.append((a, b, next_id))
            used.update((a, b))
            next_id += 1
            if len(chosen) >= want:
                break
        if not chosen:
            break
        merges.extend(chosen)
        if round_sizes is not None:
            round_sizes.append(len(chosen))
        cur = bpe_apply(cur, chosen, tokens_col)
        rounds += 1
        if rounds % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    return merges, cur
