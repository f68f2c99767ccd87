"""Gopher/RefinedWeb-style within-document repetition signals over token
arrays: the fraction of n-grams covered by values that repeat inside the
document, and the mass of the single most frequent n-gram. These are the
standard "repetition filters" every public pretraining recipe applies
(Rae et al. 2021 §A1.1 use them over words/lines; here they run over the
pre-tokenized sequences the engine is built around — the reference
analogue is WalkNodes-derived per-tree statistics, html/h5/h5.go:74-88,
lifted to per-document aggregate form).

Both stats are EXACT integer parts-per-million (the quality_score_ppm
lesson: rounded doubles diverge cross-engine at ties), computed entirely
row-locally — zero shuffle, zero UDF, and at 10^12 documents the plan
shape is a pure map over the corpus scan.

HOF-capture discipline (plans/rules.py:363): the indexed lambdas below
touch only MATERIALIZED attributes, never computed array expressions —
callers go through ``with_repetition`` which materializes the sorted
n-gram array and the run-start index array before any indexed access.

Packing contract: token ids are packed into one int64 per n-gram with
base 2^20; ids are masked to 20 bits first (``t & 0xFFFFF``), so ids
>= 2^20 would alias (the driver vocab is < 2^10 — documented, not
asserted, and the mask keeps the arithmetic overflow-free for n <= 3).
NULL token elements are dropped before packing (the survivors keep their
order), matching the fingerprint/minhash NULL contract shared with the
DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PACK_BASE = 1 << 20  # token-id packing base (ids masked to 20 bits)
PACK_MASK = PACK_BASE - 1
PPM = 1_000_000


def _packed_ngrams(tokens: Column, n: int) -> Column:
    """Sorted array<long> of base-2^20-packed n-grams (NULLs dropped).

    The packing lambda indexes only its own zip_with/transform params
    plus the *argument* arrays (evaluated once — arguments are safe, only
    lambda-body captures of computed expressions re-evaluate)."""
    if n < 1 or n > 3:
        raise ValueError("repetition stats support n in 1..3 (int64 packing)")
    clean = F.transform(
        F.filter(tokens, lambda t: t.isNotNull()),
        lambda t: t.cast("long").bitwiseAND(F.lit(PACK_MASK)),
    )
    if n == 1:
        return F.array_sort(clean)
    # m = len(clean) - n + 1 n-grams; empty when len < n
    m = F.greatest(F.size(clean) - F.lit(n - 1), F.lit(0))
    idx = F.when(m > 0, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>")
    )
    # zip_with pairs idx with clean's prefix; for n=3 fold a third shift.
    if n == 2:
        packed = F.zip_with(
            F.slice(clean, 1, m),
            F.slice(clean, 2, m),
            lambda a, b: a * F.lit(PACK_BASE) + b,
        )
    else:
        packed = F.zip_with(
            F.zip_with(
                F.slice(clean, 1, m),
                F.slice(clean, 2, m),
                lambda a, b: a * F.lit(PACK_BASE) + b,
            ),
            F.slice(clean, 3, m),
            lambda ab, c: ab * F.lit(PACK_BASE) + c,
        )
    return F.array_sort(packed)


def _packed_ngrams_sql(tokens: str, n: int) -> str:
    """DuckDB twin of :func:`_packed_ngrams` (1-based slicing)."""
    clean = (
        f"list_transform(list_filter({tokens}, t -> t IS NOT NULL), "
        f"t -> CAST(t AS BIGINT) & {PACK_MASK})"
    )
    if n == 1:
        return f"list_sort({clean})"
    # DuckDB lists are 1-based: i runs 1..len(c)-(n-1)
    body = " + ".join(
        f"c[i+{j}] * {PACK_BASE ** (n - 1 - j)}" for j in range(n)
    )
    return (
        f"(SELECT list_sort([{body} FOR i IN range(1, len(c) - {n - 1} + 1)]) "
        f"FROM (SELECT {clean} AS c))"
    )


def _run_starts(sorted_ngrams: Column) -> Column:
    """1-based indices where a new distinct value's run begins in the
    sorted array. ``sorted_ngrams`` MUST be a materialized attribute
    (indexed inside the lambda). index 0 is unreachable via the
    greatest() guard — try_element_at(_, 0) throws even under try_."""
    s = sorted_ngrams
    m = F.size(s)
    idx = F.when(m > 0, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>")
    )
    return F.filter(
        idx,
        lambda i: (i == 1)
        | (
            F.try_element_at(s, i)
            != F.try_element_at(s, F.greatest(i - 1, F.lit(1)))
        ),
    )


def _run_lengths(starts: Column, m: Column) -> Column:
    """Run lengths from start indices: next_start - start, with the
    virtual terminator m+1. Argument arrays are computed expressions —
    safe (evaluated once); the lambda uses only its own params."""
    k = F.size(starts)
    ends = F.concat(
        F.slice(starts, 2, F.greatest(k - 1, F.lit(0))),
        F.array(m + 1),
    )
    return F.zip_with(ends, starts, lambda e, b: e - b)


def with_repetition(
    df: DataFrame, tokens: str = "tokens", n: int = 2, prefix: str | None = None
) -> DataFrame:
    """Add ``{prefix}_dup_ppm`` and ``{prefix}_top_ppm`` columns.

    * dup_ppm — fraction (ppm) of n-grams whose value occurs >= 2 times
      in the document (Gopher's "duplicate n-gram fraction").
    * top_ppm — fraction (ppm) of n-grams taken by the single most
      frequent n-gram value (Gopher's "top n-gram mass").

    Exact integer arithmetic throughout: x * 1e6 div m with m <= n_tok,
    so the int64 headroom is ~9e12 n-grams per document. Two nested
    selects materialize the sorted array and the start indices so every
    indexed lambda reads attributes only.
    """
    pfx = prefix or f"rep{n}"
    ng, st = f"__{pfx}_ng", f"__{pfx}_st"
    out = (
        df.withColumn(ng, _packed_ngrams(F.col(tokens), n))
        .withColumn(st, _run_starts(F.col(ng)))
    )
    m = F.size(F.col(ng)).cast("long")
    runs = _run_lengths(F.col(st), F.size(F.col(ng)))
    singletons = F.size(F.filter(runs, lambda r: r == 1)).cast("long")
    top = F.coalesce(F.array_max(runs), F.lit(0)).cast("long")
    dup = F.when(m > 0, ((m - singletons) * PPM - F.pmod((m - singletons) * PPM, m)) / m).otherwise(F.lit(0))
    tp = F.when(m > 0, (top * PPM - F.pmod(top * PPM, m)) / m).otherwise(F.lit(0))
    return (
        out.withColumn(f"{pfx}_dup_ppm", dup.cast("long"))
        .withColumn(f"{pfx}_top_ppm", tp.cast("long"))
        .drop(ng, st)
    )


def repetition_sql(tokens: str, n: int) -> tuple[str, str]:
    """(dup_ppm_sql, top_ppm_sql) DuckDB twins as scalar subqueries over
    the same packed/sorted/run decomposition (integer // division)."""
    g = _packed_ngrams_sql(tokens, n)
    starts = (
        f"[i FOR i IN range(1, len(g) + 1) "
        f"IF i = 1 OR g[i] != g[GREATEST(i - 1, 1)]]"
    )
    runs = (
        f"[COALESCE(st[i + 1], len(g) + 1) - st[i] "
        f"FOR i IN range(1, len(st) + 1)]"
    )
    base = (
        f"FROM (SELECT {g} AS g) _g_, "
        f"LATERAL (SELECT {starts} AS st) _s_, "
        f"LATERAL (SELECT {runs} AS rl) _r_"
    )
    # COALESCE(len(g), 0): a whole-NULL token array makes g NULL — the
    # engine yields 0 there (when(m > 0).otherwise(0)), so the twin must
    # hit the zero branch too, not propagate NULL through the division
    dup = (
        f"(SELECT CASE WHEN COALESCE(len(g), 0) = 0 THEN 0 ELSE "
        f"CAST((len(g) - len(list_filter(rl, r -> r = 1))) AS BIGINT)"
        f" * {PPM} // len(g) END {base})"
    )
    top = (
        f"(SELECT CASE WHEN COALESCE(len(g), 0) = 0 THEN 0 ELSE "
        f"CAST(COALESCE(list_max(rl), 0) AS BIGINT) * {PPM} // len(g) END "
        f"{base})"
    )
    return dup, top
