"""Sequence packing — fill fixed-length training context windows from
variable-length documents (the "concat-and-chunk" packing used for LLM
pretraining): within each shard, documents are laid head-to-tail in a
deterministic order and the resulting token stream is cut every
``context_len`` tokens.

* ``pack_assign`` — per-document placement: (pack_id, pack_offset) of the
  document's first token, from a shard-local running sum. A document may
  straddle pack boundaries (standard concat-split semantics).
* ``pack_chunks`` — one row per (document x context window it overlaps):
  the exploded chunk map (pack_id, begin/end offsets both in the document
  and in the pack) a writer needs to emit final fixed-length examples.

Determinism: the within-shard order is the seeded affine hash with the
document key as tie-break (operators/sharding.py ``deterministic_shuffle``
order), so the same corpus + seed always yields byte-identical packs —
independent of cluster size or physical layout, which is what makes a
packed corpus resumable and experiments reproducible.

Scale shape: ONE exchange on the shard column + a shard-local sort feeds
the running-sum window; no global sort, no driver state. Shards bound
window-partition size (10^12 tokens / 64k shards ~ 15M tokens per
window partition). The chunk explode is a narrow per-row op with fan-out
ceil(n_tok/context_len)+1. Both stages are whole-stage-codegen
expressions — no Python.

Reference analogue: none (single-document reference); this is the
terminal layout stage downstream of operators/sharding.py, feeding the
sink of plans/prepare.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from go_html_transform_spark.operators.sharding import shuffle_hash


def _order_cols(key_num: Column, seed: int) -> list[Column]:
    # seeded hash with key tie-break: identical ordering contract as
    # sharding.deterministic_shuffle (hash ties cannot reorder across runs)
    return [shuffle_hash(key_num, seed), key_num.cast("long")]


def pack_assign(
    df: DataFrame,
    key_num: Column,
    n_tok_col: str,
    context_len: int,
    shard_col: str = "shard",
    seed: int = 0,
) -> DataFrame:
    """Add ``tok_before`` (tokens laid down earlier in this shard),
    ``pack_id`` and ``pack_offset`` of the document's first token.
    ``pack_id`` is shard-local; (shard, pack_id) is the global pack key."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*_order_cols(key_num, seed))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (F.sum(F.col(n_tok_col).cast("long")).over(w) - F.col(n_tok_col)).alias(
        "tok_before"
    )
    out = df.withColumn("tok_before", before)
    # `div` = exact integer division (float `/` would lose exactness past
    # 2^53 tokens laid down in one shard)
    return out.withColumn(
        "pack_id", F.expr(f"tok_before div {int(context_len)}")
    ).withColumn(
        "pack_offset", (F.col("tok_before") % context_len).cast("int")
    )


def pack_chunks(
    assigned: DataFrame,
    n_tok_col: str,
    context_len: int,
) -> DataFrame:
    """Explode each placed document into the context windows it overlaps:
    one row per chunk with

    * ``pack_id``           — window this chunk lands in
    * ``doc_begin/doc_end`` — half-open token range within the document
    * ``pack_begin``        — offset of the chunk inside the pack

    Empty documents (n_tok = 0) produce no chunks. Fan-out per doc is
    ceil(n_tok / context_len) + 1 at most."""
    C = int(context_len)
    first = F.col("pack_id")
    last = F.expr(f"(tok_before + {n_tok_col} - 1) div {C}")
    packs = F.when(
        F.col(n_tok_col) > 0, F.sequence(first, last)
    ).otherwise(F.array().cast("array<long>"))
    ex = assigned.withColumn("__chunk_pack", F.explode(packs))
    doc_begin = F.greatest(
        F.lit(0).cast("long"), F.col("__chunk_pack") * C - F.col("tok_before")
    )
    doc_end = F.least(
        F.col(n_tok_col).cast("long"),
        (F.col("__chunk_pack") + 1) * C - F.col("tok_before"),
    )
    pack_begin = F.greatest(
        F.lit(0).cast("long"), F.col("tok_before") - F.col("__chunk_pack") * C
    )
    return (
        ex.withColumn("doc_begin", doc_begin)
        .withColumn("doc_end", doc_end)
        .withColumn("pack_begin", pack_begin.cast("int"))
        .drop("pack_id", "pack_offset")
        .withColumnRenamed("__chunk_pack", "pack_id")
    )


def pack_assign_sql(
    key_num: str,
    n_tok_col: str,
    context_len: int,
    shard_col: str = "shard",
    seed: int = 0,
    src: str = "doc",
) -> str:
    """DuckDB twin of ``pack_assign`` (same hash family, same order,
    same window frame) — returns a full SELECT over ``src``."""
    from go_html_transform_spark.operators.sharding import shuffle_hash_sql

    h = shuffle_hash_sql(key_num, seed)
    order = f"ORDER BY {h}, CAST({key_num} AS BIGINT)"
    w = (
        f"OVER (PARTITION BY {shard_col} {order} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    before = f"(CAST(SUM({n_tok_col}) {w} AS BIGINT) - {n_tok_col})"
    return f"""
        SELECT *,
               {before} AS tok_before,
               CAST({before} // {context_len} AS BIGINT) AS pack_id,
               CAST({before} % {context_len} AS INTEGER) AS pack_offset
        FROM {src}
    """


def pack_contexts(
    assigned: DataFrame,
    n_tok_col: str = "n_tok",
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    context_len: int = 2048,
    shard_col: str = "shard",
) -> DataFrame:
    """Assemble the trainer-facing packed contexts: one row per
    (shard, pack_id) with

    * ``tokens``  — the concatenated context window (exactly
      ``context_len`` tokens except each shard's final partial pack)
    * ``spans``   — array<struct<doc_id, begin, end>> document boundary
      spans (half-open, pack-local) — the loss-mask/attention-reset
      input every packed-pretraining loader needs

    Built from pack_chunks (each document sliced into the windows it
    overlaps): chunk token slices are row-local ``F.slice``; the ONLY
    exchange is the groupBy on (shard, pack_id), and each grouped row is
    bounded by ``context_len`` tokens regardless of document sizes — a
    10^6-token document contributes 1-token-accurate slices to ~489
    different packs instead of one giant row.

    Determinism: chunk order inside a pack is pinned by ``pack_begin``
    (disjoint within a pack by construction), so the assembled array is
    byte-identical across partitionings/retries."""
    chunks = pack_chunks(assigned, n_tok_col, context_len)
    piece = F.slice(
        F.col(tokens_col),
        (F.col("doc_begin") + 1).cast("int"),
        (F.col("doc_end") - F.col("doc_begin")).cast("int"),
    )
    rows = chunks.select(
        F.col(shard_col),
        F.col("pack_id"),
        F.struct(
            F.col("pack_begin").alias("begin"),
            piece.alias("toks"),
            F.col(id_col).alias("doc_id"),
        ).alias("__piece"),
    )
    grouped = rows.groupBy(shard_col, "pack_id").agg(
        F.array_sort(F.collect_list("__piece")).alias("__pieces")
    )
    toks = F.flatten(F.transform(F.col("__pieces"), lambda p: p["toks"]))
    spans = F.transform(
        F.col("__pieces"),
        lambda p: F.struct(
            p["doc_id"].alias("doc_id"),
            p["begin"].alias("begin"),
            (p["begin"] + F.size(p["toks"])).alias("end"),
        ),
    )
    return grouped.select(
        shard_col,
        "pack_id",
        toks.alias("tokens"),
        spans.alias("spans"),
    )


def chunk_documents(
    df: DataFrame,
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    window: int = 512,
    stride: int | None = None,
    min_len: int = 1,
) -> DataFrame:
    """Sliding-window document chunking — the per-document complement of
    ``pack_assign``/``pack_chunks``: instead of concatenating documents
    into fixed contexts, each LONG document is cut into windows of
    ``window`` tokens starting every ``stride`` tokens (overlap =
    window - stride when stride < window, the standard long-document
    training / retrieval-passage split).

    One row per chunk: all input columns plus ``chunk_idx`` (0-based),
    ``chunk_begin`` (token offset), ``chunk_tokens``, ``chunk_n_tok``.
    Chunk starts are the multiples of ``stride`` below ``n_tok``; a
    trailing chunk shorter than ``min_len`` is dropped unless it is the
    document's ONLY chunk (empty documents produce no chunks).

    Scale shape: pure row-local explode + slice — zero shuffle, fan-out
    ceil(n_tok/stride) per document, whole-stage codegen (F.sequence /
    F.slice, no HOF lambda capture, no Python).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    stride = window if stride is None else stride
    if stride < 1:
        raise ValueError("stride must be >= 1")
    for c in ("chunk_idx", "chunk_begin", "chunk_tokens", "chunk_n_tok"):
        if c in df.columns:
            raise ValueError(f"output column collision: {c}")
    n = F.col(n_tok_col).cast("long")
    last = F.floor((n - 1) / F.lit(stride))
    idxs = F.when(n > 0, F.sequence(F.lit(0).cast("long"), last)).otherwise(
        F.array().cast("array<long>")
    )
    ex = df.withColumn("chunk_idx", F.explode(idxs))
    begin = F.col("chunk_idx") * stride
    chunk = F.slice(F.col(tokens_col), (begin + 1).cast("int"), window)
    out = (
        ex.withColumn("chunk_begin", begin)
        .withColumn("chunk_tokens", chunk)
        .withColumn("chunk_n_tok", F.size(chunk))
    )
    if min_len > 1:
        out = out.filter(
            (F.col("chunk_idx") == 0) | (F.col("chunk_n_tok") >= min_len)
        )
    return out


def chunk_documents_sql(
    src: str,
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    window: int = 512,
    stride: int | None = None,
    min_len: int = 1,
) -> str:
    """DuckDB twin of :func:`chunk_documents` (unnest(range(...)) explode +
    1-based inclusive list slice)."""
    stride = window if stride is None else stride
    inner = f"""
        SELECT *,
               unnest(range(0, CAST(FLOOR(({n_tok_col} - 1) / {stride})
                                    AS BIGINT) + 1)) AS chunk_idx
        FROM {src}
        WHERE {n_tok_col} > 0
    """
    body = f"""
        SELECT *,
               chunk_idx * {stride} AS chunk_begin,
               {tokens_col}[CAST(chunk_idx * {stride} + 1 AS BIGINT) :
                            CAST(LEAST(chunk_idx * {stride} + {window},
                                       {n_tok_col}) AS BIGINT)]
                 AS chunk_tokens
        FROM ({inner})
    """
    if min_len > 1:
        return f"""
        SELECT * FROM ({body})
        WHERE chunk_idx = 0 OR len(chunk_tokens) >= {min_len}
        """
    return body
