"""Substring-level exact span dedup — remove duplicated n-token spans
from a corpus while keeping one canonical occurrence of each, the
sequence-level complement to document-level exact/near dedup
(operators/dedup.py). Standard pretraining hygiene (the "dedup the
training data at the substring level" recipe): boilerplate licenses,
repeated headers and quoted passages recur VERBATIM inside otherwise
unique documents, and document-level dedup never sees them.

Semantics (deterministic):

* every length-``n`` token window is identified by its dual-affine
  rolling hash (operators/decontaminate.py:ngram_hashes — exact int64,
  DuckDB twin);
* a span value occurring >= 2 times corpus-wide (across documents OR
  repeated inside one document) is *duplicated*;
* the canonical occurrence is the (id, pos)-lexicographically smallest;
  every other occurrence is *removed*: tokens covered by any removed
  span are dropped from the document.

Scale shape (10^12 sequences):

* span explode is narrow (fan-out n_tok - n + 1, rows ~24 bytes:
  id + int pos + int64 hash — the document text/tokens NEVER ride along);
* occurrence ranking is a PARTIAL-AGG groupBy on the 8-byte span hash
  (count + min(struct(id, pos)) both combine map-side — a hot span
  collapses to one candidate per input partition before the exchange,
  and no per-partition sort of the occurrence set ever happens) plus an
  AQE-skew-splittable equi-join of the occurrence stream against the
  duplicated subset;
* per-doc start lists are a second narrow exchange on the id;
* the only corpus-wide row movement is the final join of start lists
  back onto the corpus — shuffle-free when the corpus is bucketed by
  id (sources/iceberg.py bucket(512, doc_id) layout), a broadcast when
  the duplicated-doc set is small;
* the removal itself is row-local array arithmetic (positional filter
  with an exists probe over the doc's start list — start lists are
  short; no Python anywhere).

Collisions: the dual-hash composition gives ~2^38 distinct values; a
collision removes a span that wasn't actually duplicated (FPR ~
|corpus-spans| / 2^38 per span) — the conservative direction for
dedup, same contract as decontaminate.py.

Reference analogue: none (engine-added training-data hygiene; the
reference's closest concept is subtree-scoped rewriting,
html/transform/transform.go — here the "selector" is *content
recurrence* instead of a CSS pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_html_transform_spark.operators.decontaminate import (
    ngram_hashes,
    ngram_hashes_sql,
)


def span_occurrences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
) -> DataFrame:
    """(id, pos, span_hash) — one row per length-``n`` window. Narrow
    (no exchange); documents shorter than ``n`` contribute nothing."""
    return df.select(
        F.col(id_col),
        F.posexplode(ngram_hashes(F.col(tokens_col), n)).alias(
            "pos", "span_hash"
        ),
    )


def duplicated_span_starts(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
) -> DataFrame:
    """(id, dup_starts: sorted array<int>) for every document that loses
    at least one span — the non-canonical occurrences of every
    corpus-duplicated span value. The corpus rows themselves are never
    shuffled here.

    Shape: per-hash (count, first-occurrence) come from a PARTIAL-AGG
    groupBy — ``min(struct(id, pos))`` is the (id, pos)-lexicographic
    canonical and combines map-side, so a license header repeated 10^9
    times corpus-wide collapses to one candidate per input partition
    before its hash ever crosses the wire. Non-canonical occurrences are
    then an equi-JOIN of the occurrence stream against the duplicated
    subset of that (bounded, narrow) table — joins, unlike the window
    sort this replaces, are AQE-skew-splittable, and the hash-agg needs
    no per-partition sort of the 10^15-row occurrence set. Costs one
    extra pass over the narrow occurrence stream (two derivations of
    span_occurrences); at corpus scale the eliminated sort + hot-key
    serialization dominates that by orders of magnitude."""
    occ = span_occurrences(df, id_col, tokens_col, n)
    dup_first = (
        occ.groupBy("span_hash")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.min(F.struct(id_col, "pos")).alias("__first"),
        )
        .filter(F.col("__cnt") >= 2)
        .select("span_hash", "__first")
    )
    return (
        occ.join(dup_first, "span_hash")
        .filter(F.struct(id_col, "pos") != F.col("__first"))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("pos")).alias("dup_starts"))
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
    out_col: str = "tokens_span_deduped",
) -> DataFrame:
    """Corpus + ``dup_starts`` + ``out_col`` (tokens with every position
    covered by a removed span dropped) + ``n_spans_removed``. Documents
    with no duplicated span pass through with ``dup_starts = []`` and
    ``out_col = tokens``."""
    starts = duplicated_span_starts(df, id_col, tokens_col, n)
    out = df.join(starts, id_col, "left").withColumn(
        "dup_starts",
        F.coalesce(F.col("dup_starts"), F.array().cast("array<int>")),
    )
    # Both lambdas reference only MATERIALIZED attributes (tokens_col,
    # dup_starts) — capturing a computed expression would re-evaluate it
    # per element (the interpreted-HOF trap, plans/rules.py:363). The
    # exists probe is O(|dup_starts|) per token; start lists are short.
    kept = F.filter(
        F.col(tokens_col),
        lambda _t, i: ~F.exists(
            F.col("dup_starts"),
            lambda s: (s <= i) & (i < s + F.lit(n)),
        ),
    )
    return out.withColumn(out_col, kept).withColumn(
        "n_spans_removed", F.size("dup_starts")
    )


def span_dedup_stats_sql(
    rel: str = "doc",
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
) -> str:
    """DuckDB twin: per affected document
    (id, n_spans_removed, kept_ntok, kept_sum) — kept_sum is the exact
    int64 token-sum checksum of the surviving tokens."""
    hs = ngram_hashes_sql(tokens_col, n)
    return f"""
        SELECT s.{id_col} AS {id_col},
               CAST(len(s.dup_starts) AS INTEGER) AS n_spans_removed,
               CAST(len(kept) AS INTEGER) AS kept_ntok,
               CAST(COALESCE(list_sum(kept), 0) AS BIGINT) AS kept_sum
        FROM (
            SELECT {id_col},
                   list_sort(list(pos)) AS dup_starts
            FROM (
                SELECT {id_col}, pos,
                       ROW_NUMBER() OVER (
                           PARTITION BY h ORDER BY {id_col}, pos
                       ) AS rn,
                       COUNT(*) OVER (PARTITION BY h) AS cnt
                FROM (
                    SELECT {id_col}, i AS pos, hs[i + 1] AS h
                    FROM (SELECT {id_col}, {hs} AS hs FROM {rel}) t,
                         unnest(range(len(hs))) AS r(i)
                )
            ) WHERE cnt >= 2 AND rn > 1
            GROUP BY {id_col}
        ) s JOIN (SELECT {id_col}, {tokens_col} FROM {rel}) d
          ON s.{id_col} = d.{id_col},
        LATERAL (
            SELECT [d.{tokens_col}[i + 1]
                    FOR i IN range(0, len(d.{tokens_col}))
                    IF len(list_filter(s.dup_starts,
                           s2 -> s2 <= i AND i < s2 + {n})) = 0] AS kept
        ) k
    """
