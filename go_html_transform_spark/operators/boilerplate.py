"""C4/RefinedWeb-style boilerplate removal: drop text segments that
repeat across many documents (navigation bars, cookie banners, footers —
the "line-level dedup" step of every public pretraining recipe).

Real pipelines segment on newlines; the driver corpus is single-line, so
segmentation is pluggable and defaults to NON-OVERLAPPING ``n``-word
chunks (the trailing partial chunk is kept, so reassembly is lossless up
to whitespace normalization). The reference analogue is RemoveChildren /
Subtransform scoped mutation (html/transform/transform.go) lifted from
one tree to cross-corpus statistics.

Scale shape (10^12 docs):

* segmentation is row-local Column arithmetic — split, slice,
  array_join; no UDF, no shuffle.
* segment document-frequencies: per-row ``array_distinct`` then explode
  -> ONE partial-agg'd exchange. Unlike a raw-document key (the round-1
  ``exact_dedup`` weakness) the segment key space is the segment
  VOCABULARY — zipfian and collapsible map-side — so the exchange
  carries each partition's distinct segments once, not the corpus.
* the hot set (``df_cnt >= min_docs``) is small BY CONSTRUCTION (a
  segment must repeat across min_docs documents to qualify), so it
  collapses to a single broadcast array row and removal is a pure
  row-local array filter: the corpus is NEVER exchanged. Removal cost is
  O(segments x |hot|) per row with an array_contains probe; if a corpus
  ever produced a huge hot set, the fallback is the decontaminate-style
  explode + broadcast anti-join + per-doc re-agg (one doc-keyed
  exchange).

HOF-capture discipline (plans/rules.py:363): every lambda below touches
only MATERIALIZED attributes (``__w``, ``__hot``), never a computed
array expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEG_N = 3  # words per segment (newline-free corpus default)
MIN_DOCS = 4  # a segment present in >= MIN_DOCS docs is boilerplate


def _words(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda w: F.length(w) > 0)


def words_sql(text: str = "text") -> str:
    return f"list_filter(string_split({text}, ' '), w -> length(w) > 0)"


def segments_col(words: Column, n: int = SEG_N) -> Column:
    """array<string> of non-overlapping n-word chunks, each re-joined
    with a single space. ``words`` MUST be a materialized attribute.

    ceil-division is exact-integer ((len + n - 1) div n) — no float."""
    nseg = ((F.size(words) + F.lit(n - 1)) / F.lit(n)).cast("int")
    idx = F.when(nseg > 0, F.sequence(F.lit(0), nseg - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.array_join(F.slice(words, i * n + 1, n), " "),
    )


def segments_sql(words: str = "w", n: int = SEG_N) -> str:
    """DuckDB twin (1-based inclusive slicing; integer ceil-division)."""
    return (
        f"[array_to_string({words}[(i*{n}+1):(i*{n}+{n})], ' ') "
        f"FOR i IN range(0, (len({words}) + {n - 1}) // {n})]"
    )


def segment_doc_frequencies(
    df: DataFrame, text: str = "text", n: int = SEG_N
) -> DataFrame:
    """(seg, df_cnt): number of documents containing each segment.
    Row-local array_distinct BEFORE the explode keeps the count
    per-document; the groupBy is the plan's only exchange."""
    segs = df.select(_words(F.col(text)).alias("__w")).select(
        segments_col(F.col("__w"), n).alias("__segs")
    )
    return (
        segs.select(F.explode(F.array_distinct("__segs")).alias("seg"))
        .groupBy("seg")
        .agg(F.count("*").alias("df_cnt"))
    )


def segment_doc_frequencies_sql(
    rel: str = "doc", text: str = "text", n: int = SEG_N
) -> str:
    return f"""
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS df_cnt
        FROM (SELECT {segments_sql(words_sql(text), n)} AS segs
              FROM {rel}),
             unnest(list_distinct(segs)) AS u(seg)
        GROUP BY 1
    """


def hot_segments(
    df: DataFrame,
    text: str = "text",
    n: int = SEG_N,
    min_docs: int = MIN_DOCS,
) -> DataFrame:
    """The boilerplate set: segments appearing in >= min_docs documents."""
    return segment_doc_frequencies(df, text, n).filter(
        F.col("df_cnt") >= min_docs
    )


def hot_segments_sql(
    rel: str = "doc",
    text: str = "text",
    n: int = SEG_N,
    min_docs: int = MIN_DOCS,
) -> str:
    return (
        f"SELECT seg, df_cnt FROM ({segment_doc_frequencies_sql(rel, text, n)})"
        f" WHERE df_cnt >= {min_docs}"
    )


def remove_boilerplate(
    df: DataFrame,
    text: str = "text",
    n: int = SEG_N,
    min_docs: int = MIN_DOCS,
    out_col: str | None = None,
) -> DataFrame:
    """Corpus with ``text`` rewritten minus boilerplate segments, plus
    ``bp_removed`` (segments dropped per doc). Output text is
    whitespace-normalized (single spaces) — lossless otherwise.
    ``out_col`` writes the cleaned text to a different column, leaving
    ``text`` untouched (default: overwrite in place).

    Plan: the hot set folds into ONE sorted-array row, broadcast via
    crossJoin; the corpus side is a row-local filter + array_join — zero
    corpus exchanges (asserted in tests/test_plans.py)."""
    hot = hot_segments(df, text, n, min_docs).agg(
        F.sort_array(F.collect_list("seg")).alias("__hot")
    )
    staged = (
        df.withColumn("__w", _words(F.col(text)))
        .withColumn("__segs", segments_col(F.col("__w"), n))
        .crossJoin(F.broadcast(hot))
    )
    kept = F.filter(
        F.col("__segs"),
        lambda s: ~F.array_contains(F.col("__hot"), s),
    )
    return (
        staged.withColumn("__kept", kept)
        .withColumn(
            "bp_removed", (F.size("__segs") - F.size("__kept")).cast("int")
        )
        .withColumn(out_col or text, F.array_join("__kept", " "))
        .drop("__w", "__segs", "__hot", "__kept")
    )


def remove_boilerplate_ctes(
    rel: str = "doc",
    text: str = "text",
    n: int = SEG_N,
    min_docs: int = MIN_DOCS,
) -> str:
    """DuckDB twin as chained CTEs ending in ``bp_clean`` — columns
    (<rel columns...>, segs, kept, bp_removed, cleaned). Append after the
    standard CTE prelude: ``WITH seq AS (...), ..., {this}``.

    DuckDB ``array_to_string([])`` is NULL where Spark ``array_join``
    is '' — the COALESCE pins the fully-boilerplate-doc case."""
    return f"""
        bp_hotset AS (
            SELECT COALESCE(list(seg ORDER BY seg), []) AS hot
            FROM ({hot_segments_sql(rel, text, n, min_docs)})
        ),
        bp_clean AS (
            SELECT r.*,
                   {segments_sql(words_sql(f'r.{text}'), n)} AS segs,
                   list_filter(segs, s -> NOT list_contains(hot, s)) AS kept,
                   CAST(len(segs) - len(kept) AS INTEGER) AS bp_removed,
                   COALESCE(array_to_string(kept, ' '), '') AS cleaned
            FROM {rel} r, bp_hotset
        )
    """
