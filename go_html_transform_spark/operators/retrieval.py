"""BM25 lexical retrieval over an inverted-index shape: the query layer a
training-data pipeline needs for benchmark decontamination lookups, seed
expansion and corpus QA ("which documents match this probe set").

Design for 10^12 documents:

* the ONLY corpus-sized exchange is the postings aggregation, keyed on
  (doc, token) — huge key space, partial-aggregated map-side.
* the query set is tiny by definition (a probe list) — it broadcasts;
  the document-frequency dimension is vocab-bounded — it broadcasts too.
  After those joins the frame is |matched terms| rows, never corpus-wide.
* per-query top-k is a window over candidates of that query only.

Two scoring paths, same plan shape:

* ``bm25_topk`` — textbook double-precision Okapi BM25 (Robertson idf
  ``ln(1 + (N-df+0.5)/(df+0.5))``, k1/b length saturation). The
  production path; float sums are order-sensitive so it is pinned by
  python-reference parity tests, not the cross-engine hash.
* ``bm25_int_topk`` — integer-exact quantized BM25 (k1=1.2, b=0.75
  hard-wired as exact rationals): every division is int64 ``div`` on
  ppm-scaled terms, so Spark and DuckDB produce bit-identical scores —
  the DuckDB-oracle anchor. Quantization: idf is the RAW Robertson ratio
  in ppm (log replaced by its argument, capped — same ranking for a
  single-term query, compressed dynamic range for multi-term), tf
  saturation is exact: tf_sat_ppm = 2.2*tf / (tf + 1.2*(0.25 +
  0.75*dl/avgdl)) in ppm.

Int64 headroom (documented bounds, property-pinned in
tests/test_retrieval_selection.py across the WHOLE domain): idf_ppm is
capped at 10^12 so idf_ppm * tf_sat_ppm <= 2.2e18 < 2^63; (N - df) *
10^6 requires N < 9.2e12 docs; the length norm divides by avgdl_ppm =
(T * 10^6) // N computed DRIVER-SIDE in python bigints (arbitrary
precision — T * 10^6 never touches an engine int64), so the engine-side
product is only dl * 7.5e11, safe to dl ~ 1.2e7 tokens per doc; tf is
clamped at TF_SAT_CAP = 4e6 before tf*2.2e12 (past the clamp the
saturation term sits within 1e-6 of its asymptote, so ranking is
unaffected). Duplicate probe tokens are deduped on ingestion — each
(query, token) contributes once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

IDF_PPM_CAP = 1_000_000_000_000  # raw-ratio idf cap: keeps products in int64
TF_SAT_CAP = 4_000_000  # tf clamp: tf*2.2e6*1e6 must stay < 2^63; beyond
# 4e6 the saturation term is within 1e-6 of its 2.2e6 ppm asymptote anyway


def doc_postings(
    doc: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """(doc id, token, tf, dl) postings — the inverted-index fact.
    One corpus exchange keyed on (doc, token), map-side partial count;
    dl (document length) rides the groupBy key so no second doc join."""
    return (
        doc.select(
            F.col(id_col).alias("__doc"),
            F.size(F.col(tokens_col)).cast("long").alias("dl"),
            F.explode(tokens_col).alias("token"),
        )
        .groupBy("__doc", "dl", "token")
        .agg(F.count("*").alias("tf"))
    )


def _queries_df(spark, queries: list[tuple[int, list[int]]]) -> DataFrame:
    # dedupe (query, token): a duplicated probe token would otherwise
    # double-count the NONLINEAR saturation term on the Spark side while
    # the SQL twin folds it into tf — each probe token counts once
    rows = sorted({(int(q), int(t)) for q, toks in queries for t in toks})
    return spark.createDataFrame(rows, "query_id int, token int")


def _empty_result(
    spark, id_col: str, score_col: str, score_type: str, id_type: str = "string"
):
    # id_type must mirror the non-empty path's id column: a hardcoded
    # string id on the empty branch breaks unions and schema-sensitive
    # consumers whenever the corpus ids are not strings
    return spark.createDataFrame(
        [],
        f"query_id int, {id_col} {id_type}, {score_col} {score_type}, rank int",
    )


def _id_type(doc: DataFrame, id_col: str) -> str:
    return doc.schema[id_col].dataType.simpleString()


def bm25_topk(
    doc: DataFrame,
    queries: list[tuple[int, list[int]]],
    topk: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Okapi BM25 top-k per query (double precision, production path).
    Returns (query_id, doc id, score, rank), rank 1..topk by
    (score desc, doc asc)."""
    spark = doc.sparkSession
    post = doc_postings(doc, id_col, tokens_col)
    stats = doc.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.size(tokens_col)).cast("long").alias("t"),
    ).collect()[0]
    if stats["n"] is None or not int(stats["n"]) or stats["t"] is None or not int(stats["t"]):
        return _empty_result(spark, id_col, "score", "double", _id_type(doc, id_col))
    n_docs, total = int(stats["n"]), int(stats["t"])
    avgdl = total / n_docs
    q = _queries_df(spark, queries)
    # restrict postings to probe tokens BEFORE the df aggregation: df is
    # per-token, so the restriction doesn't change any kept count, and
    # the broadcast df table is bounded by |probe tokens| instead of the
    # (open) vocabulary
    qpost = post.join(F.broadcast(q.select("token").distinct()), "token", "left_semi")
    dfreq = qpost.groupBy("token").agg(F.count("*").alias("df"))
    cand = qpost.join(F.broadcast(q), "token").join(F.broadcast(dfreq), "token")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_sat = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        cand.withColumn("__term", idf * tf_sat)
        .groupBy("query_id", "__doc")
        .agg(F.sum("__term").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("__doc"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id", F.col("__doc").alias(id_col), "score", "rank"
        )
    )


def bm25_int_topk(
    doc: DataFrame,
    queries: list[tuple[int, list[int]]],
    topk: int = 10,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Integer-exact quantized BM25 (k1=1.2, b=0.75) — the cross-engine
    oracle path; see module docstring for the quantization contract.
    Returns (query_id, doc id, score_milli, rank)."""
    spark = doc.sparkSession
    post = doc_postings(doc, id_col, tokens_col)
    stats = doc.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.size(tokens_col)).cast("long").alias("t"),
    ).collect()[0]
    if stats["n"] is None or not int(stats["n"]) or stats["t"] is None or not int(stats["t"]):
        return _empty_result(
            spark, id_col, "score_milli", "long", _id_type(doc, id_col)
        )
    n_docs, total = int(stats["n"]), int(stats["t"])
    q = _queries_df(spark, queries)
    return _score_int_postings(post, q, n_docs, total, topk, id_col)


def _score_int_postings(
    post: DataFrame,
    q: DataFrame,
    n_docs: int,
    total: int,
    topk: int,
    id_col: str,
) -> DataFrame:
    """Shared integer-exact scoring over a (``__doc``, dl, token, tf)
    postings frame — used by the in-memory path and the at-rest index."""
    # python bigint — T * 1e6 never enters an engine int64
    avgdl_ppm = (total * 1_000_000) // n_docs
    qpost = post.join(F.broadcast(q.select("token").distinct()), "token", "left_semi")
    dfreq = qpost.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    cand = qpost.join(F.broadcast(q), "token").join(F.broadcast(dfreq), "token")
    scored = (
        cand.select(
            "query_id",
            "__doc",
            F.least(
                F.expr(f"(({n_docs} - df) * 1000000) div (df + 1)"),
                F.lit(IDF_PPM_CAP),
            ).alias("idf_ppm"),
            F.expr(
                f"250000 + (dl * 750000000000) div {avgdl_ppm}"
            ).alias("ln_ppm"),
            # tf saturation is within 1e-6 of its asymptote past the
            # clamp, and tf*2.2e12 must stay under 2^63
            F.least(F.col("tf"), F.lit(TF_SAT_CAP)).alias("tfc"),
        )
        .select(
            "query_id",
            "__doc",
            "idf_ppm",
            F.expr("tfc * 1000000 + (12 * ln_ppm) div 10").alias("den_ppm"),
            "tfc",
        )
        .select(
            "query_id",
            "__doc",
            F.expr(
                "(idf_ppm * ((tfc * 2200000 * 1000000) div den_ppm))"
                " div 1000000000"
            ).alias("__term"),
        )
        .groupBy("query_id", "__doc")
        .agg(F.sum("__term").alias("score_milli"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_milli"), F.asc("__doc")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id", F.col("__doc").alias(id_col), "score_milli", "rank"
        )
    )


def bm25_write_index(
    table,
    doc: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_files: int = 32,
) -> tuple[int, int, int]:
    """Materialize the inverted index at rest: postings range-partitioned
    by token so each data file covers a contiguous token range, committed
    to a ManifestTable with token footer stats (the ivf_write_index
    layout applied to lexical retrieval). Returns (snapshot, n_docs,
    total_tokens) — the caller persists the two corpus scalars alongside
    the table (they are index-build-time constants; at 10^12 docs you do
    not recount the corpus per probe).

    At rest, a probe for q tokens manifest-prunes to the files whose
    [token_min, token_max] ranges cover them — the corpus is never
    listed, let alone scanned."""
    stats = doc.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.size(tokens_col)).cast("long").alias("t"),
    ).collect()[0]
    n_docs = int(stats["n"] or 0)
    total = int(stats["t"] or 0)
    post = doc_postings(doc, id_col, tokens_col)
    laid_out = post.repartitionByRange(max(1, n_files), F.col("token"))
    snap = table.append(laid_out, stats_cols=["token"])
    return snap, n_docs, total


def bm25_topk_indexed(
    table,
    spark,
    queries: list[tuple[int, list[int]]],
    n_docs: int,
    total: int,
    topk: int = 10,
    id_col: str = "doc_id",
) -> "tuple[DataFrame, int, int]":
    """BM25 top-k against the at-rest inverted index: manifest-prune the
    postings files to the probe tokens' ranges, then run the shared
    integer-exact scoring over only what survives. Returns (result,
    files_read, files_total) so callers — and tests — see the prune.
    Identical results to ``bm25_int_topk`` on the indexed corpus: df is
    computed from the pruned postings, which hold EVERY posting of every
    probe token by the range-stats invariant."""
    files_total = len(table.files())

    def empty():
        # mirror the at-rest postings' __doc type when any file exists;
        # a never-written table has no schema to mirror, so fall back
        files = table.files()
        id_type = (
            spark.read.parquet(files[0].path).schema["__doc"].dataType.simpleString()
            if files
            else "string"
        )
        return _empty_result(spark, id_col, "score_milli", "long", id_type)

    if n_docs <= 0 or total <= 0:
        return empty(), 0, files_total
    probe_tokens = sorted({int(t) for _, toks in queries for t in toks})
    paths: list[str] = []
    seen: set[str] = set()
    for t in probe_tokens:
        for f in table.files(prune={"token": (t, t)}):
            if f.path not in seen:
                seen.add(f.path)
                paths.append(f.path)
    if not paths:
        return empty(), 0, files_total
    post = spark.read.parquet(*paths).filter(
        F.col("token").isin(probe_tokens)
    )
    q = _queries_df(spark, queries)
    out = _score_int_postings(post, q, n_docs, total, topk, id_col)
    return out, len(paths), files_total


def bm25_int_sql(
    queries: list[tuple[int, list[int]]],
    topk: int = 10,
    rel: str = "doc",
    id_expr: str = "doc_id",
    tokens: str = "tokens",
) -> str:
    """DuckDB twin of ``bm25_int_topk`` — identical int64 arithmetic
    (DuckDB ``//`` == Spark ``div`` on the nonnegative domain; probe
    tokens deduped and tf clamped exactly as the Spark side)."""
    pairs = sorted({(int(q), int(t)) for q, toks in queries for t in toks})
    if not pairs:
        # `VALUES ()` is a parse error — mirror the Spark paths' empty
        # result with a schema-correct zero-row SELECT
        return (
            "SELECT CAST(NULL AS INTEGER) AS query_id, "
            "CAST(NULL AS VARCHAR) AS bdoc, "
            "CAST(NULL AS BIGINT) AS score_milli, "
            "CAST(NULL AS INTEGER) AS rank WHERE 1 = 0"
        )
    qrows = ", ".join(f"({q}, {t})" for q, t in pairs)
    return f"""
    SELECT query_id, {id_expr} AS bdoc, score_milli, rank FROM (
      SELECT query_id, {id_expr}, score_milli,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_milli DESC, {id_expr}) AS rank
      FROM (
        SELECT query_id, {id_expr},
               CAST(SUM((idf_ppm * ((tfc * 2200000 * 1000000) // den_ppm))
                        // 1000000000) AS BIGINT) AS score_milli
        FROM (
          SELECT p.query_id, p.{id_expr},
                 LEAST(p.tf, {TF_SAT_CAP}) AS tfc,
                 LEAST(((s.n - d.df) * 1000000) // (d.df + 1),
                       {IDF_PPM_CAP}) AS idf_ppm,
                 LEAST(p.tf, {TF_SAT_CAP}) * 1000000
                   + (12 * (250000 + (p.dl * 750000000000)
                            // s.avgdl_ppm)) // 10
                   AS den_ppm
          FROM (
            SELECT q.query_id, t.{id_expr}, t.dl, t.token,
                   COUNT(*) AS tf
            FROM (SELECT {id_expr},
                         CAST(len({tokens}) AS BIGINT) AS dl,
                         unnest({tokens}) AS token FROM {rel}) t
            JOIN (VALUES {qrows}) AS q(query_id, token)
              ON q.token = t.token
            GROUP BY q.query_id, t.{id_expr}, t.dl, t.token
          ) p
          JOIN (
            SELECT token, CAST(COUNT(DISTINCT {id_expr}) AS BIGINT) AS df
            FROM (SELECT {id_expr}, unnest({tokens}) AS token FROM {rel})
            GROUP BY token
          ) d ON d.token = p.token
          CROSS JOIN (
            -- avgdl in ppm; the T*1e6 product runs as HUGEINT so the
            -- twin stays exact at any scale (the Spark side computes
            -- this value driver-side in python bigints)
            SELECT n, t,
                   CAST((CAST(t AS HUGEINT) * 1000000) // n AS BIGINT)
                     AS avgdl_ppm
            FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(len({tokens})) AS BIGINT) AS t
                  FROM {rel})
          ) s
        )
        GROUP BY query_id, {id_expr}
      )
    ) WHERE rank <= {topk}
    """
