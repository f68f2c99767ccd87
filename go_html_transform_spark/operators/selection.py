"""DSIR-style data selection: importance resampling with hashed-bigram
features (Xie et al. 2023, arXiv:2302.03169 — "Data Selection for
Language Models via Importance Resampling").

The estimator: featurize every document into hashed n-gram buckets,
fit two bag-of-buckets unigram models — p_target over the docs matching
a target predicate (e.g. a trusted domain/language) and p_raw over the
whole corpus — and score each document with the log-likelihood ratio
``sum_f c_f(doc) * (ln p_t(f) - ln p_r(f))`` (add-1 smoothed). Documents
scoring > 0 look more target-like than corpus-like.

Design for 10^12 docs:

* two corpus passes, both narrow: (1) hashed-bigram explode ->
  bucket-keyed partial-agg (output BOUNDED at `buckets` rows); (2) the
  same explode joined to the BROADCAST log-ratio table, doc-keyed
  partial-agg for the weights. No all-corpus sort, no driver loop.
* the log-ratio table is where floats live: ONE ln per bucket, quantized
  to integer milli-nats at the table (1024 rows), so the per-doc weight
  is an exact int64 sum — deterministic across engines, partitionings
  and summation orders.
* selection: the oracle-checked flag is the likelihood-ratio test
  weight > 0; fraction-targeted selection composes with
  ``sketches.value_quantiles`` over the (bounded, quantized) weight
  domain exactly like lm_perplexity_buckets.

Hash family: the affine (a*40503 + b*69621) mod 524287 pair hash shared
with the MinHash machinery, folded onto `buckets`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DSIR_A = 40503
DSIR_B = 69621
DSIR_P = 524287
DSIR_BUCKETS = 1024


def _bigram_buckets(df: DataFrame, tokens: str, keep: list[str]) -> DataFrame:
    """Explode each doc's adjacent token pairs into hashed feature
    buckets, carrying `keep` columns. posexplode + element_at on the
    SAME array attribute (codegen-safe; see sketches.bigram_counts)."""
    exploded = df.select(
        *keep, F.col(tokens).alias("__t")
    ).select(*keep, "__t", F.posexplode("__t").alias("i", "a"))
    return exploded.filter(F.col("i") < F.size("__t") - 1).select(
        *keep,
        (
            (
                F.col("a").cast("long") * DSIR_A
                + F.element_at("__t", F.col("i") + F.lit(2)).cast("long") * DSIR_B
            )
            % DSIR_P
            % DSIR_BUCKETS
        ).alias("bucket"),
    )


def _bigram_buckets_sql(rel: str, tokens: str, keep: str) -> str:
    return f"""
        SELECT {keep},
               (toks[i + 1] * {DSIR_A} + toks[i + 2] * {DSIR_B})
                 % {DSIR_P} % {DSIR_BUCKETS} AS bucket
        FROM (SELECT {keep}, {tokens} AS toks FROM {rel}),
             unnest(range(len(toks) - 1)) AS r(i)
    """


def dsir_logratio_table(
    doc: DataFrame, is_target: Column, tokens: str = "tokens"
) -> DataFrame:
    """(bucket, term_milli): the quantized per-feature log-likelihood
    ratio table. One bucket-keyed exchange; output bounded at
    DSIR_BUCKETS rows (broadcast it downstream). term_milli =
    round(1000 * (ln p_target(f) - ln p_raw(f))), add-1 smoothed."""
    feats = _bigram_buckets(
        doc.withColumn("__tgt", is_target.cast("int")), tokens, ["__tgt"]
    )
    counts = feats.groupBy("bucket").agg(
        F.sum("__tgt").cast("long").alias("ct"),
        F.count("*").cast("long").alias("cr"),
    )
    tot = counts.select(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )  # 1-row; the crossJoin below is a broadcast of a folded scalar pair
    b = float(DSIR_BUCKETS)
    term = (
        F.log((F.col("ct") + 1.0) / (F.col("tt") + b))
        - F.log((F.col("cr") + 1.0) / (F.col("tr") + b))
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket", F.round(term * 1000.0, 0).cast("long").alias("term_milli")
    )


def dsir_weights(
    doc: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    tokens: str = "tokens",
) -> DataFrame:
    """(id, weight_milli, selected): exact-integer importance weight per
    document and the likelihood-ratio selection flag (weight > 0).
    Docs too short for a bigram get weight 0 (flat prior — unselected)."""
    table = dsir_logratio_table(doc, is_target, tokens)
    feats = _bigram_buckets(doc, tokens, [id_col])
    w = (
        feats.join(F.broadcast(table), "bucket")
        .groupBy(id_col)
        .agg(F.sum("term_milli").alias("__w"))
    )
    return doc.select(id_col).join(w, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("__w"), F.lit(0)).cast("long").alias("weight_milli"),
        (F.coalesce(F.col("__w"), F.lit(0)) > 0).cast("int").alias("selected"),
    )


def dsir_weights_sql(
    rel: str = "doc",
    target_pred: str = "lang = 'en'",
    id_expr: str = "doc_id",
    tokens: str = "tokens",
) -> str:
    """DuckDB twin of ``dsir_weights`` — identical hash, identical
    quantization point (one ln pair per bucket, rounded to milli-nats
    BEFORE the per-doc sum, so both engines sum the same integers)."""
    b = float(DSIR_BUCKETS)
    feats_t = _bigram_buckets_sql(
        f"(SELECT CASE WHEN {target_pred} THEN 1 ELSE 0 END AS tgt,"
        f" {tokens}, {id_expr} FROM {rel})",
        tokens,
        "tgt",
    )
    feats_d = _bigram_buckets_sql(rel, tokens, id_expr)
    return f"""
    WITH dsb AS (
      SELECT bucket, CAST(SUM(tgt) AS BIGINT) AS ct,
             CAST(COUNT(*) AS BIGINT) AS cr
      FROM ({feats_t}) GROUP BY bucket),
    dst AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt,
                   CAST(SUM(cr) AS BIGINT) AS tr FROM dsb),
    dsl AS (
      SELECT bucket,
             CAST(round((ln((ct + 1.0) / (tt + {b}))
                         - ln((cr + 1.0) / (tr + {b}))) * 1000.0) AS BIGINT)
               AS term_milli
      FROM dsb CROSS JOIN dst),
    dsw AS (
      SELECT {id_expr}, SUM(term_milli) AS w
      FROM ({feats_d}) JOIN dsl USING (bucket)
      GROUP BY {id_expr})
    SELECT d.{id_expr} AS ddoc,
           CAST(COALESCE(dsw.w, 0) AS BIGINT) AS weight_milli,
           CASE WHEN COALESCE(dsw.w, 0) > 0 THEN 1 ELSE 0 END AS selected
    FROM {rel} d LEFT JOIN dsw ON dsw.{id_expr} = d.{id_expr}
    """
