"""Learned quality classification: a hashed-feature logistic-regression
scorer (the fastText-style quality filter of CCNet/GPT-3-era pipelines:
train a linear model to separate a trusted corpus from crawl noise,
keep documents the model likes) trained DISTRIBUTED with exact
fixed-point aggregation.

Why fixed-point: float sums are partition-order dependent, so two runs
of the same job on different layouts would learn (slightly) different
models — unacceptable for the engine's reproducibility contract. Every
cross-row sum here is quantized to int64 micro-units (1e-6) BEFORE the
aggregation — per-doc margins AND per-bucket gradients — so integer
sums commute and the learned weights are bit-identical across
partitionings, core counts and retries. Quantization resolution 1e-6
sits far below the learning rate's resolution; tests pin layout
invariance exactly.

Scale shape per iteration (classic distributed batch-GD):

* weights (buckets + 1 doubles, ~8 KB at 1024 buckets) inline as
  literals — no join;
* per-doc margin: one (id, bucket)-keyed partial agg over the hashed
  features, one doc-keyed exact sum;
* per-bucket gradient: residual joined back (doc-keyed, partial-agg'd),
  output bounded at `buckets` rows, collected driver-side (~8 KB).

Features are the shared hashed-bigram family of operators/selection
(DSIR), so classifier and importance-resampler share feature extraction
at rest. Iterations are driver-looped (each one corpus pass — same
discipline as similarity.lloyd_refine / bpe.bpe_train).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_html_transform_spark.operators.selection import (
    DSIR_BUCKETS,
    _bigram_buckets,
)

MICRO = 1_000_000  # int64-exact fixed-point quantization unit


def _doc_features(
    doc: DataFrame, id_col: str, tokens: str, extra: list[str]
) -> DataFrame:
    """(id, extra..., bucket, x): per-doc length-normalized hashed-bigram
    frequencies. The normalizer is the doc's total bigram count
    (size(tokens) - 1), known ROW-LOCALLY before the explode — so the
    ONLY exchange is the (id, bucket)-keyed partial agg (a per-doc
    normalization window would force a second corpus-wide shuffle:
    hashpartitioning on the full groupBy key does not satisfy a
    partitionBy(id) window)."""
    with_nb = doc.withColumn(
        "__nb",
        F.greatest(F.size(F.col(tokens)) - 1, F.lit(1)).cast("long"),
    )
    counts = (
        _bigram_buckets(with_nb, tokens, [id_col, "__nb", *extra])
        .groupBy(id_col, "__nb", *extra, "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return counts.withColumn("x", F.col("cnt") / F.col("__nb")).drop(
        "cnt", "__nb"
    )


def _wlit(weights: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in weights])


def _margin_micro(weights: list[float]) -> Column:
    """Per-(bucket, x) margin contribution in exact micro-units — the
    per-doc sum of these int64s is partition-order independent."""
    term = F.element_at(_wlit(weights), F.col("bucket").cast("int") + 1) * F.col("x")
    return F.round(term * MICRO, 0).cast("long")


def train_logistic_hashed(
    doc: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    tokens: str = "tokens",
    num_iters: int = 20,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> tuple[list[float], float]:
    """Batch gradient descent for L2-regularized logistic regression on
    length-normalized hashed-bigram frequencies. Returns (weights, bias),
    bit-deterministic across layouts (see module docstring).

    Docs too short for any bigram feature carry no signal the model can
    use, so they sit OUT of training entirely — the gradient (bias
    included) and its 1/n normalizer run over featured docs only;
    scoring later assigns featureless docs the bare-bias prior."""
    feats = (
        _doc_features(doc.withColumn("__y", label.cast("int")), id_col, tokens, ["__y"])
        .persist()
    )
    n_docs = feats.select(id_col).distinct().count()
    if n_docs == 0:
        feats.unpersist()
        return [0.0] * DSIR_BUCKETS, 0.0
    w = [0.0] * DSIR_BUCKETS
    b = 0.0
    for _ in range(num_iters):
        per_doc = feats.groupBy(id_col, "__y").agg(
            F.sum(_margin_micro(w)).alias("__mm")
        )
        resid = per_doc.select(
            F.col(id_col),
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.col("__mm") / MICRO + F.lit(b))))
                - F.col("__y")
            ).alias("__r"),
        )
        rows = (
            feats.join(resid, id_col)
            .select(
                "bucket",
                F.round(F.col("__r") * F.col("x") * MICRO, 0)
                .cast("long")
                .alias("g"),
                F.round(F.col("__r") * MICRO, 0).cast("long").alias("gb"),
                # bias gradient counts once per doc via a min-bucket
                # flag; the window adds NO exchange — it sits directly
                # on the doc_id-keyed sort-merge join output, whose
                # partitioning and ordering already satisfy it
                # (plan-verified: Window directly above SortMergeJoin)
                (F.col("bucket") == F.min("bucket").over(Window.partitionBy(id_col)))
                .cast("int")
                .alias("__first"),
            )
            .groupBy("bucket")
            .agg(
                F.sum("g").alias("gsum"),
                F.sum(F.col("gb") * F.col("__first")).alias("gbsum"),
            )
            .collect()
        )
        bias_g = sum(int(r["gbsum"]) for r in rows)
        for r in rows:
            gi = int(r["gsum"]) / MICRO / n_docs + l2 * w[r["bucket"]]
            w[r["bucket"]] -= lr * gi
        b -= lr * (bias_g / MICRO / n_docs)
    feats.unpersist()
    return w, b


def hash_weights(
    n: int = DSIR_BUCKETS, mult: int = 2654435761, span: int = 1000
) -> list[float]:
    """Deterministic fixed weight vector for oracle-checked scoring:
    w[i] = ((i * mult) % span - span/2) / span — exactly reproducible as
    an inline SQL expression (integer ops then ONE double division), so
    the DuckDB twin never materializes the array."""
    return [((i * mult) % span - span // 2) / span for i in range(n)]


def score_hashed_cte_sql(
    rel: str = "doc",
    id_col: str = "doc_id",
    tokens: str = "tokens",
    mult: int = 2654435761,
    span: int = 1000,
    bias: float = 0.25,
) -> str:
    """DuckDB twin of ``score_logistic_hashed`` with ``hash_weights``:
    CTE chain ending in ``clf_sc`` (id, quality_logit). Mirrors the op
    order exactly — w*x as doubles, (w*x)*1e6 rounded HALF-AWAY-FROM-
    ZERO (verified identical tie rule both engines) to int64, exact sum,
    /1e6 + bias — so every double is bit-identical. Docs with no bigram
    (len < 2) are restored by the caller's LEFT JOIN + COALESCE(bias)."""
    from go_html_transform_spark.operators.selection import (
        DSIR_A,
        DSIR_B,
        DSIR_P,
    )

    w = f"(({{b}} * {mult}) % {span} - {span // 2}) / {span}.0"
    return f"""
    clf_feat AS (
      SELECT {id_col}, nb,
             (toks[i + 1] * {DSIR_A} + toks[i + 2] * {DSIR_B})
               % {DSIR_P} % {DSIR_BUCKETS} AS bucket
      FROM (SELECT {id_col}, {tokens} AS toks,
                   GREATEST(len({tokens}) - 1, 1) AS nb FROM {rel}),
           unnest(range(len(toks) - 1)) AS r(i)),
    clf_sc AS (
      SELECT {id_col},
             SUM(CAST(ROUND(({w.format(b='bucket')}) * (cnt / nb) * {MICRO}, 0)
                      AS BIGINT)) / {MICRO} + {bias} AS quality_logit
      FROM (SELECT {id_col}, nb, bucket, COUNT(*) AS cnt
            FROM clf_feat GROUP BY 1, 2, 3)
      GROUP BY {id_col})
    """


def score_logistic_hashed(
    doc: DataFrame,
    weights: list[float],
    bias: float,
    id_col: str = "doc_id",
    tokens: str = "tokens",
    out_col: str = "quality_logit",
) -> DataFrame:
    """Row-independent scoring pass: (id, logit, p) for EVERY doc (docs
    with no bigram feature score the bare bias). Weights inline as
    literals; same fixed-point margin as training, so scores are
    layout-invariant too."""
    feats = _doc_features(doc, id_col, tokens, [])
    logits = feats.groupBy(id_col).agg(
        ((F.sum(_margin_micro(weights)) / MICRO) + F.lit(float(bias))).alias(
            out_col
        )
    )
    return (
        doc.select(id_col)
        .join(logits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col(out_col), F.lit(float(bias))).alias(out_col),
        )
        .withColumn(
            "quality_p",
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(out_col))),
        )
    )
