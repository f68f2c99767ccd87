"""Deterministic synthetic corpora with realistic token statistics.

The driver testdata's documents table has a ~30-id vocabulary, which is
pathological for anything frequency-shaped: LSH candidate rates explode
(every doc shares every shingle), BM25 document frequencies are flat,
and BPE's hottest pairs all interact (they share the one hot token).
This module generates a corpus with a 32k-token Zipf(~1) vocabulary and
a planted near-duplicate structure, entirely from hash arithmetic — no
external data, no RNG state, bit-identical at any partitioning and any
scale factor. Used by the realistic-rate benchmarks (tools/bench_zipf.py
-> BENCH/OPS.md) and fixture tests.

Generation is column-expression only (xxhash64 + pow inside HOF
transform): a fixture builder, deliberately simple over codegen-optimal
— the lambdas are CodegenFallback, acceptable off the hot path.

Zipf sampling uses the classic log-uniform trick: for u ~ U[0,1),
floor(V^u) takes value k with probability ln(k+1)-ln(k) over ln(V+1),
i.e. ~ 1/k — a rank-frequency law with exponent ~1 over ranks 1..V
(token ids are the ranks; id 1 is the hottest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _u01(*cols) -> "F.Column":
    """Deterministic uniform [0,1) from xxhash64 of the args."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1_000_000_000)) + 0.5) / 1e9


def _zipf_token(u, vocab_size: int) -> "F.Column":
    """floor(V^u): rank-frequency ~ 1/k over ids 1..vocab_size."""
    return F.floor(F.pow(F.lit(float(vocab_size)), u)).cast("int")


def zipf_documents(
    spark: SparkSession,
    n_docs: int,
    vocab_size: int = 32_768,
    avg_len: int = 200,
    dup_every: int = 20,
    perturb_ppm: int = 50_000,
    seed: int = 7,
) -> DataFrame:
    """(doc_id string, doc_key long, tokens array<int>, is_dup boolean).

    Every doc whose index ``i`` satisfies ``i % dup_every == 1`` is a
    near-copy of doc ``i-1`` (whose index is ``% dup_every == 0``, so a
    base — never a copy-of-a-copy chain): same length, same tokens
    except ~``perturb_ppm``/1e6 of positions re-drawn from the doc's own
    hash stream. Lengths are uniform on [32, 2*avg_len-32] keyed by the
    CONTENT seed, so a dup and its base always align position-for-
    position. Pure function of (index, seed): layout-independent."""
    if dup_every < 2:
        raise ValueError(f"dup_every must be >= 2, got {dup_every}")
    base = spark.range(n_docs).select(F.col("id").alias("doc_key"))
    is_dup = (F.pmod(F.col("doc_key"), F.lit(dup_every)) == 1) & (
        F.col("doc_key") > 0
    )
    content_seed = F.col("doc_key") - is_dup.cast("long")
    lo, hi = 32, max(33, 2 * avg_len - 32)
    length = lo + F.pmod(
        F.xxhash64(content_seed, F.lit(seed), F.lit("len")), F.lit(hi - lo + 1)
    ).cast("int")
    # base token at position p comes from the content seed's stream;
    # dup docs re-draw ~perturb_ppm of positions from their OWN stream
    cs, dk, s = content_seed, F.col("doc_key"), F.lit(seed)
    tokens = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda p: F.when(
            F.pmod(F.xxhash64(dk, s, F.lit("pert"), p), F.lit(1_000_000))
            < F.lit(perturb_ppm),
            _zipf_token(_u01(dk, s, F.lit("own"), p), vocab_size),
        ).otherwise(_zipf_token(_u01(cs, s, F.lit("tok"), p), vocab_size)),
    )
    # non-dup docs must NOT pay (or show) the perturbation branch
    tokens_base = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda p: _zipf_token(_u01(cs, s, F.lit("tok"), p), vocab_size),
    )
    return base.select(
        F.format_string("z%09d", F.col("doc_key")).alias("doc_id"),
        "doc_key",
        F.when(is_dup, tokens).otherwise(tokens_base).alias("tokens"),
        is_dup.alias("is_dup"),
    )


def topic_embeddings(
    docs: DataFrame,
    dim: int = 64,
    n_topics: int = 50,
    noise_milli: int = 300,
    jitter_milli: int = 20,
    seed: int = 11,
    id_cols: tuple[str, ...] = ("doc_id", "doc_key"),
) -> DataFrame:
    """(id cols..., embedding array<double>): topic-mixture embeddings —
    the CLUSTERED regime of real semantic-embedding corpora (sentence
    embeddings concentrate around topical directions), where IVF's
    partition pruning earns its keep. Each doc draws a topic from its
    CONTENT seed (so a near-dup shares its base's topic and, up to the
    per-doc jitter, its vector): embedding = normalize(topic_center +
    noise_milli/1e3 * content_noise + jitter_milli/1e3 * doc_jitter),
    every component a deterministic hash-uniform in [-1, 1). Contrast
    with ``hashed_embeddings`` (hot-token-dominated, nearly isotropic
    after normalization — the ADVERSARIAL regime for ANN); BENCH/ANN.md
    reports recall on both. Requires the zipf_documents columns
    (doc_key, is_dup)."""
    is_dup = F.col("is_dup").cast("long")
    cs = F.col("doc_key") - is_dup
    topic = F.pmod(F.xxhash64(cs, F.lit(seed), F.lit("topic")), F.lit(n_topics))
    s = F.lit(seed)

    def u11(*cols):  # deterministic uniform [-1, 1)
        return _u01(*cols) * 2.0 - 1.0

    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            u11(topic, s, F.lit("c"), d)
            + F.lit(noise_milli / 1e3) * u11(cs, s, F.lit("n"), d)
            + F.lit(jitter_milli / 1e3) * u11(F.col("doc_key"), s, F.lit("j"), d)
        ),
    )
    dense = docs.select(*id_cols, topic.alias("topic"), raw.alias("__raw"))
    norm = F.sqrt(
        F.aggregate(F.col("__raw"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dense.select(
        *id_cols,
        "topic",
        F.transform(
            F.col("__raw"),
            lambda x: F.when(norm > 0, x / norm).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )


def hashed_embeddings(
    docs: DataFrame,
    dim: int = 64,
    id_cols: tuple[str, ...] = ("doc_id", "doc_key"),
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id cols..., embedding array<double>): the signed hashed
    bag-of-tokens feature map (Weinberger et al. 2009 hashing trick) —
    token t adds sign(hash(t,'sgn')) to dimension hash(t,'dim') % dim,
    then the vector is L2-normalized. Near-duplicate docs land within
    ~2*perturbed/len of each other in cosine, so SemDeDup-style
    embedding dedup has real structure to find. One explode + two
    partial-agg exchanges, no UDFs."""
    t = F.col("__tok")
    exploded = docs.select(*id_cols, F.explode(tokens_col).alias("__tok"))
    per_dim = exploded.select(
        *id_cols,
        F.pmod(F.xxhash64(t, F.lit("dim")), F.lit(dim)).cast("int").alias("__d"),
        F.when(F.pmod(F.xxhash64(t, F.lit("sgn")), F.lit(2)) == 0, -1.0)
        .otherwise(1.0)
        .alias("__v"),
    ).groupBy(*id_cols, "__d").agg(F.sum("__v").alias("__v"))
    dense = per_dim.groupBy(*id_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("__d", "__v"))).alias("__m")
    ).select(
        *id_cols,
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.coalesce(
                F.element_at(F.col("__m"), d.cast("int")), F.lit(0.0)
            ),
        ).alias("__raw"),
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("__raw"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return dense.select(
        *id_cols,
        F.transform(
            F.col("__raw"),
            lambda x: F.when(norm > 0, x / norm).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
