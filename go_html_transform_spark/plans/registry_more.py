"""Registry extension 3: the remaining SURVEY.md §2 line items as
oracle-checked queries — prepend/remove/replace mutation ops
(transform.go:169-201), pseudo-class position predicates
(css/selector/data.go:136-145), the reference-TODO attr substring matchers
(parse.go:104), set operations over match sets (§2.8), rollup aggregation,
top-k, and the brute-force embedding near-dup pass (training-data op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_html_transform_spark.operators import dedup as D
from go_html_transform_spark.operators import transforms as X
from go_html_transform_spark.plans.pipeline import Transformer
from go_html_transform_spark.plans.registry import _cte, register
from go_html_transform_spark.sources import tables as S


def _tokens_csv(df: DataFrame) -> DataFrame:
    return df.select("event_id", F.concat_ws(",", F.col("tokens")).alias("tokens_csv"))


# ---------------------------------------------------------------------------
# §2.10 remaining mutation operators
# ---------------------------------------------------------------------------


@register(
    "transform_prepend",
    _cte(
        """
        SELECT event_id,
               array_to_string(
                 CASE WHEN list_contains(tokens, 982)
                      THEN list_concat([7], tokens) ELSE tokens END, ',')
               AS tokens_csv
        FROM seq
        """
    ),
)
def transform_prepend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PrependChildren (transform.go:169-176): insert before FirstChild on
    rows matching rule `t982`."""
    seq = S.sequences(spark, sf_dir)
    tr = Transformer(seq).apply("t982", lambda t, p: X.prepend_children(t, [7]))
    return _tokens_csv(tr.df)


@register(
    "transform_remove_children",
    _cte(
        """
        SELECT event_id,
               CASE WHEN source = 'src2' THEN ''
                    ELSE array_to_string(tokens, ',') END AS tokens_csv
        FROM seq
        """
    ),
)
def transform_remove_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RemoveChildren (transform.go:178-190): drop the whole child list of
    rows matched by the class-analogue rule `.src2` (source == 'src2')."""
    seq = S.sequences(spark, sf_dir)
    tr = Transformer(seq).apply(".src2", lambda t, p: X.remove_children(t))
    return _tokens_csv(tr.df)


@register(
    "transform_replace_children",
    _cte(
        """
        SELECT event_id,
               array_to_string(
                 CASE WHEN list_contains(tokens, 756)
                      THEN [5, 6, 7] ELSE tokens END, ',') AS tokens_csv
        FROM seq
        """
    ),
)
def transform_replace_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplaceChildren (transform.go:192-201): remove all then append the
    given nodes, on rows matching rule `t756`."""
    seq = S.sequences(spark, sf_dir)
    tr = Transformer(seq).apply("t756", lambda t, p: X.replace_children(t, [5, 6, 7]))
    return _tokens_csv(tr.df)


# ---------------------------------------------------------------------------
# §2.4 pseudo-class predicates (data.go:136-145)
# ---------------------------------------------------------------------------


@register(
    "match_pseudo_first_child",
    _cte("SELECT event_id FROM seq WHERE tokens[1] = 982"),
)
def match_pseudo_first_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`t982:first-child` — token 982 at position 0 (Parent.FirstChild == n,
    data.go:138-139; :root is the same predicate in the flat model)."""
    seq = S.sequences(spark, sf_dir)
    return Transformer(seq).matched("t982:first-child").select("event_id")


@register(
    "match_pseudo_last_child",
    _cte("SELECT event_id FROM seq WHERE tokens[len(tokens)] = 982"),
)
def match_pseudo_last_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`t982:last-child` — token 982 at the final position
    (Parent.LastChild == n, data.go:140-141)."""
    seq = S.sequences(spark, sf_dir)
    return Transformer(seq).matched("t982:last-child").select("event_id")


# ---------------------------------------------------------------------------
# §2.4 attr substring matchers — tokenized but unparsed in the reference
# (TODO css/selector/parse.go:104); first-class here
# ---------------------------------------------------------------------------


@register(
    "match_attr_substring_ops",
    _cte(
        """
        SELECT event_id, 'prefix' AS op FROM seq
        WHERE json_extract_string(props, '$.k') LIKE '6%'
        UNION ALL
        SELECT event_id, 'suffix' AS op FROM seq
        WHERE json_extract_string(props, '$.k') LIKE '%9'
        UNION ALL
        SELECT event_id, 'substring' AS op FROM seq
        WHERE json_extract_string(props, '$.k') LIKE '%2%'
        """
    ),
)
def match_attr_substring_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`[k^=6]` / `[k$=9]` / `[k*=2]` over the props attr map — the ^= $= *=
    modes the reference tokenizes (tokenizer.go:467-472) but never parses."""
    seq = S.sequences(spark, sf_dir).withColumn(
        "attrs", F.from_json("props", "map<string,string>")
    )
    tr = Transformer(seq, attrs_col="attrs")
    parts = [
        tr.matched("[k^=6]").select("event_id", F.lit("prefix").alias("op")),
        tr.matched("[k$=9]").select("event_id", F.lit("suffix").alias("op")),
        tr.matched("[k*=2]").select("event_id", F.lit("substring").alias("op")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# §2.8 set operations over match sets
# ---------------------------------------------------------------------------


@register(
    "match_set_intersect_except",
    _cte(
        """
        SELECT event_id, 'both' AS tag FROM (
            SELECT event_id FROM seq WHERE list_contains(tokens, 982)
            INTERSECT
            SELECT event_id FROM seq WHERE list_contains(tokens, 756)
        )
        UNION ALL
        SELECT event_id, 'only_982' AS tag FROM (
            SELECT event_id FROM seq WHERE list_contains(tokens, 982)
            EXCEPT
            SELECT event_id FROM seq WHERE list_contains(tokens, 756)
        )
        """
    ),
)
def match_set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect/exceptAll over two rules' match sets — the set-op layer the
    reference lacks (SURVEY §2.8 'absent')."""
    seq = S.sequences(spark, sf_dir)
    tr = Transformer(seq)
    a = tr.matched("t982").select("event_id")
    b = tr.matched("t756").select("event_id")
    return a.intersect(b).withColumn("tag", F.lit("both")).unionByName(
        a.exceptAll(b).withColumn("tag", F.lit("only_982"))
    )


# ---------------------------------------------------------------------------
# §2.6 rollup aggregation + §2.8 top-k
# ---------------------------------------------------------------------------


@register(
    "agg_rollup_source_lang",
    _cte(
        """
        SELECT source, lang, COUNT(*) AS n, CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok
        FROM seq GROUP BY ROLLUP (source, lang)
        """
    ),
)
def agg_rollup_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (source -> lang -> grand total) — partial
    map-side aggregation, one shuffle."""
    seq = S.sequences(spark, sf_dir)
    return seq.rollup("source", "lang").agg(
        F.count("*").alias("n"), F.sum("n_tok").alias("sum_n_tok")
    )


@register(
    "topk_longest_sequences",
    _cte(
        """
        SELECT event_id, n_tok FROM seq
        ORDER BY n_tok DESC, event_id LIMIT 20
        """
    ),
)
def topk_longest_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit top-k — physical plan is TakeOrderedAndProject (per-
    partition heaps + driver merge), never a global sort."""
    seq = S.sequences(spark, sf_dir)
    return (
        seq.select("event_id", "n_tok")
        .orderBy(F.col("n_tok").desc(), "event_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# training-data op: brute-force embedding cosine near-dup pairs
# ---------------------------------------------------------------------------


@register(
    "dedup_embedding_pairs",
    """
    SELECT id_a, id_b, ROUND(c, 6) AS cos FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_sum(list_transform(range(len(a.embedding)),
                        i -> CAST(a.embedding[i+1] AS DOUBLE)
                             * CAST(b.embedding[i+1] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(a.embedding,
                                x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(list_transform(b.embedding,
                                  x -> CAST(x AS DOUBLE) * x)))) AS c
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
    ) WHERE c >= 0.4
    """,
)
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, brute-force O(n^2) baseline
    (the LSH-bucketed path is sim_lsh_*). Threshold on the RAW similarity;
    output rounded to 6 decimals for the cross-engine hash."""
    emb = S.load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )  # float math widened BEFORE multiply, matching the oracle's CASTs
    return D.embedding_near_duplicates(emb, threshold=0.4)


# ---------------------------------------------------------------------------
# IVF ANN — deterministic seed codebook, fully oracle-checkable
# ---------------------------------------------------------------------------

_IVF_COS = (
    "list_sum(list_transform(range(len({a})), "
    "i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * x)))"
    " * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * x))))"
)

_IVF_ASSIGN_CTE = f"""
    c AS (SELECT vec_id AS cid, embedding AS cvec
          FROM embeddings WHERE vec_id < 8),
    a AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_IVF_COS.format(a='e.embedding', b='c.cvec')} DESC,
                          c.cid
               ) AS rk
        FROM embeddings e CROSS JOIN c
      ) WHERE rk = 1)
"""


@register(
    "sim_ivf_cluster_sizes",
    f"""
    WITH {_IVF_ASSIGN_CTE}
    SELECT cid AS centroid_id, COUNT(*) AS n FROM a GROUP BY cid
    """,
)
def sim_ivf_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization over the whole corpus: zero-shuffle literal-
    codebook argmax assignment (operators/similarity.py:ivf_assign), then a
    size histogram. At production scale this pass feeds a
    bucket(centroid_id)-partitioned layout for partition-pruned probes."""
    from go_html_transform_spark.operators import similarity as SIM

    emb = S.load_table(spark, sf_dir, "embeddings")
    cents = SIM.ivf_centroids(emb, k=8)
    return (
        SIM.ivf_assign(emb, cents)
        .groupBy("centroid_id")
        .agg(F.count("*").alias("n"))
    )


@register(
    "sim_ivf_topk",
    f"""
    WITH {_IVF_ASSIGN_CTE},
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    probes AS (
      SELECT cid FROM (
        SELECT c.cid,
               ROW_NUMBER() OVER (
                 ORDER BY {_IVF_COS.format(a='c.cvec', b='q.qv')} DESC, c.cid
               ) AS rk
        FROM c CROSS JOIN q
      ) WHERE rk <= 2)
    SELECT vec_id, cos FROM (
      SELECT e.vec_id,
             ROUND({_IVF_COS.format(a='e.embedding', b='q.qv')}, 6) AS cos
      FROM embeddings e
      JOIN a ON a.vec_id = e.vec_id
      CROSS JOIN q
      WHERE a.cid IN (SELECT cid FROM probes)
    ) ORDER BY cos DESC, vec_id LIMIT 10
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 for the vec_id=0 query: probe the 2 nearest of 8
    clusters, exact-score candidates — filter + TakeOrderedAndProject,
    no shuffle."""
    from go_html_transform_spark.operators import similarity as SIM

    emb = S.load_table(spark, sf_dir, "embeddings")
    cents = SIM.ivf_centroids(emb, k=8)
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0].embedding
    return SIM.ivf_topk(emb, list(qv), cents, k=10, nprobe=2)


# ---------------------------------------------------------------------------
# §2.4 remaining simple selectors: universal, id, :root
# ---------------------------------------------------------------------------


@register(
    "match_universal_positions",
    _cte(
        """
        SELECT event_id, n_tok AS n_matches, 0 AS first_pos
        FROM seq WHERE n_tok > 0
        """
    ),
)
def match_universal_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Universal `*` (data.go:20-21): every position matches — the full-scan
    Sequence.Find with an always-true predicate."""
    seq = S.sequences(spark, sf_dir)
    m = Transformer(seq).matched("*")
    return m.select(
        "event_id",
        F.size("match_pos").alias("n_matches").cast("int"),
        F.element_at("match_pos", 1).alias("first_pos"),
    )


@register(
    "match_id_selector",
    _cte(
        """
        SELECT event_id FROM seq
        WHERE doc_id = 'd000007' AND list_contains(tokens, 982)
        """
    ),
)
def match_id_selector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Id selector `t982#d000007` (data.go:155-158): row-level doc_id
    equality conjoined with the tag predicate."""
    seq = S.sequences(spark, sf_dir)
    return Transformer(seq).matched("t982#d000007").select("event_id")


@register(
    "match_pseudo_root",
    _cte("SELECT event_id FROM seq WHERE tokens[1] = 756"),
)
def match_pseudo_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`t756:root` — no-parent in the flat sequence model = position 0
    (data.go:136-137)."""
    seq = S.sequences(spark, sf_dir)
    return Transformer(seq).matched("t756:root").select("event_id")


# ---------------------------------------------------------------------------
# strict as-of (allow_exact_matches=False) + insert_before + keep-first dedup
# ---------------------------------------------------------------------------


@register(
    "asof_backward_strict",
    _cte(
        """, labd AS (SELECT doc_id, obs_time, MAX(label_value) AS label_value
                      FROM lab GROUP BY doc_id, obs_time)
        SELECT s.event_id, ROUND(l.label_value, 4) AS label_value
        FROM seq s ASOF LEFT JOIN labd l
          ON s.doc_id = l.doc_id AND s.event_time > l.obs_time
        """
    ),
)
def asof_backward_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT backward as-of (allow_exact_matches=False): a feature may
    only read labels STRICTLY before its own timestamp — the hard form of
    the zero-leakage guarantee, oracle-checked via DuckDB's strict ASOF."""
    from go_html_transform_spark.operators.asof import asof_join

    seq = S.sequences(spark, sf_dir).select("doc_id", "event_time", "event_id")
    lab = S.labels(spark, sf_dir)
    out = asof_join(
        seq, lab, on="doc_id", left_time="event_time", right_time="obs_time",
        direction="backward", allow_exact_matches=False,
    )
    return out.select("event_id", F.round("label_value", 4).alias("label_value"))


@register(
    "transform_insert_before",
    _cte(
        """
        SELECT event_id,
               array_to_string(
                 CASE WHEN list_contains(tokens, 982) THEN
                   list_concat(
                     list_concat(tokens[1:list_position(tokens, 982) - 1],
                                 [11, 12]),
                     tokens[list_position(tokens, 982):])
                 ELSE tokens END, ',') AS tokens_csv
        FROM seq
        """
    ),
)
def transform_insert_before(spark: SparkSession, sf_dir: str) -> DataFrame:
    """insert_before (CopyAnd's clone-placement half, transform.go:239-244):
    insert [11,12] before the FIRST occurrence of token 982."""
    seq = S.sequences(spark, sf_dir)
    tr = Transformer(seq).apply(
        "t982", lambda t, p: X.insert_before(t, F.element_at(p, 1), [11, 12])
    )
    return _tokens_csv(tr.df)


@register(
    "dedup_exact_keep_first",
    """
    SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rk
        FROM documents
    ) WHERE rk = 1
    """,
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact_dedup: keep the min-id representative per content key (the
    Chain.Find identity-set dedup, data.go:330-343, lifted to corpus
    scale). Keyed on raw text so both engines agree without sharing a
    hash function; at 10^12 rows the key is xxhash64(text) and the
    groupBy shuffles 8-byte keys instead of documents."""
    from go_html_transform_spark.operators.dedup import exact_dedup

    doc = S.load_table(spark, sf_dir, "documents")
    kept = exact_dedup(doc, "doc_id", F.col("text"))
    return kept.select("doc_id")


# ---------------------------------------------------------------------------
# as-of direction x tolerance matrix completion
# ---------------------------------------------------------------------------

_LABD = """labd AS (SELECT doc_id, obs_time, MAX(label_value) AS label_value
                    FROM lab GROUP BY doc_id, obs_time)"""


@register(
    "asof_forward_tolerance",
    _cte(
        f""", {_LABD}
        SELECT s.event_id,
               ROUND(CASE WHEN epoch_us(l.obs_time) - epoch_us(s.event_time)
                          <= 600 * 1000000
                     THEN l.label_value END, 4) AS label_value
        FROM seq s ASOF LEFT JOIN labd l
          ON s.doc_id = l.doc_id AND s.event_time <= l.obs_time
        """
    ),
)
def asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with 600s tolerance: labels too far in the future
    are nulled."""
    from go_html_transform_spark.operators.asof import asof_join

    seq = S.sequences(spark, sf_dir).select("doc_id", "event_time", "event_id")
    lab = S.labels(spark, sf_dir)
    out = asof_join(
        seq, lab, on="doc_id", left_time="event_time", right_time="obs_time",
        direction="forward", tolerance=600,
    )
    return out.select("event_id", F.round("label_value", 4).alias("label_value"))


@register(
    "asof_nearest_tolerance",
    _cte(
        f""", {_LABD},
        b AS (SELECT s.event_id, s.event_time,
                     CASE WHEN epoch_us(s.event_time) - epoch_us(l.obs_time)
                          <= 600 * 1000000 THEN l.obs_time END AS bt,
                     CASE WHEN epoch_us(s.event_time) - epoch_us(l.obs_time)
                          <= 600 * 1000000 THEN l.label_value END AS bv
              FROM seq s ASOF LEFT JOIN labd l
                ON s.doc_id = l.doc_id AND s.event_time >= l.obs_time),
        f AS (SELECT s.event_id,
                     CASE WHEN epoch_us(l.obs_time) - epoch_us(s.event_time)
                          <= 600 * 1000000 THEN l.obs_time END AS ft,
                     CASE WHEN epoch_us(l.obs_time) - epoch_us(s.event_time)
                          <= 600 * 1000000 THEN l.label_value END AS fv
              FROM seq s ASOF LEFT JOIN labd l
                ON s.doc_id = l.doc_id AND s.event_time <= l.obs_time)
        SELECT b.event_id,
               ROUND(CASE
                 WHEN b.bt IS NULL THEN f.fv
                 WHEN f.ft IS NULL THEN b.bv
                 WHEN epoch_us(b.event_time) - epoch_us(b.bt)
                      <= epoch_us(f.ft) - epoch_us(b.event_time) THEN b.bv
                 ELSE f.fv END, 4) AS label_value
        FROM b JOIN f ON b.event_id = f.event_id
        """
    ),
)
def asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of with 600s tolerance applied per side BEFORE choosing
    (pandas semantics, pinned by the property test)."""
    from go_html_transform_spark.operators.asof import asof_join

    seq = S.sequences(spark, sf_dir).select("doc_id", "event_time", "event_id")
    lab = S.labels(spark, sf_dir)
    out = asof_join(
        seq, lab, on="doc_id", left_time="event_time", right_time="obs_time",
        direction="nearest", tolerance=600,
    )
    return out.select("event_id", F.round("label_value", 4).alias("label_value"))
