"""Registry extension 2: attribute-map operators, first-match cascade,
sibling combinator, skew salting, lineage, streaming and multimodal
coverage — every entry DuckDB-oracle-checked (lineage and the multimodal
fake decoder use the cross-engine affine hash family; round 1 had them
rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_html_transform_spark.operators import transforms as X
from go_html_transform_spark.plans.pipeline import Transformer
from go_html_transform_spark.plans.registry import _cte, register
from go_html_transform_spark.sources import tables as S


def _seq_with_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequences + attrs map parsed from the events.props JSON string —
    the node-attribute analogue (h5 Attr []Attribute{Key,Val})."""
    seq = S.sequences(spark, sf_dir)
    return seq.withColumn("attrs", F.from_json("props", "map<string,string>"))


# ---------------------------------------------------------------------------
# §2.10 attribute operators over the props map
# ---------------------------------------------------------------------------


@register(
    "attr_ops",
    _cte(
        """
        SELECT 'modify_upsert' AS variant, event_id,
               CASE WHEN event_type = 'click' THEN 'clicked'
                    ELSE json_extract_string(props, '$.k') END AS k_out
        FROM seq
        UNION ALL
        SELECT 'transform_existing' AS variant, event_id,
               json_extract_string(props, '$.k') || '!' AS k_out
        FROM seq
        """
    ),
)
def attr_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both attribute-map mutation operators in one hash-checked union:

    * modify_upsert — ModifyAttrib (transform.go:283-299): upsert
      attrs['k'] on matched rows (match = event_type click)
    * transform_existing — TransformAttrib (transform.go:301-312): map
      the existing 'k' value through a function; key always present in
      this corpus so the no-op branch is covered by unit tests instead
    """
    df = _seq_with_attrs(spark, sf_dir)
    modified = df.withColumn(
        "attrs",
        F.when(
            F.col("event_type") == "click",
            X.modify_attrib("attrs", "k", "clicked"),
        ).otherwise(F.col("attrs")),
    ).select(
        F.lit("modify_upsert").alias("variant"),
        "event_id",
        F.element_at("attrs", "k").alias("k_out"),
    )
    transformed = df.withColumn(
        "attrs",
        X.transform_attrib("attrs", "k", lambda v: F.concat(v, F.lit("!"))),
    ).select(
        F.lit("transform_existing").alias("variant"),
        "event_id",
        F.element_at("attrs", "k").alias("k_out"),
    )
    return modified.unionByName(transformed)


@register(
    "match_attr_selector",
    _cte(
        """
        SELECT event_id FROM seq
        WHERE json_extract_string(props, '$.k') = '7'
          AND list_contains(tokens, 982)
        """
    ),
)
def match_attr_selector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attr selector `t982[k=7]` through the rule engine (attr predicates
    over the map column; data.go:122-124 Exactly mode)."""
    df = _seq_with_attrs(spark, sf_dir)
    tr = Transformer(df, attrs_col="attrs")
    return tr.matched("t982[k=7]").select("event_id")


# ---------------------------------------------------------------------------
# §2.8 FirstMatch cascade + sibling combinator
# ---------------------------------------------------------------------------


@register(
    "transform_first_match",
    _cte(
        """
        SELECT event_id,
               array_to_string(
                 CASE WHEN list_contains(tokens, 310) THEN list_append(tokens, 555)
                      WHEN list_contains(tokens, 982) THEN list_append(tokens, 555)
                      ELSE tokens END, ',') AS tokens_csv
        FROM seq
        """
    ),
)
def transform_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ApplyToFirstMatch (transform.go:99-110): first non-empty rule wins
    per row — one projection, no repeated scans."""
    seq = S.sequences(spark, sf_dir)
    tr = Transformer(seq).apply_to_first_match(
        lambda t, p: X.append_children(t, [555]), "t310", "t982"
    )
    return tr.df.select(
        "event_id", F.concat_ws(",", F.col("tokens")).alias("tokens_csv")
    )


@register(
    "match_sibling_combinator",
    _cte(
        """
        SELECT event_id, CAST(pos AS INTEGER) AS pos
        FROM (
            SELECT event_id,
                   unnest(tokens) AS tok,
                   unnest(range(len(tokens))) AS pos,
                   len(list_filter(tokens, t -> t = 310)) AS n310,
                   tokens
            FROM seq
        )
        WHERE tok = 982
          AND (n310 > 1 OR (n310 = 1 AND tokens[CAST(pos + 1 AS INTEGER)] != 310))
        """
    ),
)
def match_sibling_combinator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sibling `t310 ~ t982` (data.go:300-311): any 982 with a 310
    elsewhere in the sequence (both directions, excluding itself)."""
    seq = S.sequences(spark, sf_dir)
    m = Transformer(seq).matched("t310 ~ t982")
    return m.select("event_id", F.explode("match_pos").alias("pos"))


# ---------------------------------------------------------------------------
# §4 skew salting — salted aggregate must equal the plain aggregate
# ---------------------------------------------------------------------------


@register(
    "salted_source_counts",
    _cte(
        """
        SELECT source, COUNT(*) AS cnt FROM seq GROUP BY source
        """
    ),
)
def salted_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted count on the (skewed) source key — must equal the
    plain GROUP BY, proving salting is semantics-free."""
    from go_html_transform_spark.operators.skew import salted_count

    seq = S.sequences(spark, sf_dir)
    return salted_count(seq, "source", "event_id", n_salts=16)


# ---------------------------------------------------------------------------
# lineage / streaming / multimodal — oracle-checked via cross-engine hashes
# ---------------------------------------------------------------------------


def _lineage_oracle() -> str:
    from go_html_transform_spark.plans.lineage import affine_digest_sql

    key = "CAST(SUBSTR(doc_id, 2) AS BIGINT)"  # 'd000007' -> 7
    bucket = f"({affine_digest_sql([key])}) % 32"
    digest = affine_digest_sql(
        ["event_id", "n_tok", "CAST(epoch_us(event_time) AS BIGINT)"]
    )
    return _cte(
        f"""
        SELECT 'registry_stage' AS stage,
               CAST(bucket AS INTEGER) AS bucket,
               COUNT(*) AS n_rows,
               CAST(SUM(digest) % {2**62} AS BIGINT) AS checksum
        FROM (
            SELECT {bucket} AS bucket, {digest} AS digest FROM seq
        ) GROUP BY bucket
        """
    )


@register("lineage_partition_rows", _lineage_oracle())
def lineage_partition_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition lineage rows (north rule): bucket, count, checksum —
    computed with the cross-engine affine hash family so the lineage
    operator ITSELF is oracle-checked (the production default swaps in
    xxhash64 per-column, same plan shape)."""
    from go_html_transform_spark.plans.lineage import (
        affine_digest,
        partition_lineage,
    )

    seq = S.sequences(spark, sf_dir)
    key_num = F.substring("doc_id", 2, 16).cast("long")
    digest = affine_digest(
        [
            F.col("event_id"),
            F.col("n_tok"),
            F.unix_micros(F.col("event_time").cast("timestamp")),
        ]
    )
    return partition_lineage(
        seq,
        "registry_stage",
        n_buckets=32,
        bucket_expr=affine_digest([key_num]),
        digest_expr=digest,
    ).select("stage", "bucket", "n_rows", "checksum")


@register(
    "streaming_session_counts",
    _cte(
        """
        , g AS (
            -- F.session_window is half-open [t, t+gap): an event at exactly
            -- last+gap starts a NEW session, hence >= here (the batch
            -- sessionize operator pins strict >; boundary hits have
            -- probability ~0 on µs-precision data but the oracle must match
            -- the engine under test, not its batch sibling)
            SELECT doc_id, n_tok,
                   CASE WHEN epoch_us(event_time)
                             - LAG(epoch_us(event_time)) OVER w
                             >= 1800 * 1000000
                          OR LAG(epoch_us(event_time)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_new,
                   event_time
            FROM seq
            WINDOW w AS (PARTITION BY doc_id ORDER BY event_time)
        ), t AS (
            SELECT doc_id, n_tok,
                   SUM(is_new) OVER (PARTITION BY doc_id ORDER BY event_time
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM g
        )
        SELECT doc_id, COUNT(*) AS n_events, CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok
        FROM t GROUP BY doc_id, sid
        """
    ),
)  # Structured Streaming vs a batch-SQL sessionization oracle
def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked session-window aggregation drained with availableNow —
    matches batch sessionize (asserted in tests)."""
    from go_html_transform_spark.streaming import stream as ST

    s = ST.stream_sequences(spark, sf_dir)
    return ST.run_available_now(
        ST.streaming_session_counts(s, gap_seconds=1800), "reg_sess"
    ).select("doc_id", "n_events", "sum_n_tok")


def _multimodal_oracle() -> str:
    from go_html_transform_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
    )

    feats = []
    for j in range(8):
        a = (2 * j + 1) * MINHASH_A % MINHASH_P
        b = j * MINHASH_B % MINHASH_P
        feats.append(f"CAST((s * {a} + {b}) % {MINHASH_P} AS BIGINT)")
    csv = " || ',' || ".join(f"CAST({f} AS VARCHAR)" for f in feats)
    return f"""
        SELECT media_id, kind, {csv} AS features_csv
        FROM (
            SELECT 'm' || doc_id AS media_id, 'image' AS kind,
                   CAST(COALESCE(list_sum(list_transform(
                            string_split(text, ''), c -> ascii(c))), 0)
                        AS BIGINT) % {MINHASH_P} AS s
            FROM documents
        )
    """


@register("multimodal_decode_features", _multimodal_oracle())
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media plumbing: documents' text bytes as opaque payloads ->
    mapInPandas fake decode -> stable feature vectors. The fake decoder
    derives features from an SQL-expressible byte-sum digest (affine
    MinHash family), so this whole Arrow path is now oracle-checked —
    the real codec swap-in is the only untested step (by necessity)."""
    from go_html_transform_spark.operators import multimodal as MM

    doc = S.load_table(spark, sf_dir, "documents")
    media = doc.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(48).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    out = MM.decode_media(media, fake=True)
    return out.select(
        "media_id",
        "kind",
        F.concat_ws(
            ",",
            *[
                F.element_at("features", j + 1).cast("bigint").cast("string")
                for j in range(8)
            ],
        ).alias("features_csv"),
    )


@register(
    "transform_subtransform_scoped",
    _cte(
        """
        SELECT event_id,
               array_to_string(
                 CASE WHEN list_contains(tokens, 310) THEN
                   list_transform(range(len(tokens)),
                     i -> CASE WHEN i >= list_position(tokens, 310) - 1
                                AND tokens[i+1] = 982
                          THEN tokens[i+1] + 1 ELSE tokens[i+1] END)
                 ELSE tokens END, ',') AS tokens_csv
        FROM seq
        """
    ),
)
def transform_subtransform_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-rooted Subtransform (transform.go:250-281): rewrite token 982
    only at or after the first 310 — the flat-model subtree scope."""
    seq = S.sequences(spark, sf_dir)
    tr = Transformer(seq).apply(
        "t310",
        lambda t, p: X.subtransform_scoped(
            t, p, lambda tok: tok == 982, lambda tok: tok + 1
        ),
    )
    return tr.df.select(
        "event_id", F.concat_ws(",", F.col("tokens")).alias("tokens_csv")
    )


def _vocab_css_sql() -> str:
    from go_html_transform_spark.functions.csstokenize import css_tokens_sql

    return css_tokens_sql("text")


@register(
    "vocab_token_exemplars",
    _cte(
        f"""
        SELECT 'word' AS variant, tok, MIN(w) AS exemplar,
               COUNT(*) AS occurrences
        FROM (
            SELECT unnest(list_filter(string_split(text, ' '),
                                      x -> length(x) > 0)) AS w,
                   unnest(list_transform(
                       list_filter(string_split(text, ' '), x -> length(x) > 0),
                       x -> CAST((ascii(x) * 7 + ascii(x[-1]) * 131
                                  + length(x) * 1009) % 1024 AS INTEGER))) AS tok
            FROM documents
        )
        GROUP BY tok
        UNION ALL
        SELECT 'css', u.t, MIN(u.s), COUNT(*)
        FROM (SELECT unnest({_vocab_css_sql()}) AS u FROM documents)
        GROUP BY u.t
        """
    ),
)
def vocab_token_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocab dimension (token-id -> exemplar string), two frontends:

    * word — hash word-tokenizer exemplars: the h5.Data projection's
      broadcast-lookup side (SURVEY §2.2) and the engine twin of the
      tokenizer's token-type string table (tokentype_string.go)
    * css — the in-engine CSS tokenizer (functions/csstokenize.py, the
      css/tokenizer/tokenizer.go:120-154 type table as first-class
      engine surface): every document's text through the full
      regexp-alternation scanner, grouped by token TYPE with the
      lexicographic-min lexeme as exemplar — hash-checks the entire
      33-type classification against the DuckDB twin at corpus scale."""
    from go_html_transform_spark.functions.csstokenize import css_tokens
    from go_html_transform_spark.functions.tokenize import word_token_expr

    doc = S.load_table(spark, sf_dir, "documents")
    words = doc.select(
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("w")
    ).withColumn("tok", word_token_expr(F.col("w")))
    word_rows = words.groupBy("tok").agg(
        F.min("w").alias("exemplar"), F.count("*").alias("occurrences")
    ).select(F.lit("word").alias("variant"), "tok", "exemplar", "occurrences")
    css_rows = (
        doc.select(F.explode(css_tokens(F.col("text"))).alias("u"))
        .groupBy(F.col("u.t").alias("tok"))
        .agg(F.min("u.s").alias("exemplar"), F.count("*").alias("occurrences"))
        .select(F.lit("css").alias("variant"), "tok", "exemplar", "occurrences")
    )
    return word_rows.unionByName(css_rows)


@register(
    "streaming_stateful_features",
    _cte(
        """
        , g AS (
            SELECT doc_id, event_id, n_tok,
                   CASE WHEN epoch_us(event_time)
                             - LAG(epoch_us(event_time)) OVER w
                             > 1800 * 1000000
                          OR LAG(epoch_us(event_time)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_new,
                   event_time
            FROM seq
            WINDOW w AS (PARTITION BY doc_id ORDER BY event_time, event_id)
        )
        SELECT doc_id, event_id,
               CAST(SUM(is_new) OVER wc - 1 AS INTEGER) AS session_id,
               ROW_NUMBER() OVER wc AS cum_events,
               CAST(SUM(n_tok) OVER wc AS BIGINT) AS cum_n_tok
        FROM g
        WINDOW wc AS (PARTITION BY doc_id ORDER BY event_time, event_id
                      ROWS UNBOUNDED PRECEDING)
        """
    ),
)  # applyInPandasWithState vs a batch-SQL running-features oracle
def streaming_stateful_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-
    entity running session/cumulative features with GroupState carried
    across micro-batches — cross-batch parity vs the batch window bundle
    asserted in tests/test_multimodal_streaming.py."""
    from go_html_transform_spark.streaming import stream as ST

    s = ST.stream_sequences(spark, sf_dir)
    out = ST.streaming_stateful_features(s, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("reg_stateful")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("reg_stateful").select(
        "doc_id", "event_id", "session_id", "cum_events", "cum_n_tok"
    )


@register(
    "streaming_rule_counts",
    _cte(
        """
        SELECT CAST(epoch_us(event_time) // 3600000000 * 3600000000 AS BIGINT)
                 AS window_start_us,
               source,
               COUNT(*) AS n_matches
        FROM seq WHERE list_contains(tokens, 982)
        GROUP BY 1, 2
        """
    ),
)
def streaming_rule_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selector-rule match counts per tumbling hour on the STREAM: the
    compiled rule predicate is a stateless Column expression, so the
    incremental planner gets an ordinary watermarked windowed agg —
    drained with availableNow and checked against the batch-SQL oracle
    (epoch-aligned hour buckets match F.window's epoch alignment)."""
    from go_html_transform_spark.streaming import stream as ST

    s = ST.stream_sequences(spark, sf_dir)
    out = ST.streaming_rule_counts(s, "t982", window="1 hour")
    res = ST.run_available_now(out, "reg_rule_counts")
    return res.select(
        F.unix_micros(F.col("window_start").cast("timestamp")).alias(
            "window_start_us"
        ),
        "source",
        "n_matches",
    )
