"""Registry extension: training-data pipeline queries — dedup, similarity
search, text analysis, and a star-schema aggregation sanity query.

Every Spark kernel here has a DuckDB SQL twin generated from THE SAME
constants (operators/dedup.py, operators/similarity.py, functions/text.py),
verified bit-identical on fixture rows before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_html_transform_spark.functions import redact as RD
from go_html_transform_spark.functions import repetition as REP
from go_html_transform_spark.functions import text as TX
from go_html_transform_spark.functions import tokenize as TK
from go_html_transform_spark.operators import bloom as BL
from go_html_transform_spark.operators import bpe as BPE
from go_html_transform_spark.operators import boilerplate as BP
from go_html_transform_spark.operators import classifier as CLF
from go_html_transform_spark.operators import decontaminate as DC
from go_html_transform_spark.operators import dedup as D
from go_html_transform_spark.operators import packing as PK
from go_html_transform_spark.operators import retrieval as R
from go_html_transform_spark.operators import sampling as SAM
from go_html_transform_spark.operators import selection as SEL
from go_html_transform_spark.operators import sharding as SH
from go_html_transform_spark.operators import sketches as SK
from go_html_transform_spark.operators import spandedup as SP
from go_html_transform_spark.plans.registry import _cte, register
from go_html_transform_spark.sources import tables as S

# ---------------------------------------------------------------------------
# text analysis (documents table)
# ---------------------------------------------------------------------------


@register(
    "text_analysis_suite",
    _cte(
        f"""
        , {BP.remove_boilerplate_ctes('doc')}
        , {SK.distinctive_tokens_ctes('doc')}
        , {CLF.score_hashed_cte_sql('doc').strip()}
        SELECT doc_id,
               ROUND(COALESCE(quality_logit, 0.25), 6) AS clf_logit,
               {TX.lang_id_sql()} AS lang_pred,
               {TX.quality_score_ppm_sql()} AS quality_ppm,
               len({TX.words_sql()}) AS ws_tokens,
               {TX.subword_token_count_sql()} AS subword_tokens,
               {TX.regex_token_count_sql()} AS regex_tokens,
               {TX.fingerprint_sql('tokens')} AS fp,
               bp_removed,
               {TX.fingerprint_sql(TK.tokens_sql('cleaned'))} AS bp_fp,
               COALESCE(top_tokens_csv, '') AS top_tokens_csv,
               {REP.repetition_sql('tokens', 2)[0]} AS rep2_dup_ppm,
               {REP.repetition_sql('tokens', 2)[1]} AS rep2_top_ppm,
               {REP.repetition_sql('tokens', 3)[0]} AS rep3_dup_ppm,
               {REP.repetition_sql('tokens', 3)[1]} AS rep3_top_ppm,
               {RD.pii_hits_sql('text')} AS pii_hits,
               CAST(length({RD.redact_pii_sql('text')}) AS INTEGER) AS red_len
        FROM bp_clean LEFT JOIN tk_csv USING (doc_id)
                      LEFT JOIN clf_sc USING (doc_id)
        """
    ),
)
def text_analysis_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full text-analysis layer as one hash-checked per-document row
    (driver checks at most 50 queries; each column is an independent
    operator — no UDF, and the corpus side never exchanges):

    * lang_pred — stopword-ratio language ID over documents.text
    * quality_ppm — composite quality score (length saturation, stopword
      ratio, word-length band, distinct ratio) in EXACT integer
      parts-per-million: the rounded-double form hits cross-engine ROUND
      tie divergence (found at sf0.1; see functions/text.quality_score_ppm)
    * ws_tokens / subword_tokens / regex_tokens — whitespace, chars/4
      heuristic, and BPE-ish regex (shared Java-regex/RE2 dialect) token
      counting
    * fp — order-sensitive rolling-hash document fingerprint
    * bp_removed / bp_fp — C4-style boilerplate removal
      (operators/boilerplate.py): segments repeated across >= 4 docs are
      dropped; bp_fp fingerprints the re-tokenized cleaned text. The hot
      set folds to one broadcast array row, so this column adds a
      vocab-bounded aggregation subtree but ZERO corpus exchanges.
    * top_tokens_csv — tf-idf-style keyword extraction
      (sketches.distinctive_tokens): top-5 tokens by the exact-integer
      (tf DESC, df ASC, token ASC) order statistic, "token:tf:df" CSV.
      The corpus df table folds to one broadcast map row; ranking is
      row-local array arithmetic — again ZERO corpus exchanges.
    * rep2_dup_ppm / rep2_top_ppm / rep3_dup_ppm / rep3_top_ppm —
      Gopher-style within-document repetition filters
      (functions/repetition.py): duplicate n-gram fraction and top
      n-gram mass over the token array, exact integer ppm, row-local
      sorted-run decomposition — ZERO shuffle, ZERO UDF.
    * clf_logit — the hashed-bigram logistic quality scorer
      (operators/classifier.py:score_logistic_hashed) with the
      deterministic hash_weights vector: the SCORING path is oracle
      hash-checked bit-exact (fixed-point int64 margins, verified-
      identical ROUND tie rule); TRAINING stays pytest-pinned (exact
      layout invariance + planted-signal separation) since GD replay is
      not SQL-shaped.
    * pii_hits / red_len — PII-pattern redaction (functions/redact.py):
      url/email/ipv4/digit-run placeholders via a sequential
      regexp_replace chain in the shared Java-regex/RE2 dialect; hit
      count + redacted length are the hash-checked evidence (this corpus
      is PII-free, so pii_hits == 0 and red_len == n_chars are PINNED —
      the planted-PII behavior is pinned by tests/test_redact.py).
    """
    base = S.documents_tokenized(spark, sf_dir)
    doc = SK.distinctive_tokens(base, k=5)
    clean = BP.remove_boilerplate(doc, "text", out_col="__clean")
    clean = REP.with_repetition(REP.with_repetition(clean, "tokens", 2), "tokens", 3)
    clf = CLF.score_logistic_hashed(
        base.select("doc_id", "tokens"), CLF.hash_weights(), bias=0.25
    ).select("doc_id", F.round("quality_logit", 6).alias("clf_logit"))
    return clean.join(clf, "doc_id").select(
        "doc_id",
        "clf_logit",
        TX.lang_id(F.col("text")).alias("lang_pred"),
        TX.quality_score_ppm(F.col("text")).alias("quality_ppm"),
        TX.whitespace_token_count(F.col("text")).alias("ws_tokens"),
        TX.subword_token_count(F.col("text")).alias("subword_tokens"),
        TX.regex_token_count(F.col("text")).alias("regex_tokens"),
        TX.fingerprint(F.col("tokens")).alias("fp"),
        "bp_removed",
        TX.fingerprint(TK.tokens_expr(F.col("__clean"))).alias("bp_fp"),
        "top_tokens_csv",
        "rep2_dup_ppm",
        "rep2_top_ppm",
        "rep3_dup_ppm",
        "rep3_top_ppm",
        RD.pii_hits(F.col("text")).alias("pii_hits"),
        F.length(RD.redact_pii(F.col("text"))).cast("int").alias("red_len"),
    )


# ---------------------------------------------------------------------------
# dedup (sequences + documents)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_groups",
    _cte(
        """
        SELECT dup_key, n_dups, canonical_id FROM (
            SELECT array_to_string(tokens, ',') AS dup_key,
                   COUNT(*) AS n_dups,
                   MIN(event_id) AS canonical_id
            FROM seq GROUP BY 1
        ) WHERE n_dups > 1
        """
    ),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the canonical token-CSV key; one
    shuffle with map-side partial aggregation."""
    seq = S.sequences(spark, sf_dir)
    return D.exact_duplicates(seq, "event_id", F.concat_ws(",", F.col("tokens")))


@register(
    "dedup_signatures",
    _cte(
        f"""
        SELECT doc_id,
               array_to_string({D.minhash_signature_sql('tokens', 16)}, ',')
                 AS minhash_csv,
               {D.simhash16_sql('tokens')} AS simhash,
               len({D.shingles3_sql('tokens')}) AS n_shingles,
               len(list_distinct({D.shingles3_sql('tokens')})) AS n_distinct,
               {SH.assign_shards_sql('doc_key', 64, seed=0)} AS shard,
               {SAM.sample_flag_sql('doc_key', 250000, seed=7)} AS sample_keep,
               {SAM.assign_split_sql('doc_key', 20000, 20000, seed=11)} AS split
        FROM doc
        """
    ),
)
def dedup_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every per-document dedup signature in one hash-checked row
    (each column an independent operator, all array-native, no shuffle):

    * minhash_csv — 16-hash MinHash signature (the LSH band-join input)
    * simhash — 16-bit SimHash (pure bit arithmetic)
    * shard — deterministic affine shard id (operators/sharding.py):
      stable under any partitioning/order, the resumable output-layout key
    * sample_keep — seeded deterministic Bernoulli keep decision at 25%
      (operators/sampling.py): partition/retry/rerun-independent corpus
      downsampling, the source-mixing building block
    * split — deterministic train/val/test assignment (2%/2% held out;
      sampling.assign_split): disjoint+exhaustive per-key CASE on the
      same uniform family — a document can never migrate between splits
      across re-runs or layouts
    * n_shingles / n_distinct — packed 3-gram shingle stats, the n-gram
      Jaccard building block (pairs path exercised in tests; shingle
      sets here are near-unique so pair queries would be vacuous at
      these SFs)
    """
    doc = S.documents_tokenized(spark, sf_dir)
    sh = D.shingles3(F.col("tokens"))
    return SH.assign_shards(
        doc.select(
            "doc_id",
            "doc_key",
            F.concat_ws(",", D.minhash_signature(F.col("tokens"), 16)).alias(
                "minhash_csv"
            ),
            D.simhash16(F.col("tokens")).alias("simhash"),
            F.size(sh).alias("n_shingles"),
            F.size(F.array_distinct(sh)).alias("n_distinct"),
            SAM.sample_flag(F.col("doc_key"), 250_000, seed=7).alias(
                "sample_keep"
            ),
            SAM.assign_split(F.col("doc_key"), 20_000, 20_000, seed=11).alias(
                "split"
            ),
        ),
        F.col("doc_key"),
        n_shards=64,
        seed=0,
    ).drop("doc_key")


def _bands_sql(n_hashes: int = 16, bands: int = 4) -> str:
    rows = n_hashes // bands
    sig = D.minhash_signature_sql("tokens", n_hashes)
    keys = []
    for b in range(bands):
        parts = " || '-' || ".join(
            f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows)
        )
        keys.append(f"'{b}' || '-' || {parts}")
    return f"""
        SELECT doc_id, uniq, unnest([{', '.join(keys)}]) AS band
        FROM (SELECT doc_id, {sig} AS sig, list_distinct(tokens) AS uniq FROM doc)
    """


def _simhash_bands_sql(max_hamming: int = 2) -> str:
    """Pigeonhole bands over the 16-bit simhash: (max_hamming+1) bands,
    any Hamming<=d pair agrees exactly on >=1 band."""
    n_bands = max_hamming + 1
    base_w = 16 // n_bands
    keys, off = [], 0
    for b in range(n_bands):
        w = base_w if b < n_bands - 1 else 16 - off
        keys.append(
            f"'{b}-' || CAST((sh // {2**off}) % {2**w} AS VARCHAR)"
        )
        off += w
    return f"""
        SELECT doc_id, sh, unnest([{', '.join(keys)}]) AS band
        FROM (SELECT doc_id, {D.simhash16_sql('tokens')} AS sh FROM doc)
    """


@register(
    "dedup_near_pairs",
    _cte(
        f""", bands AS ({_bands_sql()}),
        mcand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.uniq AS ua, b.uniq AS ub
            FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
        ),
        sbands AS ({_simhash_bands_sql(2)}),
        scand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.sh AS sa, b.sh AS sb
            FROM sbands a JOIN sbands b
              ON a.band = b.band AND a.doc_id < b.doc_id
        ),
        vpairs AS (
            SELECT id_a, id_b FROM mcand
            WHERE CAST(len(list_intersect(ua, ub)) AS DOUBLE)
                  / (len(ua) + len(ub) - len(list_intersect(ua, ub))) >= 0.9
        ),
        cedges AS (
            SELECT id_a AS s, id_b AS d FROM vpairs
            UNION
            SELECT id_b, id_a FROM vpairs
        ),
        creach(node, lbl) AS (
            SELECT s, s FROM cedges
            UNION
            SELECT e.d, r.lbl FROM creach r JOIN cedges e ON e.s = r.node
        ),
        ccomp AS (
            SELECT node, MIN(lbl) AS component FROM creach GROUP BY node
        )
        SELECT 'minhash_jaccard' AS variant, id_a, id_b,
               {D.jaccard_ppm_sql('ua', 'ub')} AS score
        FROM mcand
        WHERE CAST(len(list_intersect(ua, ub)) AS DOUBLE)
              / (len(ua) + len(ub) - len(list_intersect(ua, ub))) >= 0.9
        UNION ALL
        SELECT 'simhash_hamming' AS variant, id_a, id_b,
               CAST(bit_count(xor(sa, sb)) AS BIGINT) AS score
        FROM scand
        WHERE bit_count(xor(sa, sb)) <= 2
        UNION ALL
        SELECT 'cc_minhash' AS variant, node AS id_a, component AS id_b,
               CAST(NULL AS BIGINT) AS score
        FROM ccomp
        UNION ALL
        SELECT 'keep_minhash' AS variant, doc_id AS id_a,
               CAST(NULL AS VARCHAR) AS id_b, CAST(NULL AS BIGINT) AS score
        FROM doc
        WHERE doc_id NOT IN (SELECT node FROM ccomp WHERE node <> component)
        """
    ),
)
def dedup_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both near-duplicate PAIR paths in one hash-checked union — each a
    bucketed LSH equi-join over candidates, never all-pairs:

    * minhash_jaccard — MinHash band-join candidates verified by true
      Jaccard >= 0.9 (score = exact jaccard PPM: rounded doubles hit
      cross-engine ROUND ties on dyadic-denominator ratios, the tie
      class found in the quality score at sf0.1). This corpus has a
      ~30-token vocabulary, so distinct-token SETS are near-identical
      across documents — high pair counts are expected (a good skew
      stress).
    * simhash_hamming — pigeonhole bands over the 16-bit SimHash
      (3 bands: any Hamming<=2 pair shares >=1 exact band), candidates
      verified by true bit_count(xor) (score = hamming distance).
    * cc_minhash — connected components over the verified minhash pairs
      (operators/dedup.py:connected_components, hash-min label
      propagation with pointer jumping): id_a = node, id_b = its
      component label (min doc_id in the component) — hash-checked
      against a DuckDB recursive-CTE transitive closure.
    * keep_minhash — the terminal keep-canonical set
      (near_dedup_keep_canonical): every doc surviving near-dedup (the
      min-id member of each dup cluster plus all unpaired docs).
    """
    doc = S.documents_tokenized(spark, sf_dir)
    mh_pairs = D.minhash_near_duplicates(doc, "doc_id", threshold=0.9)
    mh = mh_pairs.select(
        F.lit("minhash_jaccard").alias("variant"),
        "id_a",
        "id_b",
        F.col("jaccard_ppm").alias("score"),
    )
    sh = D.simhash_near_duplicates(doc, "doc_id", max_hamming=2).select(
        F.lit("simhash_hamming").alias("variant"),
        "id_a",
        "id_b",
        F.col("hamming").cast("long").alias("score"),
    )
    # persist covers the iterative CC rounds (connected_components runs
    # eagerly and returns a localCheckpointed frame), then releases —
    # comp no longer references pairs_only afterwards
    pairs_only = mh_pairs.select("id_a", "id_b").persist()
    comp = D.connected_components(pairs_only)
    pairs_only.unpersist()
    cc = comp.select(
        F.lit("cc_minhash").alias("variant"),
        F.col("node").alias("id_a"),
        F.col("component").alias("id_b"),
        F.lit(None).cast("long").alias("score"),
    )
    keep = D.near_dedup_keep_canonical(
        doc.select("doc_id"), pairs_only, "doc_id", components=comp
    ).select(
        F.lit("keep_minhash").alias("variant"),
        F.col("doc_id").alias("id_a"),
        F.lit(None).cast("string").alias("id_b"),
        F.lit(None).cast("long").alias("score"),
    )
    return mh.unionByName(sh).unionByName(cc).unionByName(keep)


# ---------------------------------------------------------------------------
# similarity search (embeddings table)
# ---------------------------------------------------------------------------

# NOTE: sim_cosine_topk / sim_lsh_bucket_histogram / sim_lsh_topk moved into
# registry_more.py sim_topk_matrix / sim_bucket_stats union queries.


# ---------------------------------------------------------------------------
# star-schema aggregation sanity (lineitem) — §2.6 absent-in-reference aggs
# ---------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    """
    SELECT 'q1' AS variant, l_returnflag AS k1, l_linestatus AS k2,
           -- exact integer cents: DECIMAL cannot survive the driver's pandas
           -- fetch (DuckDB .df() downcasts any DECIMAL to float64, so a
           -- decimal-typed Spark result can never hash-match), and summing
           -- raw doubles is order-dependent in the last ulp. The source
           -- doubles carry exactly 2 decimals, so ROUND(x*100) is exact.
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS qty_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS amount,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2002-09-02'
    GROUP BY 2, 3
    UNION ALL
    SELECT 'star_rev', r_name, n_name,
           CAST(NULL AS BIGINT),
           -- revenue price*(1-discount) carries exactly 4 decimals; the
           -- x10000 double is the SAME double in both engines and ties
           -- round identically (HALF_UP == away-from-zero for positives)
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS BIGINT),
           COUNT(*)
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 2, 3
    UNION ALL
    SELECT 'brand_rev', p_brand, p_type,
           CAST(NULL AS BIGINT),
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS BIGINT),
           COUNT(*)
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 2, 3
    UNION ALL
    SELECT 'supp_nation', n_name, CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT),
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS BIGINT),
           COUNT(*)
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 2, 3
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema aggregation matrix, exact integer money both engines:

    * q1 — TPC-H-Q1-shaped pricing summary (filter pushdown + partial
      aggregation over the fact table alone)
    * star_rev — TPC-H-Q5-shaped revenue per (region, nation) through
      the full dimension chain lineitem->orders->customer->nation->
      region. Scale shape: nation/region broadcast always; customer
      broadcasts at this SF and becomes the shuffle side of a sort-merge
      at 10^8 customers; the fact->orders join shuffles on the 8-byte
      orderkey. Revenue in exact 1e-4 units (see oracle comment).
    * brand_rev — revenue per (p_brand, p_type): broadcast part dim.
    * supp_nation — revenue per supplier nation: broadcast supplier +
      nation chain.
    """
    li = S.load_table(spark, sf_dir, "lineitem")
    q1 = (
        li.filter(F.col("l_shipdate") <= F.lit("2002-09-02").cast("timestamp_ntz"))
        .groupBy(
            F.col("l_returnflag").alias("k1"), F.col("l_linestatus").alias("k2")
        )
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias(
                "qty_cents"
            ),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "amount"
            ),
            F.count("*").alias("n"),
        )
        .select(F.lit("q1").alias("variant"), "k1", "k2", "qty_cents",
                "amount", "n")
    )
    orders = S.load_table(spark, sf_dir, "orders")
    cust = S.load_table(spark, sf_dir, "customer")
    nat = S.load_table(spark, sf_dir, "nation")
    reg = S.load_table(spark, sf_dir, "region")
    rev = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
        .cast("bigint")
    )
    star = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("k1"), F.col("n_name").alias("k2"))
        .agg(F.sum(rev).alias("amount"), F.count("*").alias("n"))
        .select(
            F.lit("star_rev").alias("variant"),
            "k1",
            "k2",
            F.lit(None).cast("bigint").alias("qty_cents"),
            "amount",
            "n",
        )
    )
    prt = S.load_table(spark, sf_dir, "part")
    brand = (
        li.join(F.broadcast(prt), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("k1"), F.col("p_type").alias("k2"))
        .agg(F.sum(rev).alias("amount"), F.count("*").alias("n"))
        .select(
            F.lit("brand_rev").alias("variant"),
            "k1",
            "k2",
            F.lit(None).cast("bigint").alias("qty_cents"),
            "amount",
            "n",
        )
    )
    supp = S.load_table(spark, sf_dir, "supplier")
    sup_nat = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("k1"))
        .agg(F.sum(rev).alias("amount"), F.count("*").alias("n"))
        .select(
            F.lit("supp_nation").alias("variant"),
            "k1",
            F.lit(None).cast("string").alias("k2"),
            F.lit(None).cast("bigint").alias("qty_cents"),
            "amount",
            "n",
        )
    )
    return q1.unionByName(star).unionByName(brand).unionByName(sup_nat)


# ---------------------------------------------------------------------------
# engine-added: bucketized range (interval) join — §2.5 temporal-join family
# ---------------------------------------------------------------------------


@register(
    "range_join_click_windows",
    """
    SELECT s.user_id,
           CAST(epoch_us(s.ts) AS BIGINT) AS click_us,
           CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
           CAST(epoch_us(p.ts) - epoch_us(s.ts) AS BIGINT) AS delta_us
    FROM events p JOIN events s
      ON p.user_id = s.user_id
     AND s.event_type = 'click' AND p.event_type = 'purchase'
     AND epoch_us(p.ts) >= epoch_us(s.ts)
     AND epoch_us(p.ts) < epoch_us(s.ts) + 3600000000
    """,
)
def range_join_click_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every purchase inside the one-hour window opened by a click of the
    same user — the bucketized range join (operators/rangejoin.py). The
    oracle is the naive inequality join; the engine plan is an equi-join
    on (user_id, hour_bucket) with bounded ceil(L/w)+1 = 2 fan-out per
    interval, so the time predicate rides the shuffle key instead of a
    per-key nested loop (the plan Spark itself would pick for this SQL).
    All times cross the engines as exact µs BIGINTs."""
    from go_html_transform_spark.operators import rangejoin as RJ

    ev = S.load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", us.alias("click_us"))
        .withColumn("end_us", F.col("click_us") + F.lit(3600 * RJ.MICROS))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("purchase_us")
    )
    return RJ.range_join(
        purchases,
        clicks,
        on="user_id",
        probe_time_us="purchase_us",
        start_us="click_us",
        end_us="end_us",
        width_us=3600 * RJ.MICROS,
    ).select(
        "user_id",
        "click_us",
        "purchase_us",
        (F.col("purchase_us") - F.col("click_us")).alias("delta_us"),
    )


# ---------------------------------------------------------------------------
# corpus token statistics / sketches (operators/sketches.py)
# ---------------------------------------------------------------------------


# BM25 probe set: hot + mid-frequency tokens of the derived document
# vocabulary (see functions/tokenize.py) — tiny by definition, broadcast
_BM25_QUERIES = [(0, [982, 756, 310]), (1, [923, 819, 607, 147]), (2, [542, 35, 974])]

# fixed merge table over the hot vocabulary: merge 2 consumes merge 1's
# output id, so the oracle pins the priority-ordered CHAINED apply
_BPE_MERGES = [(982, 756, 2001), (2001, 147, 2002)]

# bloom fixture: the "benchmark" is every 50th doc's 8-gram hash set
_BLOOM_EVAL_CTE = (
    f"(SELECT DISTINCT unnest({DC.ngram_hashes_sql('tokens', 8)}) AS h "
    "FROM doc WHERE CAST(doc_id[2:] AS INTEGER) % 50 = 0)"
)
_BP0, _BP1, _BP2 = BL._positions_sql("h", 4096, 3)
_BLOOM_DOC_SQL = f"""
  WITH blev AS (SELECT h FROM {_BLOOM_EVAL_CTE} ev),
  blw AS ({BL.bloom_build_sql('blev', 'h')}),
  bldh AS (SELECT DISTINCT doc_id,
                  unnest({DC.ngram_hashes_sql('tokens', 8)}) AS h FROM doc),
  blpos AS (SELECT doc_id, h, {_BP0} AS p0, {_BP1} AS p1, {_BP2} AS p2
            FROM bldh),
  blcand AS (
    SELECT b.doc_id, b.h FROM blpos b
    JOIN blw w0 ON w0.word_idx = CAST(b.p0 // 32 AS INTEGER)
               AND (w0.word & (1::BIGINT << CAST(b.p0 % 32 AS INTEGER))) <> 0
    JOIN blw w1 ON w1.word_idx = CAST(b.p1 // 32 AS INTEGER)
               AND (w1.word & (1::BIGINT << CAST(b.p1 % 32 AS INTEGER))) <> 0
    JOIN blw w2 ON w2.word_idx = CAST(b.p2 // 32 AS INTEGER)
               AND (w2.word & (1::BIGINT << CAST(b.p2 % 32 AS INTEGER))) <> 0)
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(CASE WHEN h IN (SELECT h FROM blev) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_exact
  FROM blcand GROUP BY doc_id
"""


@register(
    "corpus_token_stats",
    _cte(
        f"""
        SELECT 'tf_top' AS variant, CAST(token AS INTEGER) AS k1,
               CAST(NULL AS INTEGER) AS k2, tf AS cnt
        FROM ({SK.heavy_hitters_sql(50, 'seq')})
        UNION ALL
        SELECT 'df_top', CAST(token AS INTEGER), NULL, df
        FROM (SELECT token, df FROM ({SK.document_frequencies_sql('seq')})
              ORDER BY df DESC, token ASC LIMIT 50)
        UNION ALL
        SELECT 'bigram_top', CAST(a AS INTEGER), CAST(b AS INTEGER), cnt
        FROM (SELECT a, b, cnt FROM ({SK.bigram_counts_sql('seq')})
              ORDER BY cnt DESC, a ASC, b ASC LIMIT 50)
        UNION ALL
        SELECT 'cms', r, cell, cnt FROM ({SK.count_min_sketch_sql('seq')})
        UNION ALL
        SELECT 'len_hist', bucket, NULL, cnt
        FROM ({SK.length_histogram_sql('seq')})
        UNION ALL
        SELECT 'kmv', CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), h
        FROM ({SK.kmv_sketch_sql('seq', D.shingles3_sql('tokens'))})
        UNION ALL
        SELECT 'bp_hot', CAST(NULL AS INTEGER), CAST(df_cnt AS INTEGER),
               {TX.fingerprint_sql(TK.tokens_sql('seg'))}
        FROM ({BP.hot_segments_sql('doc')})
        UNION ALL
        SELECT 'lm_doc', CAST(doc_id[2:] AS INTEGER),
               CAST(lm_pairs AS INTEGER), lm_sum
        FROM ({SK.bigram_lm_stats_sql('doc')})
        UNION ALL
        SELECT 'span_dedup', CAST(doc_id[2:] AS INTEGER),
               n_spans_removed, kept_sum
        FROM ({SP.span_dedup_stats_sql('doc', n=8)})
        UNION ALL
        SELECT 'ntok_quantiles', CAST(NULL AS INTEGER),
               CAST(q_ppm AS INTEGER), value
        FROM ({SK.value_quantiles_sql('seq')})
        UNION ALL
        SELECT 'lm_bucket', CAST(doc_id[2:] AS INTEGER),
               lm_bucket, lm_metric
        FROM ({SK.lm_perplexity_buckets_sql('doc')})
        UNION ALL
        SELECT 'ntok_q_by_src', CAST(grp[4:] AS INTEGER),
               CAST(q_ppm AS INTEGER), value
        FROM ({SK.value_quantiles_by_sql('seq', 'source')})
        UNION ALL
        SELECT 'chunk', CAST(doc_id[2:] AS INTEGER),
               CAST(chunk_idx AS INTEGER),
               {TX.fingerprint_sql('chunk_tokens')}
        FROM ({PK.chunk_documents_sql('doc', window=32, stride=24, min_len=4)})
        UNION ALL
        SELECT 'bm25', CAST(bdoc[2:] AS INTEGER),
               CAST(query_id AS INTEGER), score_milli
        FROM ({R.bm25_int_sql(_BM25_QUERIES, topk=10, rel='doc')})
        UNION ALL
        SELECT 'dsir', CAST(ddoc[2:] AS INTEGER),
               CAST(selected AS INTEGER), weight_milli
        FROM ({SEL.dsir_weights_sql('doc')})
        UNION ALL
        SELECT 'bloom', word_idx, CAST(NULL AS INTEGER), word
        FROM ({BL.bloom_build_sql(_BLOOM_EVAL_CTE, 'h')})
        UNION ALL
        SELECT 'bloom_doc', CAST(doc_id[2:] AS INTEGER),
               CAST(n_candidates AS INTEGER), n_exact
        FROM ({_BLOOM_DOC_SQL})
        UNION ALL
        SELECT 'pack', CAST(doc_id[2:] AS INTEGER), shard, tok_before
        FROM ({PK.pack_assign_sql(
            'doc_key', 'n_tok', 256,
            src="(SELECT doc_id, doc_key, n_tok, "
                + SH.assign_shards_sql('doc_key', 8)
                + " AS shard FROM doc)")})
        UNION ALL
        SELECT 'decon', CAST(doc_id[2:] AS INTEGER),
               CAST(NULL AS INTEGER), CAST(n_tok AS BIGINT)
        FROM doc
        WHERE doc_id NOT IN (
            SELECT doc_id FROM (
                SELECT doc_id,
                       unnest({DC.ngram_hashes_sql('tokens', 13)}) AS ng
                FROM doc)
            WHERE ng IN (SELECT unnest({DC.ngram_hashes_sql('tokens', 13)})
                         FROM doc WHERE doc_key % 41 = 0))
        UNION ALL
        SELECT 'evalcon', CAST(doc_id[2:] AS INTEGER),
               CAST(n_found AS INTEGER), contamination_ppm
        FROM ({DC.eval_contamination_report_sql(
            "(SELECT tokens FROM doc WHERE doc_key % 41 <> 0)",
            "(SELECT doc_id, tokens FROM doc WHERE doc_key % 41 = 0)",
            "doc_id")})
        UNION ALL
        SELECT 'bm25_idx', CAST(bdoc[2:] AS INTEGER),
               CAST(query_id AS INTEGER), score_milli
        FROM ({R.bm25_int_sql(_BM25_QUERIES, topk=10, rel='doc')})
        UNION ALL
        SELECT 'bpe', CAST(doc_id[2:] AS INTEGER),
               CAST(len(t) AS INTEGER), {TX.fingerprint_sql('t')}
        FROM (WITH {BPE.bpe_apply_fixed_ctes(_BPE_MERGES, rel='doc')}
              SELECT * FROM bpe_out)
        """
    ),
)
def corpus_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-statistics sketch layer as one hash-checked union (the
    vocabulary dimension built FROM the corpus — SURVEY §2.12's contract
    at scale). Variants, each an independent operator:

    * tf_top — top-50 heavy hitters by occurrence count
      (TakeOrderedAndProject over the vocab-bounded frequency table)
    * df_top — top-50 by document frequency (row-local array_distinct
      before the explode: no extra shuffle)
    * bigram_top — top-50 adjacent bigrams (PMI phrase-mining raw counts)
    * cms — the full depth x width count-min sketch: shuffle state
      CONSTANT in corpus and vocab size, mergeable cell-wise
    * len_hist — power-of-two sequence-length histogram (integer-exact,
      drives packing context-length choices)
    * kmv — K-minimum-values distinct-count sketch over 3-gram shingles
      (exact-deterministic contents, so unlike HLL registers the sketch
      itself is hash-checkable; estimate = (k-1)*P/h_k)
    * bp_hot — the C4-style boilerplate hot set over documents
      (operators/boilerplate.py): k2 = document frequency, cnt = the
      segment's re-tokenized rolling-hash fingerprint (identity without
      shipping strings through the schema)
    * lm_doc — per-document bigram-LM quality stats
      (sketches.bigram_lm_stats): k1 = numeric doc id, k2 = adjacent
      pairs, cnt = summed corpus bigram counts (lm_avg = cnt/k2 is
      implied exactly)
    * span_dedup — substring-level exact span dedup
      (operators/spandedup.py): every corpus-duplicated 8-token span
      keeps its (id, pos)-smallest occurrence, other occurrences are
      removed; k1 = numeric doc id, k2 = spans removed from the doc,
      cnt = exact int64 token-sum checksum of the surviving tokens.
      Span explode is narrow; ranking is one 8-byte-key exchange
    * ntok_quantiles — EXACT discrete p50/p90/p99 of n_tok
      (sketches.value_quantiles): value-histogram + cumsum over the
      BOUNDED domain — one vocab-bounded exchange, the cumsum window
      runs over |domain| rows, never a global sort of the corpus;
      k2 = q in ppm, cnt = the order statistic
    * lm_bucket — CCNet-style head/middle/tail perplexity partition
      (sketches.lm_perplexity_buckets): per-doc LM metric quantized to a
      bounded 1024-level domain, head/tail thresholds as exact order
      statistics, one broadcast CASE assignment; k1 = numeric doc id,
      k2 = bucket (0=head most-typical, 1=middle, 2=tail),
      cnt = the exact scaled LM metric
    * chunk — sliding-window document chunking
      (packing.chunk_documents, window=32 stride=24 min_len=4): one row
      per surviving chunk, k1 = numeric doc id, k2 = chunk_idx,
      cnt = rolling-hash fingerprint of the chunk's token slice — pins
      boundaries, order and content of every chunk. Row-local
      explode+slice: zero shuffle, no Python
    * ntok_q_by_src — per-source exact p50/p90 of n_tok
      (sketches.value_quantiles_by): the histogram machinery partitioned
      by group — cumsum windows never see more than one group's |domain|;
      k1 = numeric source id, k2 = q ppm, cnt = the order statistic

    * pack — sequence-packing assignment (packing.pack_assign over the
      deterministic shard layout): k1 = numeric doc id, k2 = shard,
      cnt = tok_before — pack_id and pack_offset are exact functions of
      tok_before and the context length, so this pins the full layout
    * decon — 13-gram decontamination keep-set
      (decontaminate.decontaminate mode=drop, broadcast anti-join, zero
      corpus exchange): one row per SURVIVING doc vs the doc_key%41
      eval slice; cnt = n_tok
    * evalcon — the eval-side contamination report
      (decontaminate.eval_contamination_report): per doc of the
      doc_key%41 eval slice, the exact-ppm fraction of its distinct
      13-grams found in the REST of the corpus (corpus excludes the
      slice so fractions are non-trivial); k2 = n_found, cnt = ppm —
      zero corpus exchanges, eval set broadcast
    * bpe — bpe_apply (the Arrow-batched mapInPandas tokenizer path)
      with the fixed chained merge table _BPE_MERGES: k1 = numeric doc
      id, k2 = merged length, cnt = rolling-hash fingerprint of the
      merged tokens — hash-checked against a per-merge CTE replay
      (a != b merges cannot overlap, so leftmost-first == replace-all;
      run semantics for a == b stay pytest-pinned)
    * bm25_idx — the at-rest indexed retrieval path
      (retrieval.bm25_write_index -> bm25_topk_indexed through manifest
      range-pruned postings files): oracle twin is the PLAIN bm25 SQL —
      the index is a storage layout, so indexed == direct scores is the
      hash-checked claim

    Every count is exact-integer; each batch-sketch plan is a single
    partial-agg'd exchange (tests/test_sketches.py pins plans + parity
    on dirty data); lm_doc adds the broadcast-LM join + one doc-keyed
    partial-agg'd exchange."""
    seq = S.sequences(spark, sf_dir).select("tokens", "n_tok")
    doc = S.documents_tokenized(spark, sf_dir)
    k1 = lambda c: F.col(c).cast("int").alias("k1")  # noqa: E731
    nul = F.lit(None).cast("int").alias("k2")
    cnt = lambda c: F.col(c).cast("long").alias("cnt")  # noqa: E731

    tf_top = SK.heavy_hitters(seq, 50).select(
        F.lit("tf_top").alias("variant"), k1("token"), nul, cnt("tf")
    )
    df_top = (
        SK.document_frequencies(seq)
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(50)
        .select(F.lit("df_top").alias("variant"), k1("token"), nul, cnt("df"))
    )
    bigram_top = (
        SK.bigram_counts(seq)
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(50)
        .select(
            F.lit("bigram_top").alias("variant"),
            k1("a"),
            F.col("b").cast("int").alias("k2"),
            cnt("cnt"),
        )
    )
    cms = SK.count_min_sketch(seq).select(
        F.lit("cms").alias("variant"),
        k1("r"),
        F.col("cell").cast("int").alias("k2"),
        cnt("cnt"),
    )
    len_hist = SK.length_histogram(seq).select(
        F.lit("len_hist").alias("variant"), k1("bucket"), nul, cnt("cnt")
    )
    kmv = SK.kmv_sketch(seq, D.shingles3(F.col("tokens"))).select(
        F.lit("kmv").alias("variant"),
        F.lit(None).cast("int").alias("k1"),
        nul,
        F.col("h").alias("cnt"),
    )
    bp_hot = BP.hot_segments(doc, "text").select(
        F.lit("bp_hot").alias("variant"),
        F.lit(None).cast("int").alias("k1"),
        F.col("df_cnt").cast("int").alias("k2"),
        TX.fingerprint(TK.tokens_expr(F.col("seg"))).alias("cnt"),
    )
    lm_doc = SK.bigram_lm_stats(doc).select(
        F.lit("lm_doc").alias("variant"),
        F.substring("doc_id", 2, 16).cast("int").alias("k1"),
        F.col("lm_pairs").cast("int").alias("k2"),
        F.col("lm_sum").alias("cnt"),
    )
    span = (
        SP.remove_duplicated_spans(doc.select("doc_id", "tokens"), n=8)
        .filter(F.col("n_spans_removed") > 0)
        .select(
            F.lit("span_dedup").alias("variant"),
            F.substring("doc_id", 2, 16).cast("int").alias("k1"),
            F.col("n_spans_removed").cast("int").alias("k2"),
            F.aggregate(
                "tokens_span_deduped",
                F.lit(0).cast("long"),
                lambda a, t: a + F.coalesce(t.cast("long"), F.lit(0)),
            ).alias("cnt"),
        )
    )
    quant = SK.value_quantiles(seq, "n_tok").select(
        F.lit("ntok_quantiles").alias("variant"),
        F.lit(None).cast("int").alias("k1"),
        F.col("q_ppm").cast("int").alias("k2"),
        F.col("value").alias("cnt"),
    )
    qby = SK.value_quantiles_by(
        S.sequences(spark, sf_dir).select("source", "n_tok"), "source"
    ).select(
        F.lit("ntok_q_by_src").alias("variant"),
        F.substring("grp", 4, 8).cast("int").alias("k1"),
        F.col("q_ppm").cast("int").alias("k2"),
        F.col("value").alias("cnt"),
    )
    chunk = PK.chunk_documents(
        doc.select("doc_id", "tokens", "n_tok"), window=32, stride=24, min_len=4
    ).select(
        F.lit("chunk").alias("variant"),
        F.substring("doc_id", 2, 16).cast("int").alias("k1"),
        F.col("chunk_idx").cast("int").alias("k2"),
        TX.fingerprint(F.col("chunk_tokens")).alias("cnt"),
    )
    lm_bkt = SK.lm_perplexity_buckets(doc).select(
        F.lit("lm_bucket").alias("variant"),
        F.substring("doc_id", 2, 16).cast("int").alias("k1"),
        F.col("lm_bucket").cast("int").alias("k2"),
        F.col("lm_metric").alias("cnt"),
    )
    bm25 = R.bm25_int_topk(
        doc.select("doc_id", "tokens"), _BM25_QUERIES, topk=10
    ).select(
        F.lit("bm25").alias("variant"),
        F.substring("doc_id", 2, 16).cast("int").alias("k1"),
        F.col("query_id").cast("int").alias("k2"),
        F.col("score_milli").alias("cnt"),
    )
    dsir = SEL.dsir_weights(doc, F.col("lang") == "en").select(
        F.lit("dsir").alias("variant"),
        F.substring("doc_id", 2, 16).cast("int").alias("k1"),
        F.col("selected").cast("int").alias("k2"),
        F.col("weight_milli").alias("cnt"),
    )
    ev_hashes = (
        doc.filter(F.substring("doc_id", 2, 16).cast("int") % 50 == 0)
        .select(F.explode(DC.ngram_hashes(F.col("tokens"), 8)).alias("h"))
        .distinct()
    )
    bloom_words = BL.bloom_build(ev_hashes, "h").select(
        F.lit("bloom").alias("variant"),
        F.col("word_idx").alias("k1"),
        F.lit(None).cast("int").alias("k2"),
        F.col("word").alias("cnt"),
    )
    bloom_doc = BL.bloom_prefilter_contaminated(
        doc.select("doc_id", DC.ngram_hashes(F.col("tokens"), 8).alias("ngram_hashes")),
        ev_hashes,
    ).select(
        F.lit("bloom_doc").alias("variant"),
        F.substring("doc_id", 2, 16).cast("int").alias("k1"),
        F.col("n_candidates").cast("int").alias("k2"),
        F.col("n_exact").alias("cnt"),
    )
    packed = PK.pack_assign(
        SH.assign_shards(
            doc.select("doc_id", "doc_key", "n_tok"), F.col("doc_key"), 8
        ),
        F.col("doc_key"),
        "n_tok",
        context_len=256,
    ).select(
        F.lit("pack").alias("variant"),
        F.substring("doc_id", 2, 16).cast("int").alias("k1"),
        F.col("shard").cast("int").alias("k2"),
        F.col("tok_before").alias("cnt"),
    )
    decon = DC.decontaminate(
        doc.select("doc_id", "n_tok", "tokens"),
        doc.filter(F.col("doc_key") % 41 == 0).select("tokens"),
        "doc_id",
        n=13,
        mode="drop",
    ).select(
        F.lit("decon").alias("variant"),
        F.substring("doc_id", 2, 16).cast("int").alias("k1"),
        F.lit(None).cast("int").alias("k2"),
        F.col("n_tok").cast("long").alias("cnt"),
    )
    evalcon = DC.eval_contamination_report(
        doc.filter(F.col("doc_key") % 41 != 0).select("tokens"),
        doc.filter(F.col("doc_key") % 41 == 0).select("doc_id", "tokens"),
        "doc_id",
        n=13,
    ).select(
        F.lit("evalcon").alias("variant"),
        F.substring("doc_id", 2, 16).cast("int").alias("k1"),
        F.col("n_found").cast("int").alias("k2"),
        F.col("contamination_ppm").alias("cnt"),
    )
    bm25_idx = _bm25_indexed_rows(spark, doc)
    bpe_rows = BPE.bpe_apply(doc.select("doc_id", "tokens"), _BPE_MERGES).select(
        F.lit("bpe").alias("variant"),
        F.substring("doc_id", 2, 16).cast("int").alias("k1"),
        F.size("tokens").cast("int").alias("k2"),
        TX.fingerprint(F.col("tokens")).alias("cnt"),
    )
    return (
        tf_top.unionByName(df_top)
        .unionByName(bigram_top)
        .unionByName(cms)
        .unionByName(len_hist)
        .unionByName(kmv)
        .unionByName(bp_hot)
        .unionByName(lm_doc)
        .unionByName(span)
        .unionByName(quant)
        .unionByName(lm_bkt)
        .unionByName(qby)
        .unionByName(chunk)
        .unionByName(bm25)
        .unionByName(dsir)
        .unionByName(bloom_words)
        .unionByName(bloom_doc)
        .unionByName(packed)
        .unionByName(decon)
        .unionByName(evalcon)
        .unionByName(bm25_idx)
        .unionByName(bpe_rows)
    )


def _bm25_indexed_rows(spark: SparkSession, doc: DataFrame) -> DataFrame:
    """The at-rest retrieval path as oracle rows: write the inverted
    index to a throwaway ManifestTable, answer _BM25_QUERIES through the
    manifest-pruned reader, and localCheckpoint the (tiny, topk-bounded)
    result so the index files can be deleted before the driver collects.
    The oracle twin is the plain bm25 SQL — the index is a storage
    layout, not a scoring change, and THAT equality is the check."""
    import shutil
    import tempfile

    from go_html_transform_spark.operators.retrieval import (
        bm25_topk_indexed,
        bm25_write_index,
    )
    from go_html_transform_spark.sources.manifest_table import ManifestTable

    tmp = tempfile.mkdtemp(prefix="ghts_bm25_idx_")
    try:
        table = ManifestTable(f"{tmp}/bm25_idx")
        _snap, n_docs, total = bm25_write_index(
            table, doc.select("doc_id", "tokens"), n_files=8
        )
        got, _read, _total = bm25_topk_indexed(
            table, spark, _BM25_QUERIES, n_docs, total, topk=10
        )
        return got.select(
            F.lit("bm25_idx").alias("variant"),
            F.substring("doc_id", 2, 16).cast("int").alias("k1"),
            F.col("query_id").cast("int").alias("k2"),
            F.col("score_milli").alias("cnt"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
