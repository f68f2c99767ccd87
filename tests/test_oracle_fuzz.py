"""Randomized cross-engine fuzz: every deterministic signature / hash /
scoring kernel that has a DuckDB SQL twin is checked on a RANDOM corpus
(not just the driver's parquet tables), including the dirty shapes the
testdata never produces — empty token arrays, single tokens, NULL token
elements, unicode/punctuation-heavy text, zero-length text.

This is the adversarial complement to tools/crosscheck.py: crosscheck
proves the twins agree on the two driver corpora; this proves they agree
on inputs chosen to straddle edge cases (the strict string-form compare
matches the driver's dtype-sensitive hash)."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.functions import text as TX
from go_html_transform_spark.operators import dedup as D
from go_html_transform_spark.operators import sharding as SH
from go_html_transform_spark.operators.similarity import lsh_bucket, lsh_bucket_sql

SEED = 20260817


def _token_corpus():
    rng = random.Random(SEED)
    rows = []
    for i in range(120):
        n = rng.randrange(0, 30)
        toks = [rng.randrange(1024) for _ in range(n)]
        rows.append((i, toks))
    # degenerate shapes: empty, singleton, constant, NULL elements (the
    # round-1 ADVICE divergence class — expression twins must null-skip
    # identically)
    rows += [(120, []), (121, [5]), (122, [5, 5, 5, 5]), (123, [1, None, 3]),
             (124, None)]  # whole-NULL array
    return rows


def _strict(df, duck_rows):
    """Compare through the same path the driver uses: pandas + str()."""
    got = df.toPandas()
    key = list(got.columns)[0]
    got = got.sort_values(key).reset_index(drop=True)
    want = duck_rows.df().sort_values(key).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a = [str(x) for x in got[c].tolist()]
        b = [str(x) for x in want[c].tolist()]
        assert a == b, (c, [(x, y) for x, y in zip(a, b) if x != y][:5])


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_token_signature_twins_random_corpus(spark, duck):
    rows = _token_corpus()
    df = spark.createDataFrame(rows, "id long, tokens array<int>")
    duck.execute("CREATE OR REPLACE TABLE tcorp (id BIGINT, tokens INTEGER[])")
    duck.executemany("INSERT INTO tcorp VALUES (?, ?)", rows)

    eng = df.select(
        "id",
        F.concat_ws(",", D.minhash_signature(F.col("tokens"), 16)).alias("mh"),
        D.simhash16(F.col("tokens")).alias("sh"),
        F.size(D.shingles3(F.col("tokens"))).alias("nsh"),
        TX.fingerprint(F.col("tokens")).alias("fp"),
    )
    ora = duck.sql(
        f"""
        SELECT id,
               array_to_string({D.minhash_signature_sql('tokens', 16)}, ',') AS mh,
               {D.simhash16_sql('tokens')} AS sh,
               CAST(len({D.shingles3_sql('tokens')}) AS INTEGER) AS nsh,
               {TX.fingerprint_sql('tokens')} AS fp
        FROM tcorp ORDER BY id
        """
    )
    _strict(eng, ora)


def test_ngram_and_sampling_twins_dirty_corpus(spark, duck):
    """Decontamination n-gram hashes + sampling keep flags on the dirty
    corpus (empty / NULL-element / whole-NULL arrays): Spark empty-array
    vs DuckDB-NULL concat divergence is normalized with COALESCE on the
    oracle side only (concat_ws('')=='' is the engine contract)."""
    from go_html_transform_spark.operators import decontaminate as DC
    from go_html_transform_spark.operators import sampling as SA

    rows = _token_corpus()
    df = spark.createDataFrame(rows, "id long, tokens array<int>")
    duck.execute("CREATE OR REPLACE TABLE ncorp (id BIGINT, tokens INTEGER[])")
    duck.executemany("INSERT INTO ncorp VALUES (?, ?)", rows)

    eng = df.select(
        "id",
        F.concat_ws(",", DC.ngram_hashes(F.col("tokens"), 4)).alias("ng4"),
        SA.sample_flag(F.col("id"), 100_000, seed=2).alias("keep"),
    )
    ora = duck.sql(
        f"""
        SELECT id,
               COALESCE(array_to_string({DC.ngram_hashes_sql('tokens', 4)}, ','), '')
                 AS ng4,
               {SA.sample_flag_sql('id', 100_000, seed=2)} AS keep
        FROM ncorp ORDER BY id
        """
    )
    _strict(eng, ora)


def test_lsh_and_shard_twins_random_vectors(spark, duck):
    rng = random.Random(SEED + 1)
    rows = [
        (i, [round(rng.gauss(0, 1), 6) for _ in range(24)]) for i in range(150)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    duck.execute("CREATE OR REPLACE TABLE vcorp (id BIGINT, v DOUBLE[])")
    duck.executemany("INSERT INTO vcorp VALUES (?, ?)", rows)

    eng = SH.assign_shards(
        df.select(
            "id",
            lsh_bucket(F.col("v"), 8).alias("b0"),
            lsh_bucket(F.col("v"), 6, plane_offset=6).alias("b1"),
        ),
        F.col("id"),
        n_shards=32,
        seed=9,
    )
    ora = duck.sql(
        f"""
        SELECT id,
               {lsh_bucket_sql('v', 8)} AS b0,
               {lsh_bucket_sql('v', 6, 6)} AS b1,
               {SH.assign_shards_sql('id', 32, seed=9)} AS shard
        FROM vcorp ORDER BY id
        """
    )
    _strict(eng, ora)


def test_text_scoring_twins_adversarial_text(spark, duck):
    rng = random.Random(SEED + 2)
    words = ["the", "and", "für", "naïve", "TOKEN", "x", "…", "3.14", "a" * 40]
    rows = []
    for i in range(100):
        n = rng.randrange(0, 25)
        rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
    rows += [(100, ""), (101, "   "), (102, "!!!???"), (103, "\tütf8 ünïcode\n")]
    df = spark.createDataFrame(rows, "id long, text string")
    duck.execute("CREATE OR REPLACE TABLE dcorp (id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO dcorp VALUES (?, ?)", rows)

    eng = df.select(
        "id",
        TX.lang_id(F.col("text")).alias("lang"),
        TX.quality_score_ppm(F.col("text")).alias("q_ppm"),
        TX.subword_token_count(F.col("text")).alias("n_sub"),
        TX.regex_token_count(F.col("text")).alias("n_re"),
    )
    ora = duck.sql(
        f"""
        SELECT id,
               {TX.lang_id_sql('text')} AS lang,
               {TX.quality_score_ppm_sql('text')} AS q_ppm,
               {TX.subword_token_count_sql('text')} AS n_sub,
               {TX.regex_token_count_sql('text')} AS n_re
        FROM dcorp ORDER BY id
        """
    )
    _strict(eng, ora)


def test_jaccard_ppm_twin_exhaustive_small_sets(spark, duck):
    """jaccard_ppm over ALL pairs of a small set zoo — exercises the
    dyadic-denominator tie class that broke ROUND(double) at sf0.1."""
    zoo = [
        (0, []), (1, [1]), (2, [1, 2]), (3, [1, 2, 3, 4]),
        (4, list(range(8))), (5, list(range(128))), (6, [1, 3, 5, 7]),
        (7, list(range(64))), (8, [2, 4]), (9, list(range(0, 128, 2))),
    ]
    pairs = [(a, ta, b, tb) for a, ta in zoo for b, tb in zoo if a < b]
    df = spark.createDataFrame(pairs, "ia long, ta array<int>, ib long, tb array<int>")
    duck.execute(
        "CREATE OR REPLACE TABLE pzoo (ia BIGINT, ta INTEGER[], ib BIGINT, tb INTEGER[])"
    )
    duck.executemany("INSERT INTO pzoo VALUES (?, ?, ?, ?)", pairs)
    eng = df.select(
        (F.col("ia") * 100 + F.col("ib")).alias("pk"),
        D.jaccard_ppm(F.col("ta"), F.col("tb")).alias("jppm"),
    )
    ora = duck.sql(
        f"""
        SELECT ia * 100 + ib AS pk,
               {D.jaccard_ppm_sql('list_distinct(ta)', 'list_distinct(tb)')} AS jppm
        FROM pzoo ORDER BY pk
        """
    )
    _strict(eng, ora)


def test_sketch_twins_random_corpus(spark, duck):
    """Corpus-statistics sketches (operators/sketches.py) on a random
    corpus + degenerate shapes: tf / df / bigram / CMS / length
    histogram all strict-match their DuckDB twins (aggregated kernels,
    so the whole-corpus GROUP BY result is the compared object)."""
    from go_html_transform_spark.operators import sketches as SK

    rows = _token_corpus()
    df = spark.createDataFrame(
        rows, "id long, tokens array<int>"
    ).withColumn("n_tok", F.coalesce(F.size("tokens"), F.lit(0)))
    duck.execute("CREATE OR REPLACE TABLE skcorp (id BIGINT, tokens INTEGER[])")
    duck.executemany("INSERT INTO skcorp VALUES (?, ?)", rows)
    duck.execute(
        "CREATE OR REPLACE VIEW skcorpn AS SELECT *,"
        " COALESCE(len(tokens), 0) AS n_tok FROM skcorp"
    )

    for eng, sql, order in [
        (SK.token_frequencies(df), SK.token_frequencies_sql("skcorp"), "token"),
        (SK.document_frequencies(df), SK.document_frequencies_sql("skcorp"), "token"),
        (SK.count_min_sketch(df), SK.count_min_sketch_sql("skcorp"), "r, cell"),
        (SK.length_histogram(df), SK.length_histogram_sql("skcorpn"), "bucket"),
    ]:
        _strict(
            eng.orderBy(*[c.strip() for c in order.split(",")]),
            duck.sql(f"SELECT * FROM ({sql}) ORDER BY {order}"),
        )
    _strict(
        SK.bigram_counts(df).orderBy("a", "b"),
        duck.sql(f"SELECT * FROM ({SK.bigram_counts_sql('skcorp')}) ORDER BY a, b"),
    )
    _strict(
        SK.distinctive_tokens(df, k=4)
        .select("id", "top_tokens_csv")
        .orderBy("id"),
        duck.sql(
            f"WITH {SK.distinctive_tokens_ctes('skcorp', id_col='id', k=4)} "
            "SELECT id, COALESCE(top_tokens_csv, '') AS top_tokens_csv "
            "FROM skcorp LEFT JOIN tk_csv USING (id) ORDER BY id"
        ),
    )


def test_boilerplate_and_lm_twins_adversarial(spark, duck):
    """Boilerplate removal (operators/boilerplate.py) and bigram-LM
    scoring on a random low-entropy word corpus (so hot segments and
    repeated bigrams actually occur) + dirty shapes: empty text,
    whitespace runs, unicode words, NULL token elements."""
    from go_html_transform_spark.operators import boilerplate as BP
    from go_html_transform_spark.operators import sketches as SK

    rng = random.Random(SEED + 5)
    words = ["nav", "bar", "ünïcode", "a", "bb", "ccc", "…"]
    rows = []
    for i in range(100):
        n = rng.randrange(0, 14)
        rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
    rows += [(100, ""), (101, "   "), (102, "x  y   z"), (103, "nav nav nav")]
    df = spark.createDataFrame(rows, "id long, text string")
    duck.execute("CREATE OR REPLACE TABLE bcorp (id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO bcorp VALUES (?, ?)", rows)

    eng = BP.remove_boilerplate(df, "text", min_docs=3).select(
        "id", "bp_removed", F.col("text").alias("cleaned")
    )
    ora = duck.sql(
        f"WITH {BP.remove_boilerplate_ctes('bcorp', min_docs=3)} "
        "SELECT id, bp_removed, cleaned FROM bp_clean ORDER BY id"
    )
    _strict(eng.orderBy("id"), ora)

    tok_rows = _token_corpus()
    df2 = spark.createDataFrame(tok_rows, "id long, tokens array<int>")
    duck.execute("CREATE OR REPLACE TABLE lmcorp (id BIGINT, tokens INTEGER[])")
    duck.executemany("INSERT INTO lmcorp VALUES (?, ?)", tok_rows)
    _strict(
        SK.bigram_lm_stats(df2, "id").orderBy("id"),
        duck.sql(
            f"SELECT * FROM ({SK.bigram_lm_stats_sql('lmcorp', 'id')})"
            " ORDER BY id"
        ),
    )


def test_repetition_and_split_twins_dirty_corpus(spark, duck):
    """Repetition filters + split assignment on the dirty token corpus
    (empty / NULL-element / whole-NULL arrays) through the driver's
    dtype-sensitive compare."""
    from go_html_transform_spark.functions import repetition as REP
    from go_html_transform_spark.operators import sampling as SAM

    rows = _token_corpus()
    df = spark.createDataFrame(rows, "id long, tokens array<int>")
    duck.execute("CREATE OR REPLACE TABLE rcorp (id BIGINT, tokens INTEGER[])")
    duck.executemany("INSERT INTO rcorp VALUES (?, ?)", rows)

    eng = (
        REP.with_repetition(REP.with_repetition(df, "tokens", 2), "tokens", 3)
        .select(
            "id",
            "rep2_dup_ppm",
            "rep2_top_ppm",
            "rep3_dup_ppm",
            "rep3_top_ppm",
            SAM.assign_split(F.col("id"), 100_000, 100_000, seed=3).alias("sp"),
        )
    )
    d2, t2 = REP.repetition_sql("tokens", 2)
    d3, t3 = REP.repetition_sql("tokens", 3)
    ora = duck.sql(
        f"""
        SELECT id, {d2} AS rep2_dup_ppm, {t2} AS rep2_top_ppm,
               {d3} AS rep3_dup_ppm, {t3} AS rep3_top_ppm,
               {SAM.assign_split_sql('id', 100000, 100000, seed=3)} AS sp
        FROM rcorp ORDER BY id
        """
    )
    _strict(eng, ora)


def test_redact_twins_adversarial_text(spark, duck):
    """PII redaction chain on adversarial strings: unicode, regex
    metacharacters in text, stacked/overlapping matches, empty, NULL."""
    from go_html_transform_spark.functions import redact as RD

    rows = [
        (0, "a@b.co http://x/a@b.co 1.2.3.4 123456"),
        (1, "ünïcode mail: ü@x.de not-an-email @ loose"),
        (2, "regex meta [a-z]+ (x|y) $1 \\d+ in text 9999999"),
        (3, ""),
        (4, None),
        (5, "255.255.255.255.255 1234567890123456789012"),
        (6, "https://a https://b c@d.ee f@g.hh 10.0.0.1 000000"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    duck.execute("CREATE OR REPLACE TABLE pcorp (id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO pcorp VALUES (?, ?)", rows)

    eng = df.select(
        "id",
        RD.redact_pii(F.col("text")).alias("red"),
        RD.pii_hits(F.col("text")).alias("hits"),
    )
    ora = duck.sql(
        f"""
        SELECT id, {RD.redact_pii_sql('text')} AS red,
               {RD.pii_hits_sql('text')} AS hits
        FROM pcorp ORDER BY id
        """
    )
    _strict(eng, ora)


def test_value_quantiles_twin_random_corpus(spark, duck):
    """Histogram quantiles over a random bounded-domain column."""
    import random as _random

    from go_html_transform_spark.operators import sketches as SKQ

    rng = _random.Random(21)
    rows = [(i, rng.choice([0, 1, 1, 2, 3, 5, 8, 13, 21, 99]))
            for i in range(500)]
    df = spark.createDataFrame(rows, "id long, n_tok int")
    duck.execute("CREATE OR REPLACE TABLE qcorp (id BIGINT, n_tok INTEGER)")
    duck.executemany("INSERT INTO qcorp VALUES (?, ?)", rows)
    qs = (1, 100_000, 500_000, 900_000, 1_000_000)
    eng = SKQ.value_quantiles(df, "n_tok", qs_ppm=qs).withColumnRenamed(
        "q_ppm", "q"
    ).select(F.col("q").cast("int").alias("q"), "value")
    ora = duck.sql(
        f"SELECT CAST(q_ppm AS INTEGER) AS q, value "
        f"FROM ({SKQ.value_quantiles_sql('qcorp', 'n_tok', qs)}) ORDER BY q"
    )
    _strict(eng, ora)
