"""Source scans: the driver's parquet tables + the canonical sequence views.

Reference mapping (SURVEY.md §2.1): ``h5.New`` (full parse -> Tree,
/root/reference/h5/h5.go:70-79) becomes the source scan; the payload arrives
pre-tokenized, so the scan here is ``spark.read.parquet`` (Iceberg
``spark.read.format('iceberg')`` on a real cluster — see sources/sinks.py).

The canonical engine input is the ``sequences`` view with exactly the
input_hint shape plus the temporal axis:

    (doc_id:string, event_time:timestamp, tokens:array<int32>,
     n_tok:int32, source:string)  + (event_type, value) extras

built as ``documents JOIN events ON documents.doc_id = events.user_id``
(user_id range is a subset of doc_id range at every SF — verified).
``documents`` is a small dimension (500-5000 rows at test SFs, and a
vocabulary-bounded dimension at 100 TB) so the join is explicitly
BROADCAST — zero shuffle on the 10^12-row fact side.

Every view has a twin ``*_sql()`` returning the equivalent DuckDB SQL so the
oracle can never drift from the Spark definition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_html_transform_spark.functions.tokenize import tokens_expr, tokens_sql

# Broadcast ceiling for the tokenized documents dim: beyond this the dim
# cannot ship to every executor and sequences() switches to a salted
# sort-merge join automatically. The tokenized arrays decompress ~8x vs
# their parquet footprint, hence the expansion factor on the estimate.
BROADCAST_DIM_MAX_BYTES = 512 << 20
_PARQUET_EXPANSION = 8


def _path_bytes(path: str) -> int:
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )
    return os.path.getsize(path) if os.path.exists(path) else 0

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table. Column pruning + predicate pushdown reach the
    parquet reader automatically because callers select/filter on the result
    (check with .explain(): PushedFilters / ReadSchema)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# doc_id is formatted identically in Spark and DuckDB: 'd' || zero-padded id.
def _doc_id_expr(col):
    return F.concat(F.lit("d"), F.lpad(col.cast("string"), 6, "0"))


def _doc_id_sql(expr: str) -> str:
    return f"'d' || lpad(CAST({expr} AS VARCHAR), 6, '0')"


def documents_tokenized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + derived tokens/n_tok columns (the static per-doc payload)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_expr("text")
    return d.select(
        _doc_id_expr(F.col("doc_id")).alias("doc_id"),
        F.col("doc_id").alias("doc_key"),
        "text",
        "lang",
        "source",
        "n_chars",
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
    )


def documents_tokenized_sql(sf_dir: str) -> str:
    return f"""
        SELECT {_doc_id_sql('doc_id')} AS doc_id,
               doc_id AS doc_key,
               text, lang, source, n_chars,
               {tokens_sql('text')} AS tokens,
               CAST(len({tokens_sql('text')}) AS INTEGER) AS n_tok
        FROM documents
    """


def sequences(
    spark: SparkSession,
    sf_dir: str,
    repartition: int | None = None,
    dim_bytes: int | None = None,
) -> DataFrame:
    """The canonical (doc_id, event_time, tokens, n_tok, source) fact view.

    events is the 10^12-scale fact. The dim-join STRATEGY is auto-selected
    (round-1 weakness: broadcast was unconditional, which breaks when the
    tokenized documents dim outgrows executor memory at 10^8+ docs):

    * estimated dim <= BROADCAST_DIM_MAX_BYTES — broadcast hash join,
      zero shuffle on the fact side (the vocabulary-bounded default).
    * larger — salted sort-merge: the fact side gets a deterministic
      per-row salt and the dim replicates over the salt range, so one
      hot doc_key cannot pin a single sort-merge partition.

    ``dim_bytes`` overrides the on-disk estimate (parquet bytes x
    expansion) — used by tests to force the non-broadcast branch, and by
    callers that know the dim's true size (e.g. Iceberg table stats).

    ``repartition``: fan the fact scan out to N tasks BEFORE the join so
    the tokenize/transform compute parallelizes. At production scale the
    file count provides this for free; the sandbox's single small parquet
    file would otherwise serialize the whole pipeline into one task.
    """
    e = load_table(spark, sf_dir, "events")
    if repartition:
        e = e.repartition(repartition)
    d = documents_tokenized(spark, sf_dir)
    est = (
        dim_bytes
        if dim_bytes is not None
        else _path_bytes(f"{sf_dir}/documents.parquet") * _PARQUET_EXPANSION
    )
    if est <= BROADCAST_DIM_MAX_BYTES:
        joined = e.join(F.broadcast(d), e["user_id"] == d["doc_key"], "inner")
    else:
        from go_html_transform_spark.operators.skew import with_salt

        n_salts = 16
        e = with_salt(e, "event_id", n_salts)
        d = d.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        ).hint("shuffle_merge")
        joined = e.join(
            d,
            (e["user_id"] == d["doc_key"]) & (e["__salt"] == d["__salt"]),
            "inner",
        )
    return joined.select(
        d["doc_id"],
        e["ts"].alias("event_time"),
        d["tokens"],
        d["n_tok"],
        d["source"],
        d["lang"],
        e["event_id"],
        e["event_type"],
        e["value"],
        e["props"],
    )


def sequences_sql(sf_dir: str) -> str:
    """DuckDB twin of sequences() — used as a CTE by every oracle query."""
    return f"""
        SELECT {_doc_id_sql('e.user_id')} AS doc_id,
               e.ts AS event_time,
               d.tokens, d.n_tok, d.source, d.lang,
               e.event_id, e.event_type, e.value, e.props
        FROM events e
        JOIN ({documents_tokenized_sql(sf_dir)}) d ON d.doc_key = e.user_id
    """


def labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of right side: purchase events as (doc_id, obs_time, label_value).

    Mirrors the reference's second-document mash-up input
    (/root/reference/html/transform/doc.go:17-18) — an independent stream of
    observations keyed by the same entity.
    """
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == "purchase").select(
        _doc_id_expr(F.col("user_id")).alias("doc_id"),
        F.col("ts").alias("obs_time"),
        F.col("value").alias("label_value"),
    )


def labels_sql(sf_dir: str) -> str:
    return f"""
        SELECT {_doc_id_sql('user_id')} AS doc_id,
               ts AS obs_time,
               value AS label_value
        FROM events
        WHERE event_type = 'purchase'
    """


def with_cte(body_sql: str, sf_dir: str) -> str:
    """Wrap an oracle query body with the standard CTEs (seq, lab, doc).
    RECURSIVE so bodies may append recursive CTEs (connected components,
    EWMA state recurrences) — harmless for non-recursive ones."""
    return f"""
        WITH RECURSIVE seq AS ({sequences_sql(sf_dir)}),
             lab AS ({labels_sql(sf_dir)}),
             doc AS ({documents_tokenized_sql(sf_dir)})
        {body_sql}
    """
