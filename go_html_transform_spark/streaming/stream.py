"""Structured Streaming surface: the engine's batch feature semantics
re-expressed over an unbounded source.

The reference is strictly batch-one-document (SURVEY.md §2.14); the
streaming layer is engine-added so the same rules/features run on live
event streams:

* ``stream_sequences``: file-source stream of event rows joined to the
  broadcast document dim — the streaming twin of sources.tables.sequences.
* ``streaming_session_counts``: watermarked session-window aggregation —
  the streaming twin of operators/window.sessionize (same gap semantics
  via ``F.session_window``).
* ``streaming_rule_counts``: selector-rule match counts per sliding
  window — Transformer rules applied to a stream unchanged (stateless
  Column expressions compose with any source).

Tests drive these with ``trigger(availableNow=True)`` into a memory sink —
the bounded-replay mode that exercises the full incremental planner.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_html_transform_spark.sources.tables import documents_tokenized


def stream_sequences(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """readStream over the events parquet directory joined to the static
    tokenized-documents dim (stream-static joins are broadcast-friendly
    and stateless)."""
    src = f"{sf_dir}/events.parquet"
    static_events = spark.read.parquet(src)
    if os.path.isfile(src):
        # the file-stream source requires a DIRECTORY; mirror the single
        # driver-provided file into a temp dir via symlink (testdata is
        # read-only). Production streams read a landing directory anyway.
        d = tempfile.mkdtemp(prefix="ghts_stream_")
        os.symlink(os.path.abspath(src), os.path.join(d, "events.parquet"))
        src = d
    e = (
        spark.readStream.schema(static_events.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src)
    )
    d = documents_tokenized(spark, sf_dir)
    return (
        e.join(F.broadcast(d), e["user_id"] == d["doc_key"], "inner")
        .select(
            d["doc_id"],
            e["ts"].alias("event_time"),
            d["tokens"],
            d["n_tok"],
            d["source"],
            e["event_id"],
            e["event_type"],
            e["value"],
        )
    )


def streaming_session_counts(
    seq_stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization on the stream: F.session_window implements
    exactly the batch sessionize() semantics (new session when gap >
    gap_seconds); the watermark bounds state for late data."""
    return (
        seq_stream.withColumn("event_time", F.col("event_time").cast("timestamp"))
        .withWatermark("event_time", watermark)
        .groupBy(
            F.session_window("event_time", f"{gap_seconds} seconds"),
            F.col("doc_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("n_tok").alias("sum_n_tok"),
        )
        .select(
            "doc_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_n_tok",
        )
    )


def streaming_rule_counts(
    seq_stream: DataFrame,
    rule: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Selector-rule match counts per tumbling window: the rule compiles to
    the same stateless Column predicate used in batch, so the streaming
    planner gets an ordinary windowed aggregation."""
    from go_html_transform_spark.plans.parser import parse_rule
    from go_html_transform_spark.plans.rules import compile_chain

    compiled = compile_chain(parse_rule(rule), attrs=None)
    return (
        seq_stream.withColumn("event_time", F.col("event_time").cast("timestamp"))
        .withWatermark("event_time", watermark)
        .filter(compiled.row_matched)
        .groupBy(F.window("event_time", window), F.col("source"))
        .agg(F.count("*").alias("n_matches"))
        .select(
            F.col("window.start").alias("window_start"),
            "source",
            "n_matches",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain the stream with availableNow into a memory sink; returns the
    materialized result (test/driver helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
