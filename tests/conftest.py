"""Shared pytest fixtures: one local SparkSession for the whole run,
plus the deterministic F1 fixture table (FIXTURES.md)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import types as T

from go_html_transform_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

SEQ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ghts-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


def make_rows(n_docs: int = 20, events_per_doc: int = 5, seed: int = 42):
    """F1 fixture generator (FIXTURES.md) — deterministic, gaps > 1800s for
    session boundaries, ~some empty token arrays (:empty analogue)."""
    rng = random.Random(seed)
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    sources = ["web", "wiki", "code", "chat"]
    for i in range(n_docs):
        doc_id = f"d{i:06d}"
        t = base
        for j in range(events_per_doc):
            gap = rng.choice([10, 20, 40, 3600, 15])
            t = t + dt.timedelta(seconds=gap)
            if rng.random() < 0.05:
                toks = []
            else:
                toks = [rng.randrange(1024) for _ in range(rng.randrange(1, 16))]
            rows.append(
                (
                    doc_id,
                    t,
                    toks,
                    len(toks),
                    sources[i % len(sources)],
                    {"k": str(rng.randrange(10)), "cls": "alpha beta gamma"},
                )
            )
    return rows


@pytest.fixture(scope="session")
def seq_df(spark):
    return spark.createDataFrame(make_rows(), SEQ_SCHEMA).cache()
