"""Exploded/join matcher parity: identical match sets to the array-native
compiler across every combinator, on real sequence data."""

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.operators.match import (
    adjacent_via_window,
    match_chain_exploded,
)
from go_html_transform_spark.plans.pipeline import Transformer
from go_html_transform_spark.sources import tables as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def seq(spark):
    df = S.sequences(spark, SF_DIR).cache()
    yield df
    # unpersist so later plan-audit tests see the raw parquet scan, not an
    # InMemoryTableScan substituted by the cache manager
    df.unpersist()


def array_native(seq, rule):
    m = Transformer(seq).matched(rule)
    return sorted(
        (r.event_id, p)
        for r in m.select("event_id", "match_pos").collect()
        for p in r.match_pos
    )


def exploded(seq, rule):
    return sorted(
        (r.event_id, r.pos) for r in match_chain_exploded(seq, rule).collect()
    )


@pytest.mark.parametrize(
    "rule",
    [
        "t756",
        "t756:first-child",
        "t982:last-child",
        "t607 t982",
        "t756 > t982",
        "t756 + t982",
        "t310 ~ t982",
        "t607 t982 > t756",
    ],
)
def test_exploded_matches_array_native(spark, seq, rule):
    assert exploded(seq, rule) == array_native(seq, rule)


def test_adjacent_window_formulation(spark, seq):
    got = sorted(
        (r.event_id, r.pos) for r in adjacent_via_window(seq, 756, 982).collect()
    )
    assert got == array_native(seq, "t756 + t982")
    assert len(got) > 0  # non-vacuous on real data
