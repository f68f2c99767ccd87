"""F4 — predicate + combinator match fixtures, mirroring the reference's
matcher positive/negative pairs (TestSelectorMatch,
/root/reference/css/selector/match_test.go:28-77,190-203) and finder
golden match-lists (TestSelectorFind, match_test.go:79-170,172-188)."""

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.plans.pipeline import Transformer


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, source string, attrs map<string,string>",
    )


def _positions(spark, rows, rule):
    tr = Transformer(_df(spark, rows), attrs_col="attrs")
    got = tr.matched(rule).select("doc_id", "match_pos").collect()
    return {r.doc_id: list(r.match_pos) for r in got}


BASE = [
    ("a", [1, 2, 3, 2], "web", {"k": "v", "cls": "x y z", "lang": "en-us"}),
    ("b", [2], "wiki", {"k": "other"}),
    ("c", [], "web", {}),
]


# --- positive/negative predicate pairs (match_test.go:28-77) ---------------


def test_tag_match(spark):
    got = _positions(spark, BASE, "t2")
    assert got == {"a": [1, 3], "b": [0]}  # doc c: no tokens, no match


def test_universal(spark):
    got = _positions(spark, BASE, "*")
    assert got["a"] == [0, 1, 2, 3]
    assert "c" not in got  # empty sequence has no positions


def test_conjunction_tag_class(spark):
    # tag.class analogue (match_test.go:35-40)
    got = _positions(spark, BASE, "t2.web")
    assert got == {"a": [1, 3]}  # b is wiki


def test_id(spark):
    got = _positions(spark, BASE, "#b")
    assert got == {"b": [0]}


def test_attr_presence(spark):
    assert set(_positions(spark, BASE, "[k]")) == {"a", "b"}


def test_attr_exact(spark):
    assert set(_positions(spark, BASE, "[k=v]")) == {"a"}


def test_attr_contains_whitespace_list(spark):
    # [k~=v] whitespace-list membership (attrContains, data.go:113-120)
    assert set(_positions(spark, BASE, "[cls~=y]")) == {"a"}
    assert set(_positions(spark, BASE, "[cls~=w]")) == set()


def test_attr_dash_prefix(spark):
    # [k|=v] (attrDashPrefix, data.go:109-111)
    assert set(_positions(spark, BASE, "[lang|=en]")) == {"a"}
    assert set(_positions(spark, BASE, "[lang|=e]")) == set()


def test_attr_substring_ops(spark):
    # ^= $= *= — tokenized-but-unparsed in the reference (parse.go:104 TODO);
    # first-class here
    assert set(_positions(spark, BASE, "[k^=oth]")) == {"b"}
    assert set(_positions(spark, BASE, "[k$=her]")) == {"b"}
    assert set(_positions(spark, BASE, "[k*=the]")) == {"b"}


def test_pseudo_positional(spark):
    # :first-child/:last-child/:only-child (data.go:138-143)
    assert _positions(spark, BASE, "t1:first-child") == {"a": [0]}
    assert _positions(spark, BASE, "t2:last-child") == {"a": [3], "b": [0]}
    assert _positions(spark, BASE, "t2:only-child") == {"b": [0]}


def test_pseudo_empty(spark):
    # :empty (data.go:144-145): matches childless rows, empty position set
    tr = Transformer(_df(spark, BASE), attrs_col="attrs")
    got = tr.matched(":empty").select("doc_id").collect()
    assert [r.doc_id for r in got] == ["c"]


# --- combinator golden match-sets (match_test.go:79-170) --------------------

COMBO = [
    ("a", [1, 5, 2, 5, 5, 2], "web", {}),
    ("b", [5, 1], "web", {}),
    ("c", [2, 5], "web", {}),
]


def test_descendant(spark):
    # `t1 t5`: 5s strictly after a 1 (Link.Find descendant, data.go:278-284)
    got = _positions(spark, COMBO, "t1 t5")
    assert got == {"a": [1, 3, 4]}  # b: 5 precedes 1 -> no match


def test_child_immediate_next(spark):
    # `t1 > t5` (data.go:285-291)
    got = _positions(spark, COMBO, "t1 > t5")
    assert got == {"a": [1]}


def test_adjacent_both_directions(spark):
    # `t1 + t5`: BOTH directions — pins the reference quirk where
    # AdjacentSibling probes PrevSibling AND NextSibling (data.go:292-299)
    got = _positions(spark, COMBO, "t1 + t5")
    assert got == {"a": [1], "b": [0]}  # b: 5 BEFORE 1 still matches


def test_sibling_any_other_position(spark):
    # `t2 ~ t5` (data.go:300-311): both directions, whole sequence
    got = _positions(spark, COMBO, "t2 ~ t5")
    assert got == {"a": [1, 3, 4], "c": [1]}


def test_chain_multi_stage_dedup(spark):
    # staged refinement + set dedup (Chain.Find, data.go:328-345)
    rows = [("a", [1, 5, 5, 9, 5, 9], "web", {})]
    got = _positions(spark, rows, "t1 t5 > t9")
    # 5s after the 1 at pos0: {1,2,4}; 9s immediately after those: {3,5}
    assert got == {"a": [3, 5]}


def test_chain_with_row_filters(spark):
    got = _positions(spark, COMBO, "t1.web > t5")
    assert got == {"a": [1]}
    got = _positions(spark, COMBO, "t1.wiki > t5")
    assert got == {}


@pytest.mark.parametrize(
    "rule,expected",
    [
        ("t5:first-child", {"b": [0]}),
        ("t5:last-child", {"a": [], "c": [1]}),  # a's last is t2 -> no a
    ],
)
def test_pseudo_in_combo_table(spark, rule, expected):
    got = _positions(spark, COMBO, rule)
    expected = {k: v for k, v in expected.items() if v}
    assert got == expected


def test_match_order_is_document_order(spark):
    # result ordering = document order (DFS analogue, h5/node.go:66-73):
    # positions ascending per row, rows by doc_id
    rows = [("z", [5, 1, 5], "web", {}), ("a", [5], "web", {})]
    tr = Transformer(_df(spark, rows), attrs_col="attrs")
    out = tr.matched("t5").orderBy("doc_id").select("doc_id", "match_pos").collect()
    assert [(r.doc_id, list(r.match_pos)) for r in out] == [("a", [0]), ("z", [0, 2])]
