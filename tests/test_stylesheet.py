"""Rule-file frontend: stylesheet parsing round-trips, priority
ordering, parity with the equivalent programmatic pipeline, and
fail-fast error paths (css/data.go AST analogue)."""

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.operators import transforms as X
from go_html_transform_spark.plans import stylesheet as SS
from go_html_transform_spark.plans.parser import ParseError
from go_html_transform_spark.plans.pipeline import Transformer

SHEET = """
/* bump every t982 doc */
@charset "utf-8";
t982 { append: 1023 5; }
<!-- legacy block -->
t756 > t982 { map: 756 -> 757; priority: 99; }
t147.en { remove-children: ; }
"""


def test_parse_stylesheet_ast_round_trip():
    sheet = SS.parse_stylesheet(SHEET)
    assert [rs.selector_text for rs in sheet.rulesets] == [
        "t982",
        "t756 > t982",
        "t147.en",
    ]
    assert sheet.rulesets[0].declarations == (
        SS.Declaration("append", "1023 5"),
    )
    assert sheet.at_rules == [SS.AtRule("charset", ('"utf-8"',))]
    assert sheet.comments == ["bump every t982 doc", "legacy block"]
    # priority: explicit declaration overrides specificity
    assert sheet.rulesets[1].priority == 99
    assert sheet.rulesets[0].priority == sheet.rulesets[0].selector.specificity
    assert sheet.rulesets[2].priority > sheet.rulesets[0].priority  # class adds


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            ("d1", "web", [982, 3, 982]),
            ("d2", "web", [756, 982, 4]),
            ("d3", "en", [147, 9]),
            ("d4", "web", [111]),
        ],
        "doc_id string, source string, tokens array<int>",
    )


def test_stylesheet_matches_programmatic_pipeline(spark, frame):
    """apply_stylesheet == the hand-built apply chain in priority order
    (map rule at explicit priority 99 runs first, then the class rule,
    then the bare-tag rule)."""
    got = SS.apply_stylesheet(Transformer(frame), SHEET).df
    ref = (
        Transformer(frame)
        .apply("t756 > t982", lambda t, p: X.subtransform(t, lambda k: k == 756, lambda k: F.lit(757)))
        .apply("t147.en", lambda t, p: X.remove_children(t))
        .apply("t982", lambda t, p: X.append_children(t, F.array(F.lit(1023), F.lit(5))))
        .df
    )
    g = {r.doc_id: list(r.tokens) for r in got.collect()}
    r = {r.doc_id: list(r.tokens) for r in ref.collect()}
    assert g == r
    assert g["d1"] == [982, 3, 982, 1023, 5]
    # d2: map fired first (756->757), so the t756>t982 context is gone
    # by the time t982 appends — priority order is observable
    assert g["d2"] == [757, 982, 4, 1023, 5]
    assert g["d3"] == []
    assert g["d4"] == [111]


def test_multi_declaration_block_composes_in_order(spark, frame):
    sheet = "t111 { prepend: 7; append: 8; replace: 0 9; }"
    got = {
        r.doc_id: list(r.tokens)
        for r in SS.apply_stylesheet(Transformer(frame), sheet).df.collect()
    }
    assert got["d4"] == [9, 111, 8]  # prepend 7, append 8, splice pos0 -> 9
    assert got["d1"] == [982, 3, 982]


def test_stylesheet_single_projection(spark, frame):
    """The whole rule table compiles into one projection over the scan —
    no shuffle, no repeated passes."""
    plan = SS.apply_stylesheet(Transformer(frame), SHEET).df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@pytest.mark.parametrize(
    "bad",
    [
        "t1 { append: 5; ",  # unclosed block
        "/* nope",  # unclosed comment
        "t1 { }",  # no transform declarations
        "t1 { frobnicate: 5; }",  # unknown property
        "t1 { append: x; }",  # non-integer value
        "t1 { map: 756; }",  # map without '->'
        "t1 { remove-children: 4; }",  # value where none allowed
        "@import",  # unclosed at-rule
        "{ append: 5; }",  # empty selector
        "t1 { append: 5; priority: high; }",  # non-integer priority
        "t1 { append: 5; /* unclosed }",  # unclosed block comment
    ],
)
def test_stylesheet_fail_fast(bad):
    with pytest.raises(ParseError):
        SS.load_rules(bad)


def test_comment_inside_declaration_block():
    """CSS allows comments anywhere; a block-internal one must not turn
    into a bogus declaration (the block grammar has no string syntax, so
    the lexical strip is safe)."""
    sheet = SS.parse_stylesheet(
        "t1 { append: 7; /* why: legacy */ priority: 3; }"
    )
    assert sheet.rulesets[0].declarations == (
        SS.Declaration("append", "7"),
        SS.Declaration("priority", "3"),
    )
    assert sheet.rulesets[0].priority == 3
