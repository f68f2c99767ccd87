"""F6 — parser round-trips + fail-fast errors, mirroring
TestSelectorString (/root/reference/css/selector/data_test.go:8-49,27-49)
and parse.go error paths."""

import pytest

from go_html_transform_spark.plans.parser import ParseError, parse_rule

ROUND_TRIPS = [
    "t42",
    "*",
    "#d000001",
    ".web",
    "t42.web",
    "t42#d000001.web",
    "t1 t2",
    "t1 > t2",
    "t1 + t2",
    "t1 ~ t2",
    "t1 > t2 + t3",
    "[k]",
    "[k=v]",
    "[k~=v]",
    "[k|=v]",
    "[k^=v]",
    "[k$=v]",
    "[k*=v]",
    "t7[k=v]:first-child",
    ":empty",
    ":root",
    "t1:last-child",
    "t9:only-child",
]


@pytest.mark.parametrize("spec", ROUND_TRIPS)
def test_round_trip(spec):
    # compile(s).describe() == s (TestSelectorString data_test.go:27-49 analogue)
    assert str(parse_rule(spec)) == spec


@pytest.mark.parametrize(
    "bad",
    [
        "t1, t2",  # groups rejected (parse.go:208)
        "> t1",  # leading combinator (parse.go:210-212)
        "t1 > > t2",  # double combinator (parse.go:185-191)
        "[k=v",  # unclosed attr (parse.go:114)
        "[k",  # unclosed attr
        ":nth-child",  # unsupported pseudo (data.go:146-148, fail-fast here)
        "::before",  # pseudo-element never matchable (data.go:150-151)
        "",  # empty
        "t1 >",  # trailing combinator
        "div",  # non-token tag name
    ],
)
def test_rejects(bad):
    with pytest.raises(ParseError):
        parse_rule(bad)


def test_specificity():
    # Id=1e14, Class/Attr/Pseudo=1e8, Tag=1 (css/selector/data.go:104-107,180-191)
    assert parse_rule("t1").specificity == 1
    assert parse_rule("#x").specificity == 10**14
    assert parse_rule(".c").specificity == 10**8
    assert parse_rule("t1.c#x").specificity == 10**14 + 10**8 + 1
    # chain sums head + links (data.go:358-367)
    assert parse_rule("t1 > t2.c").specificity == 2 + 10**8
