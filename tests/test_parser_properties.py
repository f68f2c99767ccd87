"""Hypothesis property tests for the rule parser (pure Python — no Spark):
round-trip stability and crash-freedom on arbitrary input."""

from hypothesis import given, settings
from hypothesis import strategies as st

from go_html_transform_spark.plans.parser import ParseError, parse_rule
from go_html_transform_spark.plans.rules import PSEUDOS

ident = st.from_regex(r"[a-z][a-z0-9_-]{0,8}", fullmatch=True)
tag = st.integers(0, 1023).map(lambda n: f"t{n}")

part = st.one_of(
    tag,
    st.just("*"),
    ident.map(lambda s: f"#{s}"),
    ident.map(lambda s: f".{s}"),
    st.sampled_from(PSEUDOS).map(lambda s: f":{s}"),
    ident.map(lambda s: f"[{s}]"),
    st.tuples(ident, st.sampled_from(["=", "~=", "|=", "^=", "$=", "*="]), ident).map(
        lambda t: f"[{t[0]}{t[1]}{t[2]}]"
    ),
)

# a sequence: tag/universal first (keeps the rendering canonical), then
# extra row-level parts
sequence = st.tuples(st.one_of(tag, st.just("*")), st.lists(part.filter(lambda p: p[0] in "#.:["), max_size=2)).map(
    lambda t: t[0] + "".join(t[1])
)
combinator = st.sampled_from([" ", " > ", " + ", " ~ "])
chain = st.tuples(sequence, st.lists(st.tuples(combinator, sequence), max_size=3)).map(
    lambda t: t[0] + "".join(c + s for c, s in t[1])
)


@given(chain)
@settings(max_examples=300, deadline=None)
def test_round_trip_property(spec):
    # compile(s).describe() == s for every generated valid chain
    assert str(parse_rule(spec)) == spec


@given(chain)
@settings(max_examples=200, deadline=None)
def test_reparse_fixpoint(spec):
    # parse(str(parse(s))) == parse(s) — canonical form is a fixpoint
    c1 = parse_rule(spec)
    assert parse_rule(str(c1)) == c1


@given(st.text(max_size=24))
@settings(max_examples=500, deadline=None)
def test_never_crashes_only_parse_errors(junk):
    # arbitrary garbage either parses or raises ParseError — never any
    # other exception (the reference panics at match time; we never do)
    try:
        parse_rule(junk)
    except ParseError:
        pass


@given(chain)
@settings(max_examples=200, deadline=None)
def test_specificity_nonnegative_and_additive(spec):
    c = parse_rule(spec)
    assert c.specificity >= 0
    assert c.specificity == c.head.specificity + sum(
        l.seq.specificity for l in c.links
    )
