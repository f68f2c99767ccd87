"""Seeded randomized equivalence: every token transform / predicate is
checked against a pure-Python reference implementation over hundreds of
random sequences IN ONE DataFrame pass (the F3 exact-array invariant at
fuzz scale)."""

import random

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.operators import transforms as X
from go_html_transform_spark.plans.parser import parse_rule
from go_html_transform_spark.plans.rules import compile_chain

N_CASES = 400


@pytest.fixture(scope="module")
def fuzz(spark):
    rng = random.Random(20260816)
    rows = []
    for i in range(N_CASES):
        n = rng.randrange(0, 24)
        toks = [rng.randrange(8) for _ in range(n)]  # small vocab -> dense matches
        rows.append((i, toks))
    df = spark.createDataFrame(rows, "id int, tokens array<int>").cache()
    data = {i: t for i, t in rows}
    return df, data


def py_positions(tokens, spec):
    """Pure-Python chain matcher — independent reimplementation of the
    pinned combinator semantics."""
    chain = parse_rule(spec)

    def seq_pos(seq):
        out = []
        for p, t in enumerate(tokens):
            ok = True
            for part in seq.parts:
                k = part.kind.value
                if k == "tag" and t != int(part.value[1:]):
                    ok = False
                if k == "pseudo":
                    n = len(tokens)
                    if part.value in ("first-child", "root") and p != 0:
                        ok = False
                    if part.value == "last-child" and p != n - 1:
                        ok = False
                    if part.value == "only-child" and n != 1:
                        ok = False
            if ok:
                out.append(p)
        return out

    cur = seq_pos(chain.head)
    for link in chain.links:
        cand = seq_pos(link.seq)
        c = link.combinator.value
        if c == " ":
            cur = [q for q in cand if cur and q > min(cur)]
        elif c == ">":
            cur = [q for q in cand if q - 1 in cur]
        elif c == "+":
            cur = [q for q in cand if q - 1 in cur or q + 1 in cur]
        elif c == "~":
            cur = [q for q in cand if any(p != q for p in cur)]
    return sorted(set(cur))


@pytest.mark.parametrize(
    "spec",
    ["t3", "t1 t2", "t1 > t2", "t2 + t3", "t0 ~ t1", "t1 t2 > t3", "t1:first-child", "t2:last-child", "t3 + t3"],
)
def test_chain_positions_fuzz(spark, fuzz, spec):
    df, data = fuzz
    c = compile_chain(parse_rule(spec), attrs=None, doc_id=F.lit("x"), source=F.lit("s"))
    got = {r.id: list(r.pos) for r in df.select("id", c.positions.alias("pos")).collect()}
    exp = {i: py_positions(t, spec) for i, t in data.items()}
    assert got == exp


def test_splice_fuzz(spark, fuzz):
    df, data = fuzz
    rng = random.Random(7)
    pos = {i: rng.randrange(0, 26) for i in data}
    pos_df = spark.createDataFrame(list(pos.items()), "id int, p int")
    j = df.join(pos_df, "id")
    got = {
        r.id: list(r.out)
        for r in j.select("id", X.splice("tokens", F.col("p"), [99, 98]).alias("out")).collect()
    }
    for i, toks in data.items():
        p = pos[i]
        exp = toks[:p] + [99, 98] + toks[p + 1 :] if 0 <= p < len(toks) else toks
        assert got[i] == exp, (i, toks, p)


def test_subtransform_and_filter_fuzz(spark, fuzz):
    df, data = fuzz
    got = {
        r.id: (list(r.a), list(r.b))
        for r in df.select(
            "id",
            X.subtransform("tokens", lambda t: t % 2 == 0, lambda t: t + 100).alias("a"),
            X.filter_tokens("tokens", lambda t: t > 3).alias("b"),
        ).collect()
    }
    for i, toks in data.items():
        assert got[i][0] == [t + 100 if t % 2 == 0 else t for t in toks]
        assert got[i][1] == [t for t in toks if t > 3]


def test_copy_and_do_all_fuzz(spark, fuzz):
    df, data = fuzz
    got = {
        r.id: [list(v) for v in r.v]
        for r in df.select(
            "id",
            X.copy_and(
                "tokens",
                lambda t: X.append_children(t, [5]),
                lambda t: X.do_all(
                    t,
                    lambda c: X.prepend_children(c, [1]),
                    lambda c: X.append_children(c, [2]),
                ),
            ).alias("v"),
        ).collect()
    }
    for i, toks in data.items():
        assert got[i] == [toks + [5], [1] + toks + [2]]
