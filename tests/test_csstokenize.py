"""In-engine CSS tokenizer: spec conformance, reference-type-table
coverage, and Spark/DuckDB twin parity on adversarial inputs
(css/tokenizer/tokenizer.go type constants, 120-154)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.functions import csstokenize as CT

CASES = [
    "t982.en > t756 { append: 1023; }",
    "/* c */ a { color: #fff; width: 12.5px; h: 50%; }",
    "@media (min-width: 600px) { .x { background: url(a.png); } }",
    'u+0025-00FF u+4?? url("q.png") calc( 1e3 ) "str\\"esc" -12 --var',
    'bad { s: "unterminated',
    "/* unterminated",
    "a ~= b ^= c $= d *= e |= f || g <!-- -->",
    "url(unclosed",
    "12 12.5 .5 -3 +4 1e9 1E-9 12px 50% 12.5e2em",
    "#a1-b @import 'single\\'q' ident( fn(x)",
    "",
    "\\65 scaped id\\65nt",
]


def _spark_tokens(spark, texts):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "i int, s string"
    )
    return {
        r.i: [(x["t"], x["s"]) for x in r.toks]
        for r in df.select("i", CT.css_tokens("s").alias("toks")).collect()
    }


def _duck_tokens(texts):
    con = duckdb.connect()
    placeholders = ",".join(f"({i}, ?)" for i in range(len(texts)))
    con.execute(
        f"CREATE TABLE t AS SELECT * FROM (VALUES {placeholders}) v(i, s)",
        list(texts),
    )
    rows = con.execute(
        f"SELECT i, {CT.css_tokens_sql('s')} FROM t"
    ).fetchall()
    return {r[0]: [(x["t"], x["s"]) for x in r[1]] for r in rows}


def test_cross_engine_parity(spark):
    got = _spark_tokens(spark, CASES)
    want = _duck_tokens(CASES)
    for i, s in enumerate(CASES):
        assert got[i] == want[i], (i, s)


def test_lossless_concat(spark):
    """Token texts concatenate back to the input byte-for-byte — the
    tokenizer never drops or rewrites a character."""
    got = _spark_tokens(spark, CASES)
    for i, s in enumerate(CASES):
        assert "".join(t for _, t in got[i]) == s, i


def test_token_types(spark):
    toks = _spark_tokens(spark, CASES)

    def types(i):
        return [t for t, _ in toks[i]]

    # numbers / percentage / dimension / sci notation
    assert [t for t in types(8) if t != CT.WS] == [
        CT.NUMBER, CT.NUMBER, CT.NUMBER, CT.NUMBER, CT.NUMBER,
        CT.NUMBER, CT.NUMBER, CT.DIMENSION, CT.PERCENTAGE, CT.DIMENSION,
    ]
    # matchers + CDO/CDC (reference emits these in Next(),
    # tokenizer.go:449-533)
    m = [t for t in types(6) if t not in (CT.WS, CT.IDENT)]
    assert m == [
        CT.INCLUDES, CT.PREFIXMATCH, CT.SUFFIXMATCH, CT.SUBSTRINGMATCH,
        CT.DASHMATCH, CT.COLUMN, CT.CDO, CT.CDC,
    ]
    # unicode ranges + uri + string-with-escape (engine is first-class
    # where the reference TODOs: tokenizer.go:424-430,438)
    t3 = toks[3]
    assert (CT.UNICODE_RANGE, "u+0025-00FF") == t3[0]
    assert (CT.UNICODE_RANGE, "u+4??") in t3
    assert any(t == CT.URI for t, _ in t3)
    assert any(t == CT.FUNCTION and s == "calc(" for t, s in t3)
    assert (CT.STRING, '"str\\"esc"') in t3
    # bad string / bad comment / bad uri are typed, not dropped
    assert types(4)[-1] == CT.BAD_STRING
    assert types(5) == [CT.BAD_COMMENT]
    assert types(7) == [CT.BAD_URI]
    # hash / at-keyword / function / escaped idents
    t9 = toks[9]
    assert (CT.HASH, "#a1-b") in t9
    assert (CT.AT_KEYWORD, "@import") in t9
    assert (CT.FUNCTION, "ident(") in t9
    assert (CT.STRING, "'single\\'q'") in t9
    assert types(10) == []
    assert (CT.IDENT, "\\65 scaped") in toks[11]  # escape eats one char
    assert (CT.IDENT, "id\\65nt") in toks[11]


def test_ws_filter_shape(spark):
    """The struct array filters JVM-side (no UDF in the plan)."""
    df = spark.createDataFrame([(CASES[0],)], "s string").select(
        F.filter(CT.css_tokens("s"), lambda x: x["t"] != CT.WS).alias("toks")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert len(df.collect()[0].toks) == 11


@pytest.mark.parametrize(
    "text,expect",
    [
        ("<", [(CT.DELIM, "<")]),
        ("<!-", [(CT.DELIM, "<"), (CT.DELIM, "!"), (CT.DELIM, "-")]),
        ("#", [(CT.DELIM, "#")]),
        ("@ ", [(CT.DELIM, "@"), (CT.WS, " ")]),
        ("|", [(CT.DELIM, "|")]),
        ("~", [(CT.DELIM, "~")]),
    ],
)
def test_delim_fallbacks(spark, text, expect):
    got = _spark_tokens(spark, [text])[0]
    assert got == expect
