"""In-engine CSS tokenizer: text column -> array<struct<t int, s string>>
of CSS Syntax Level 3 tokens, entirely in JVM column expressions (one
regexp_extract_all + a per-lexeme classification transform — no UDF, no
shuffle), with a DuckDB SQL twin over the SAME pattern in the shared
Java-regex/RE2 dialect (leftmost-first alternation in both engines; no
backreferences or lookaround anywhere).

This closes the reference's largest unmapped module: the token TYPE
table and scanner of /root/reference/css/tokenizer/tokenizer.go. Type
ids below are the reference's own constants (tokenizer.go:120-154).
Where the reference scanner has TODO holes, the engine is first-class
(the same policy the attr ^= $= *= operators took for parse.go:104):

* Function (type 28) is declared but never emitted by the reference
  (its ident scanner stops at '(' — tokenizer.go:262-293); the engine
  emits it per spec for ``ident(``.
* Uri/BadUri (10/4): ``consumeURI`` is a TODO (tokenizer.go:438); the
  engine tokenizes ``url(...)`` per spec, BadUri for an unclosed one.
* UnicodeRange (11): the reference's heuristic logs and can return a
  nil token for u-prefixed idents (tokenizer.go:424-430,556); the
  engine matches the spec form ``u+XXXX(-YYYY)?`` with ``?`` wildcards
  and treats other u-words as Ident.
* Comment (27) / BadComment (5): ``/* */`` runs, unterminated to EOS.
* BadString (3): a string hitting newline/EOS before its close quote.

Token text is the RAW lexeme (escapes preserved, quotes included) —
lossless, and what both engines can agree on byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference type ids, tokenizer.go:120-154
IDENT = 0
AT_KEYWORD = 1
STRING = 2
BAD_STRING = 3
BAD_URI = 4
BAD_COMMENT = 5
HASH = 6
NUMBER = 7
PERCENTAGE = 8
DIMENSION = 9
URI = 10
UNICODE_RANGE = 11
CDO = 12
CDC = 13
COLON = 14
SEMICOLON = 15
COMMA = 16
LBRACE = 17
RBRACE = 18
LPAREN = 19
RPAREN = 20
LBRACKET = 21
RBRACKET = 22
INCLUDES = 23
PREFIXMATCH = 24
SUFFIXMATCH = 25
DASHMATCH = 26
COMMENT = 27
FUNCTION = 28
DELIM = 29
SUBSTRINGMATCH = 30
COLUMN = 31
WS = 32

# CSS ident: optional '-', then a name-start (letter/_/non-ascii/escape),
# then name chars. Escapes are kept RAW: \ + (1-6 hex digits + one
# optional whitespace terminator, per spec) or \ + any single char.
_ESC = r"\\(?:[0-9a-fA-F]{1,6}[ \t\r\n\f]?|(?s:.))"
_NMSTART = rf"(?:[a-zA-Z_]|[^\x00-\x7f]|{_ESC})"
_NMCHAR = rf"(?:[a-zA-Z0-9_-]|[^\x00-\x7f]|{_ESC})"
_IDENT = rf"-?{_NMSTART}{_NMCHAR}*"
_NUM = r"[-+]?(?:[0-9]*\.[0-9]+|[0-9]+)(?:[eE][-+]?[0-9]+)?"
_STR_D = rf'"(?:[^"\\\n]|{_ESC})*"'
_STR_S = rf"'(?:[^'\\\n]|{_ESC})*'"
_BAD_STR = rf"\"(?:[^\"\\\n]|{_ESC})*|'(?:[^'\\\n]|{_ESC})*"
_COMMENT = r"/\*[^*]*\*+(?:[^/*][^*]*\*+)*/"
_BAD_COMMENT = r"/\*(?s:.)*"
_URANGE = r"[uU]\+[0-9a-fA-F?]{1,6}(?:-[0-9a-fA-F]{1,6})?"
_URI = rf"[uU][rR][lL]\([ \t\r\n\f]*(?:{_STR_D}|{_STR_S}|[^)'\"\s\\]*)[ \t\r\n\f]*\)"
_BAD_URI = r"[uU][rR][lL]\([^)]*"

# leftmost-FIRST alternation: order encodes maximal-munch priority.
CSS_TOKEN_PATTERN = "|".join(
    [
        _COMMENT,
        _BAD_COMMENT,
        "<!--",
        "-->",
        _URANGE,
        _URI,
        _BAD_URI,
        rf"{_NUM}%",
        rf"{_NUM}{_IDENT}",
        _NUM,
        rf"@{_IDENT}",
        rf"#{_NMCHAR}+",
        rf"{_IDENT}\(",
        _IDENT,
        _STR_D,
        _STR_S,
        _BAD_STR,
        r"~=",
        r"\^=",
        r"\$=",
        r"\*=",
        r"\|=",
        r"\|\|",
        r"[:;,{}()\[\]]",
        r"[ \t\r\n\f]+",
        r"(?s:.)",
    ]
)


def _classify(s: Column) -> Column:
    """Token type of one extracted lexeme — a literal-only CASE chain
    (whole-stage codegen; the SQL twin mirrors every branch in order)."""
    one = {
        ":": COLON, ";": SEMICOLON, ",": COMMA, "{": LBRACE, "}": RBRACE,
        "(": LPAREN, ")": RPAREN, "[": LBRACKET, "]": RBRACKET,
        "~=": INCLUDES, "^=": PREFIXMATCH, "$=": SUFFIXMATCH,
        "*=": SUBSTRINGMATCH, "|=": DASHMATCH, "||": COLUMN,
        "<!--": CDO, "-->": CDC,
    }
    expr = None
    for lit, t in one.items():
        cond = s == lit
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    return (
        expr.when(s.rlike(r"^/\*(?s:.)*\*/$"), COMMENT)
        .when(s.rlike(r"^/\*"), BAD_COMMENT)
        .when(s.rlike(rf"^{_URANGE}$"), UNICODE_RANGE)
        .when(s.rlike(rf"^{_URI}$"), URI)
        .when(s.rlike(r"^[uU][rR][lL]\("), BAD_URI)
        .when(s.rlike(rf"^{_NUM}%$"), PERCENTAGE)
        .when(s.rlike(rf"^{_NUM}$"), NUMBER)
        .when(s.rlike(rf"^{_NUM}{_IDENT}$"), DIMENSION)
        .when(s.rlike(rf"^@{_IDENT}$"), AT_KEYWORD)
        .when(s.rlike(rf"^#{_NMCHAR}+$"), HASH)
        .when(s.rlike(rf"^{_IDENT}\($"), FUNCTION)
        .when(s.rlike(rf"^{_IDENT}$"), IDENT)
        .when(s.rlike(rf"^(?:{_STR_D}|{_STR_S})$"), STRING)
        .when(s.rlike("^[\"']"), BAD_STRING)
        .when(s.rlike(r"^[ \t\r\n\f]+$"), WS)
        .otherwise(F.lit(DELIM))
        .cast("int")
    )


def css_tokens(text: Column | str) -> Column:
    """array<struct<t int, s string>>: the full token stream of a CSS
    text column, in document order, whitespace runs included (drop them
    with filter(x -> x.t != 32) when WS is noise)."""
    c = F.col(text) if isinstance(text, str) else text
    lex = F.regexp_extract_all(c, F.lit(CSS_TOKEN_PATTERN), 0)
    return F.transform(
        lex, lambda s: F.struct(_classify(s).alias("t"), s.alias("s"))
    )


def _classify_sql(s: str) -> str:
    one = [
        (":", COLON), (";", SEMICOLON), (",", COMMA), ("{", LBRACE),
        ("}", RBRACE), ("(", LPAREN), (")", RPAREN), ("[", LBRACKET),
        ("]", RBRACKET), ("~=", INCLUDES), ("^=", PREFIXMATCH),
        ("$=", SUFFIXMATCH), ("*=", SUBSTRINGMATCH), ("|=", DASHMATCH),
        ("||", COLUMN), ("<!--", CDO), ("-->", CDC),
    ]
    lits = " ".join(f"WHEN {s} = '{k}' THEN {t}" for k, t in one)
    rx = [
        (r"^/\*(?s:.)*\*/$", COMMENT),
        (r"^/\*", BAD_COMMENT),
        (f"^{_URANGE}$", UNICODE_RANGE),
        (f"^{_URI}$", URI),
        (r"^[uU][rR][lL]\(", BAD_URI),
        (f"^{_NUM}%$", PERCENTAGE),
        (f"^{_NUM}$", NUMBER),
        (f"^{_NUM}{_IDENT}$", DIMENSION),
        (f"^@{_IDENT}$", AT_KEYWORD),
        (f"^#{_NMCHAR}+$", HASH),
        (f"^{_IDENT}\\($", FUNCTION),
        (f"^{_IDENT}$", IDENT),
        (f"^(?:{_STR_D}|{_STR_S})$", STRING),
        ("^[\"']", BAD_STRING),
        (r"^[ \t\r\n\f]+$", WS),
    ]
    rxs = " ".join(
        f"WHEN regexp_matches({s}, '{p.replace(chr(39), chr(39) * 2)}') THEN {t}"
        for p, t in rx
    )
    return f"CASE {lits} {rxs} ELSE {DELIM} END"


def css_tokens_sql(text: str) -> str:
    """DuckDB twin of ``css_tokens``: list of struct(t, s). Same
    pattern, same branch order; RE2 and Java regex agree on every
    construct used (no backrefs, no lookaround, leftmost-first
    alternation)."""
    pat = CSS_TOKEN_PATTERN.replace("'", "''")
    return (
        f"list_transform(regexp_extract_all({text}, '{pat}', 0), "
        f"s -> {{'t': {_classify_sql('s')}, 's': s}})"
    )
