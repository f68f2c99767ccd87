"""Deterministic cross-engine tokenizer: text -> tokens:array<int32>.

The engine consumes *pre-tokenized* sequences (input_hint); at the test
scales the driver ships raw ``documents.text``, so we define one
deterministic word->token-id hash that is expressible BOTH as a Spark Column
expression and as DuckDB SQL — the two must agree bit-for-bit because the
driver cross-checks every query against a DuckDB oracle.

Reference precedent: the CSS tokenizer emits ``Token{Type:int, String}``
(/root/reference/css/tokenizer/tokenizer.go:156-160) — an integer token id
per lexeme; this module is the engine-side analogue producing int32 ids in
[0, VOCAB_SIZE).

The hash uses only ``ascii(first_char)``, ``ascii(last_char)`` and
``length(word)`` — functions with identical semantics in Spark SQL and
DuckDB on the all-ASCII corpus (verified max codepoint 119).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

VOCAB_SIZE = 1024

# Mixing constants — arbitrary odd primes; fixed forever for determinism.
_A, _B, _C = 7, 131, 1009


def word_token_expr(w: Column) -> Column:
    """Token id of one word. Pure integer arithmetic, JVM-side."""
    return (
        F.ascii(w) * _A + F.ascii(F.substring(w, -1, 1)) * _B + F.length(w) * _C
    ) % VOCAB_SIZE


def tokens_expr(text: Column | str) -> Column:
    """text -> array<int32> of token ids (whitespace split, empties dropped).

    Array-native: ``split`` -> ``filter`` -> ``transform``; stays inside
    whole-stage codegen, no shuffle, no Python.
    """
    col = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(col, " "), lambda w: F.length(w) > 0)
    return F.transform(words, word_token_expr).cast("array<int>")


def tokens_sql(text_expr: str = "text") -> str:
    """The same tokenizer as DuckDB SQL (oracle side)."""
    return (
        f"list_transform("
        f"list_filter(string_split({text_expr}, ' '), w -> length(w) > 0), "
        f"w -> CAST((ascii(w) * {_A} + ascii(w[-1]) * {_B} + length(w) * {_C}) "
        f"% {VOCAB_SIZE} AS INTEGER))"
    )
