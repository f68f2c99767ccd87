"""PII-style pattern redaction — the scrub step every public pretraining
recipe runs before training (emails, URLs, IP addresses, long digit runs
get replaced with typed placeholders). The reference analogue is
TransformAttrib/ModifyAttrib value rewriting (html/transform/
transform.go:221-247) applied to text payloads instead of attributes.

Scale shape: a chain of ``regexp_replace`` calls — pure JVM expressions
inside whole-stage codegen, ZERO shuffle, ZERO Python. The patterns are
deliberately restricted to the dialect that parses identically under
Java regex (Spark) and RE2 (DuckDB): no lookarounds, no backrefs, no
\\p classes (the BPE_RE precedent, functions/text.py).

Redaction is SEQUENTIAL and the order is part of the contract: URL
first (an email-shaped substring inside a URL belongs to the URL), then
EMAIL, then IPV4 (dotted quads would otherwise be eaten digit-run by
digit-run), then bare DIGIT runs >= 6. Each stage's hit count is the
match count on that stage's INPUT (post-prior-redaction) text — both
engines compute the same composition, so counts are exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, placeholder) — applied strictly in this order
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # explicit whitespace charset: bare `[^ ]` matches \n/\t in both Java
    # regex and RE2, so one URL would consume the rest of the line AND any
    # following lines up to the next space — destroying adjacent corpus text
    ("url", "https?://[^ \\t\\n\\r]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("digits", "[0-9]{6,}", "<NUM>"),
)


def redact_pii(text: Column) -> Column:
    """text with every PII pattern replaced by its typed placeholder."""
    out = text
    for _, pat, ph in PII_PATTERNS:
        out = F.regexp_replace(out, pat, ph)
    return out


def redact_pii_sql(text: str = "text") -> str:
    out = text
    for _, pat, ph in PII_PATTERNS:
        # 'g' flag: DuckDB regexp_replace is first-match-only by default,
        # Spark's is global
        out = f"regexp_replace({out}, '{pat}', '{ph}', 'g')"
    return out


def pii_hits(text: Column) -> Column:
    """Total number of redactions across all stages (exact int64,
    counted on each stage's post-prior-redaction input like the
    replacement chain itself)."""
    total = F.lit(0).cast("long")
    cur = text
    for _, pat, ph in PII_PATTERNS:
        total = total + F.regexp_count(cur, F.lit(pat)).cast("long")
        cur = F.regexp_replace(cur, pat, ph)
    return total


def pii_hits_sql(text: str = "text") -> str:
    parts = []
    cur = text
    for _, pat, ph in PII_PATTERNS:
        parts.append(f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT)")
        cur = f"regexp_replace({cur}, '{pat}', '{ph}', 'g')"
    return "(" + " + ".join(parts) + ")"
