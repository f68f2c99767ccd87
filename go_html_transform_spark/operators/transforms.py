"""Token-array mutation operators — the TransformFunc half of the engine.

Reference: every HOF in /root/reference/html/transform/transform.go returns a
``TransformFunc = func(*html.Node)`` that mutates a node in place
(transform.go:41-42). Here each operator is a *pure* Column expression
``tokens -> tokens'`` (SURVEY.md §2.10): immutable, whole-stage-codegen'd,
zero Python in the hot path. Cloning (transform.go:59-62) is free —
DataFrames are immutable.

All functions take/return ``pyspark.sql.Column`` so they compose and Catalyst
collapses chains of them into a single projection (the reference's
acknowledged "walk the tree once" TODO at transform.go:114, solved for free).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_array(tokens: Sequence[int]) -> Column:
    """Literal array<int32> — the analogue of constructing nodes with
    h5.Text/h5.Element (/root/reference/h5/node.go:81-129)."""
    if not tokens:
        return F.array().cast("array<int>")
    return F.array(*[F.lit(int(t)) for t in tokens]).cast("array<int>")


def _as_col(x) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return lit_array(x)


def append_children(tokens, suffix) -> Column:
    """AppendChildren (/root/reference/html/transform/transform.go:157-167):
    append token(s) at the end of the sequence."""
    return F.concat(_as_col(tokens), _as_col(suffix))


def prepend_children(tokens, prefix) -> Column:
    """PrependChildren (transform.go:169-176): insert before first child."""
    return F.concat(_as_col(prefix), _as_col(tokens))


def remove_children(tokens) -> Column:
    """RemoveChildren (transform.go:178-190): drop the whole child list."""
    return F.array().cast("array<int>")


def replace_children(tokens, replacement) -> Column:
    """ReplaceChildren (transform.go:192-201): remove all, then append new."""
    return _as_col(replacement)


def splice(tokens, pos, replacement) -> Column:
    """Replace (transform.go:208-223): splice ``replacement`` in place of the
    element at 0-based ``pos``. The reference panics when the target is the
    root (transform.go:214-215); position-0 splices are legal here (pos 0 is
    just the first token, not a root), but out-of-range positions yield the
    input unchanged — pinned semantics, covered by tests.
    """
    t = _as_col(tokens)
    p = pos if isinstance(pos, Column) else F.lit(int(pos))
    n = F.size(t)
    head = F.slice(t, 1, p)  # elements [0, pos)
    tail = F.when(p + F.lit(2) <= n, F.slice(t, p + 2, n - p - 1)).otherwise(
        F.array().cast("array<int>")
    )
    out = F.concat(head, _as_col(replacement), tail)
    return F.when((p >= 0) & (p < n), out).otherwise(t)


def insert_before(tokens, pos, insertion) -> Column:
    """Splice-insert without removal: clones placed before position ``pos``
    (the first half of CopyAnd's behavior, transform.go:239-244)."""
    t = _as_col(tokens)
    p = pos if isinstance(pos, Column) else F.lit(int(pos))
    n = F.size(t)
    return F.concat(F.slice(t, 1, p), _as_col(insertion), F.slice(t, p + 1, n - p))


def do_all(tokens, *fns) -> Column:
    """DoAll (transform.go:225-233): sequential composition. Catalyst
    collapses the nested expressions into one projection."""
    out = _as_col(tokens)
    for fn in fns:
        out = fn(out)
    return out


def copy_and(tokens, *fns) -> Column:
    """CopyAnd (transform.go:235-248) — the fan-out/templating primitive:
    one input sequence -> one variant per transform. Returns
    array<array<int>>; explode it to materialize one row per variant:

        df.withColumn("tokens", F.explode(copy_and("tokens", f1, f2)))
    """
    t = _as_col(tokens)
    return F.array(*[fn(t) for fn in fns])


def subtransform(tokens, pred, fn) -> Column:
    """Subtransform (transform.go:250-281): scope a transform to matched
    elements only — every token satisfying ``pred`` is mapped through ``fn``,
    others pass through. Array-native nested HOF; no explode, no shuffle.

    ``pred``/``fn`` are Column->Column (token-level).
    """
    t = _as_col(tokens)
    return F.transform(t, lambda tok: F.when(pred(tok), fn(tok)).otherwise(tok)).cast(
        "array<int>"
    )


def filter_tokens(tokens, pred) -> Column:
    """Scoped removal: keep tokens failing pred removed (RemoveChild per-match
    analogue, transform.go:184-189)."""
    return F.filter(_as_col(tokens), pred)


# ---------------------------------------------------------------------------
# Attribute (map-column) operators — ModifyAttrib / TransformAttrib
# ---------------------------------------------------------------------------


def modify_attrib(attrs, key: str, val) -> Column:
    """ModifyAttrib (transform.go:283-299): upsert key=val in a
    map<string,string> column (update if present, else append)."""
    m = F.col(attrs) if isinstance(attrs, str) else attrs
    cleaned = F.map_filter(m, lambda k, _v: k != F.lit(key))
    addition = F.create_map(F.lit(key), F.lit(val) if not isinstance(val, Column) else val)
    return F.map_concat(cleaned, addition)


def transform_attrib(attrs, key: str, fn) -> Column:
    """TransformAttrib (transform.go:301-312): map an existing attribute's
    value through ``fn``; strictly a no-op when the key is absent."""
    m = F.col(attrs) if isinstance(attrs, str) else attrs
    return F.transform_values(
        m, lambda k, v: F.when(k == F.lit(key), fn(v)).otherwise(v)
    )


def subtransform_scoped(tokens, positions, pred, fn) -> Column:
    """Subtransform with re-rooted scope (transform.go:250-281 +
    SubtransformCollector): the inner (pred -> fn) rewrite applies only
    WITHIN the subtree of the first match — in the flat sequence model,
    the suffix starting at the first matched position. Tokens before the
    scope pass through untouched even when they satisfy ``pred``.

    ``positions`` is the outer rule's match-position array (as handed to
    transform fns by Transformer.apply)."""
    t = _as_col(tokens)
    start = F.element_at(positions, 1)  # first match, 0-based position
    return F.transform(
        t,
        lambda tok, i: F.when(
            (i >= start) & pred(tok), fn(tok)
        ).otherwise(tok),
    ).cast("array<int>")
