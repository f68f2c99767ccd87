"""Rule IR + compiler: selector-analogue chains -> Catalyst Column expressions.

Reference IR: ``selector.Chain{Head Sequence, Tail []Link}`` with
``SimpleSelector{Type, Tag/Value, AttrMatch}`` —
/root/reference/css/selector/data.go:15-46,320-326. The engine re-expresses
it over token sequences (SURVEY.md §2.4-2.5):

| reference                      | engine                                        |
|--------------------------------|-----------------------------------------------|
| Tag selector ``a``             | token-id equality ``t123``                    |
| Universal ``*``                | always-true token predicate                   |
| Id ``#x``                      | row predicate ``doc_id == x``                 |
| Class ``.c``                   | row predicate ``source == c``                 |
| Attr ``[k]``/``[k=v]``/...     | row predicate over ``attrs`` map column       |
| ``:first-child``/``:last-child``| position predicate ``pos==0`` / ``pos==n-1`` |
| ``:only-child`` / ``:empty``   | ``n_tok==1`` / ``n_tok==0``                   |
| ``:root``                      | ``pos==0`` (flat-sequence root)               |
| descendant `` ``               | later position (q > min(P))                   |
| child ``>``                    | immediately-next position (q-1 ∈ P)           |
| adjacent ``+``                 | |Δpos|==1 — BOTH directions, pinning the      |
|                                | reference quirk at data.go:292-299            |
| sibling ``~``                  | any other position in the same sequence       |

Matching is ARRAY-NATIVE: the match set of a chain is computed per row as an
``array<int>`` of positions via nested higher-order functions — no explode,
no shuffle, whole-stage codegen end to end. (An exploded/join formulation
lives in operators/match.py for the oracle cross-check and for rows whose
token arrays exceed memory comfort.)

Specificity (data.go:104-107,180-191): Id=1e14, Class/Attr/Pseudo=1e8, Tag=1,
summed over the chain — used as rule priority.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

ID_SPECIFICITY = 10**14  # aMul, css/selector/data.go:105
CLASS_SPECIFICITY = 10**8  # bMul, css/selector/data.go:106
TAG_SPECIFICITY = 1


class PartKind(Enum):
    TAG = "tag"
    UNIVERSAL = "universal"
    ID = "id"
    CLASS = "class"
    ATTR = "attr"
    PSEUDO = "pseudo"


class AttrOp(Enum):
    # css/selector/data.go:62-74; ^= $= *= are tokenized but unparsed in the
    # reference (TODO parse.go:104) — the engine supports them natively.
    PRESENCE = "presence"
    EXACTLY = "exactly"
    CONTAINS = "contains"  # whitespace-list membership, ~=
    DASH_PREFIX = "dashprefix"  # |=
    PREFIX = "prefix"  # ^=
    SUFFIX = "suffix"  # $=
    SUBSTRING = "substring"  # *=


class Combinator(Enum):
    DESCENDANT = " "
    CHILD = ">"
    ADJACENT = "+"
    SIBLING = "~"


PSEUDOS = ("first-child", "last-child", "only-child", "empty", "root")


@dataclass(frozen=True)
class SeqPart:
    kind: PartKind
    value: str = ""
    attr_key: str = ""
    attr_op: AttrOp = AttrOp.PRESENCE

    @property
    def specificity(self) -> int:
        if self.kind == PartKind.ID:
            return ID_SPECIFICITY
        if self.kind in (PartKind.CLASS, PartKind.ATTR, PartKind.PSEUDO):
            return CLASS_SPECIFICITY
        if self.kind == PartKind.TAG:
            return TAG_SPECIFICITY
        return 0


@dataclass(frozen=True)
class Sequence:
    parts: tuple[SeqPart, ...]

    @property
    def specificity(self) -> int:
        return sum(p.specificity for p in self.parts)

    def __str__(self) -> str:
        out = []
        for p in self.parts:
            if p.kind == PartKind.TAG:
                out.append(p.value)
            elif p.kind == PartKind.UNIVERSAL:
                out.append("*")
            elif p.kind == PartKind.ID:
                out.append(f"#{p.value}")
            elif p.kind == PartKind.CLASS:
                out.append(f".{p.value}")
            elif p.kind == PartKind.PSEUDO:
                out.append(f":{p.value}")
            elif p.kind == PartKind.ATTR:
                op = {
                    AttrOp.PRESENCE: "",
                    AttrOp.EXACTLY: "=",
                    AttrOp.CONTAINS: "~=",
                    AttrOp.DASH_PREFIX: "|=",
                    AttrOp.PREFIX: "^=",
                    AttrOp.SUFFIX: "$=",
                    AttrOp.SUBSTRING: "*=",
                }[p.attr_op]
                body = p.attr_key if not op else f"{p.attr_key}{op}{p.value}"
                out.append(f"[{body}]")
        return "".join(out)


@dataclass(frozen=True)
class Link:
    combinator: Combinator
    seq: Sequence

    def __str__(self) -> str:
        c = self.combinator.value
        return f" {c.strip()} {self.seq}" if c != " " else f" {self.seq}"


@dataclass(frozen=True)
class Chain:
    head: Sequence
    links: tuple[Link, ...] = field(default_factory=tuple)

    @property
    def specificity(self) -> int:
        # Chain.Specificity sums head + every tail sequence
        # (css/selector/data.go:358-367).
        return self.head.specificity + sum(l.seq.specificity for l in self.links)

    def __str__(self) -> str:
        return str(self.head) + "".join(str(l) for l in self.links)


# ---------------------------------------------------------------------------
# Compilation to Column expressions
# ---------------------------------------------------------------------------

def _empty() -> Column:
    # built lazily — Column construction requires an active session
    return F.array().cast("array<int>")


def _attr_pred(part: SeqPart, attrs: Column) -> Column:
    """Attr match modes — css/selector/data.go:109-124,163-174."""
    v = F.element_at(attrs, part.attr_key)
    if part.attr_op == AttrOp.PRESENCE:
        return v.isNotNull()
    if part.attr_op == AttrOp.EXACTLY:
        return v == part.value
    if part.attr_op == AttrOp.CONTAINS:
        return F.array_contains(F.split(v, " "), part.value)
    if part.attr_op == AttrOp.DASH_PREFIX:
        return (v == part.value) | v.startswith(part.value + "-")
    if part.attr_op == AttrOp.PREFIX:
        return v.startswith(part.value)
    if part.attr_op == AttrOp.SUFFIX:
        return v.endswith(part.value)
    if part.attr_op == AttrOp.SUBSTRING:
        return v.contains(part.value)
    raise ValueError(f"unknown attr op {part.attr_op}")


@dataclass
class _CompiledSeq:
    row_pred: Column
    tok_preds: list  # callables (tok, pos, n) -> Column
    allows_empty: bool
    tag_ids: list  # int token ids of TAG parts (codegen fast-path metadata)
    has_pos_pred: bool  # any position-dependent pseudo predicate


@dataclass
class CompiledRule:
    """A chain compiled against concrete column names. Reusable across
    DataFrames with the same schema — the analogue of the precompiled
    ``Transform{coll, f}`` (transform.go:118-147)."""

    chain: Chain
    positions: Column  # array<int> of final-stage match positions per row
    row_matched: Column  # boolean: this row is in the match set
    specificity: int


def _compile_sequence(
    seq: Sequence,
    doc_id: Column,
    source: Column,
    attrs: Column | None,
) -> _CompiledSeq:
    row_preds: list[Column] = []
    tok_preds: list = []
    allows_empty = False
    tag_ids: list[int] = []
    has_pos_pred = False
    for part in seq.parts:
        if part.kind == PartKind.TAG:
            tid = int(part.value.lstrip("t"))
            tag_ids.append(tid)
            tok_preds.append(lambda tok, pos, n, _t=tid: tok == F.lit(_t))
        elif part.kind == PartKind.UNIVERSAL:
            pass
        elif part.kind == PartKind.ID:
            row_preds.append(doc_id == part.value)
        elif part.kind == PartKind.CLASS:
            row_preds.append(source == part.value)
        elif part.kind == PartKind.ATTR:
            if attrs is None:
                raise ValueError("attr selector used but no attrs column bound")
            row_preds.append(_attr_pred(part, attrs))
        elif part.kind == PartKind.PSEUDO:
            if part.value in ("first-child", "root"):
                has_pos_pred = True
                tok_preds.append(lambda tok, pos, n: pos == F.lit(0))
            elif part.value == "last-child":
                has_pos_pred = True
                tok_preds.append(lambda tok, pos, n: pos == n - 1)
            elif part.value == "only-child":
                has_pos_pred = True
                tok_preds.append(lambda tok, pos, n: n == F.lit(1))
            elif part.value == "empty":
                # :empty is inherently row-level in the flat model
                # (data.go:144-145 -> n_tok == 0); flagged so compile_chain
                # can bind it against the tokens column.
                allows_empty = True
            else:
                # other pseudo-classes panic in the reference
                # (data.go:146-148); the engine fails at compile time.
                raise ValueError(f"unsupported pseudo-class :{part.value}")
    row_pred = reduce(lambda a, b: a & b, row_preds) if row_preds else F.lit(True)
    return _CompiledSeq(row_pred, tok_preds, allows_empty, tag_ids, has_pos_pred)


def _seq_positions(cs: _CompiledSeq, tokens: Column) -> Column:
    """Positions in ``tokens`` matching every token-level predicate of the
    sequence — one fused transform+filter, index-aware lambdas."""
    n = F.size(tokens)
    if not cs.tok_preds:
        # universal: every position matches (Sequence.Find full scan,
        # data.go:217-227)
        return F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(_empty())

    def keep(tok, pos):
        cond = F.lit(True)
        for p in cs.tok_preds:
            cond = cond & p(tok, pos, n)
        return cond

    marked = F.transform(tokens, lambda tok, pos: F.when(keep(tok, pos), pos).otherwise(F.lit(-1)))
    return F.filter(marked, lambda x: x >= 0).cast("array<int>")


def compile_chain(
    chain: Chain,
    tokens: Column | str = "tokens",
    doc_id: Column | str = "doc_id",
    source: Column | str = "source",
    attrs: Column | str | None = "attrs",
    n_tok: Column | str = "n_tok",
) -> CompiledRule:
    """Compile a chain into (positions:array<int>, row_matched:boolean).

    Chain.Find staged refinement (css/selector/data.go:328-345): head
    positions, then each link narrows/extends via its combinator; the
    identity-set dedup (data.go:330,336-341) is inherent — positions are a
    set per row, produced sorted and unique.
    """
    tokens = F.col(tokens) if isinstance(tokens, str) else tokens
    doc_id = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    source = F.col(source) if isinstance(source, str) else source
    if isinstance(attrs, str):
        attrs = F.col(attrs)
    n = F.size(tokens)

    seqs = [chain.head] + [l.seq for l in chain.links]
    compiled = [_compile_sequence(s, doc_id, source, attrs) for s in seqs]

    row_pred = reduce(lambda a, b: a & b, (c.row_pred for c in compiled))
    allows_empty = any(c.allows_empty for c in compiled)

    def _link_positions(link, prev, cand):
        """Next-stage positions. SET-NATIVE: no lambda captures the outer
        row — interpreted HOF lambdas re-evaluate any captured outer-row
        subexpression once PER ELEMENT, an O(n²) trap — so every combinator
        is expressed with array_intersect/array_remove over shifted copies
        of ``prev`` (each evaluated once per row). ``cand`` is unique
        ascending; array_intersect preserves first-arg order, keeping the
        result unique ascending."""
        if link.combinator == Combinator.DESCENDANT:
            # q strictly after some p in P  <=>  q > min(P)
            # (Link.Find descendant walks the subtree under each context
            # node, data.go:278-284)
            # cand ∩ (min(P), n): the candidate positions strictly after the
            # first context match, as one range-intersect per row
            m = F.array_min(prev)  # NULL when prev empty -> otherwise branch
            return F.when(
                (F.size(prev) > 0) & (m + 1 <= n - 1),
                F.array_intersect(cand, F.sequence(m + 1, n - 1)),
            ).otherwise(_empty())
        if link.combinator == Combinator.CHILD:
            # immediately-next position (data.go:285-291): cand ∩ (P+1)
            return F.array_intersect(cand, F.transform(prev, lambda p: p + 1))
        if link.combinator == Combinator.ADJACENT:
            # BOTH directions — reference quirk (data.go:292-299):
            # cand ∩ (P+1 ∪ P−1)
            return F.array_intersect(
                cand,
                F.concat(
                    F.transform(prev, lambda p: p + 1),
                    F.transform(prev, lambda p: p - 1),
                ),
            )
        if link.combinator == Combinator.SIBLING:
            # any other position, both directions (data.go:300-311):
            # |P|>=2 -> all of cand; |P|==1 -> cand minus that position
            return F.when(F.size(prev) == 0, _empty()).when(
                F.size(prev) >= 2, cand
            ).otherwise(F.array_remove(cand, F.element_at(prev, 1)))
        raise ValueError(f"unknown combinator {link.combinator}")  # pragma: no cover

    # Positions chain. Every stage emits a strictly-increasing unique array
    # (head: index-ordered fused transform+filter; links: order-preserving
    # set ops over such arrays), so the identity-set dedup + document order
    # of Chain.Find (data.go:330-343) hold by construction — no
    # sort/distinct pass needed.
    pos = _seq_positions(compiled[0], tokens)
    for link, cs in zip(chain.links, compiled[1:]):
        cand = _seq_positions(cs, tokens)
        pos = _link_positions(link, pos, cand)
    positions = pos.cast("array<int>")

    if allows_empty:
        # :empty matches the (childless) row itself; the match set has no
        # positions, the row predicate carries the whole condition.
        matched = row_pred & (n == 0)
    elif not chain.links and compiled[0].tok_preds:
        # single-sequence fast path: no positions array — transforms that
        # ignore match positions then never pay for it
        cs0 = compiled[0]
        if cs0.tag_ids and not cs0.has_pos_pred:
            # pure tag conjunction: whole-stage-codegen'd array_contains
            # (filter/exists/transform are interpreted CodegenFallback).
            # Distinct ids can't all equal one token -> statically false.
            tids = sorted(set(cs0.tag_ids))
            matched = (
                row_pred & F.array_contains(tokens, F.lit(tids[0]))
                if len(tids) == 1
                else F.lit(False)
            )
        else:

            def keep(tok, p):
                cond = F.lit(True)
                for tp in cs0.tok_preds:
                    cond = cond & tp(tok, p, n)
                return cond

            matched = row_pred & (F.size(F.filter(tokens, keep)) > 0)
    elif not chain.links:
        matched = row_pred & (n > 0)
    else:
        # chains: codegen'd array_contains guards for every stage's tag ids
        # short-circuit the interpreted positional check — rows missing any
        # required token never evaluate it. The positional subtree is shared
        # with `positions` via Catalyst subexpression elimination.
        guard = F.lit(True)
        for cs in compiled:
            for tid in sorted(set(cs.tag_ids)):
                guard = guard & F.array_contains(tokens, F.lit(tid))
        matched = row_pred & guard & (F.size(positions) > 0)
    return CompiledRule(chain, positions, matched, chain.specificity)
