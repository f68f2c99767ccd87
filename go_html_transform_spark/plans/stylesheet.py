"""Declarative rule-file frontend: parse a stylesheet of
``selector { property: value; ... }`` rulesets into an ordered,
priority-sorted transform pipeline.

The reference defines the AST — ``Stylesheet``/``Statement``/``Ruleset
{Selector, DeclarationList}``/``Declaration{Property, Value}``
(/root/reference/css/data.go:8-57) — and ``SelectorFromScanner`` stops
at ``{`` precisely so selectors can be parsed out of a CSS file
(/root/reference/css/selector/parse.go:9-29), but ships no stylesheet
parser and never populates the AST. This module is the engine's
first-class version: the same AST shapes, a parser for them, and a
compiler onto ``Transformer.apply`` — rules fold in priority order
(selector specificity, reference data.go:180-191 computes it but never
uses it; an explicit ``priority`` declaration overrides), document
order breaking ties.

Grammar (CSS-shaped, token-domain values):

    /* comment */              <!-- html comment -->
    @charset "utf-8";          (at-rules parsed, carried, not compiled)
    t982.en { append: 1023 5; }
    t756 > t982 { map: 756 -> 757; priority: 9; }

Declaration properties (all values are integer lists unless noted):

    append: i...            AppendChildren      (transform.go:157-167)
    prepend: i...           PrependChildren     (transform.go:169-176)
    remove-children:        RemoveChildren      (transform.go:178-190)
    replace-children: i...  ReplaceChildren     (transform.go:192-201)
    replace: p i...         Replace/splice at position p (transform.go:208-223)
    insert-before: p i...   CopyAnd placement   (transform.go:239-244)
    map: a -> b             Subtransform token a to b (transform.go:250-281)
    priority: n             rule priority override (meta, not a transform)

Multiple declarations in one block compose in order (DoAll,
transform.go:225-233) inside ONE projection — Catalyst's
CollapseProject keeps the whole stylesheet single-pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import functions as F

from go_html_transform_spark.operators import transforms as X
from go_html_transform_spark.plans.parser import ParseError, parse_rule
from go_html_transform_spark.plans.pipeline import Transform, Transformer
from go_html_transform_spark.plans.rules import Chain


@dataclass(frozen=True)
class Declaration:
    """css.Declaration (data.go:48-52): a Property and Value pair."""

    property: str
    value: str


@dataclass(frozen=True)
class Ruleset:
    """css.Ruleset (data.go:29-32): selector + declaration block."""

    selector: Chain
    selector_text: str
    declarations: tuple[Declaration, ...]

    @property
    def priority(self) -> int:
        for d in self.declarations:
            if d.property == "priority":
                return int(d.value)
        return self.selector.specificity


@dataclass(frozen=True)
class AtRule:
    """css.AtRule (data.go:20-26): keyword + params; carried, not
    compiled (the reference never evaluates them either)."""

    keyword: str
    params: tuple[str, ...]


@dataclass
class Stylesheet:
    """css.Stylesheet (data.go:7-10): statements in document order."""

    rulesets: list[Ruleset] = field(default_factory=list)
    at_rules: list[AtRule] = field(default_factory=list)
    comments: list[str] = field(default_factory=list)


def _strip_block_comments(block: str) -> str:
    """Remove ``/* ... */`` runs inside a declaration block (values are
    integer lists — no string syntax exists in the block grammar, so a
    lexical strip is safe). An unclosed comment is the same fail-fast as
    at statement level."""
    out = []
    i, n = 0, len(block)
    while i < n:
        j = block.find("/*", i)
        if j < 0:
            out.append(block[i:])
            break
        end = block.find("*/", j + 2)
        if end < 0:
            raise ParseError(f"unclosed comment in declaration block: {block[j:]!r}")
        out.append(block[i:j])
        i = end + 2
    return "".join(out)


def parse_stylesheet(text: str) -> Stylesheet:
    sheet = Stylesheet()
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if text.startswith("/*", i):
            end = text.find("*/", i + 2)
            if end < 0:
                raise ParseError(f"unclosed comment at offset {i}")
            sheet.comments.append(text[i + 2 : end].strip())
            i = end + 2
            continue
        if text.startswith("<!--", i):
            end = text.find("-->", i + 4)
            if end < 0:
                raise ParseError(f"unclosed html comment at offset {i}")
            sheet.comments.append(text[i + 4 : end].strip())
            i = end + 3
            continue
        if c == "@":
            semi = text.find(";", i)
            if semi < 0:
                raise ParseError(f"unclosed at-rule at offset {i}")
            parts = text[i + 1 : semi].split()
            if not parts:
                raise ParseError(f"empty at-rule at offset {i}")
            sheet.at_rules.append(AtRule(parts[0], tuple(parts[1:])))
            i = semi + 1
            continue
        # a ruleset: selector text runs to '{' (SelectorFromScanner's
        # stop-at-brace contract, parse.go:9-29)
        brace = text.find("{", i)
        if brace < 0:
            raise ParseError(f"selector without declaration block at offset {i}")
        sel_text = text[i:brace].strip()
        chain = parse_rule(sel_text)
        end = text.find("}", brace)
        if end < 0:
            raise ParseError(f"unclosed declaration block at offset {brace}")
        decls = []
        block = _strip_block_comments(text[brace + 1 : end])
        for raw in block.split(";"):
            raw = raw.strip()
            if not raw:
                continue
            if ":" not in raw:
                raise ParseError(f"declaration without ':' : {raw!r}")
            prop, _, val = raw.partition(":")
            decls.append(Declaration(prop.strip().lower(), val.strip()))
        for d in decls:
            if d.property == "priority":
                try:
                    int(d.value)
                except ValueError as e:
                    raise ParseError(
                        f"priority: expected an integer, got {d.value!r}"
                    ) from e
        sheet.rulesets.append(Ruleset(chain, sel_text, tuple(decls)))
        i = end + 1
    return sheet


def _ints(value: str, prop: str, minimum: int = 0) -> list[int]:
    try:
        out = [int(x) for x in value.split()]
    except ValueError as e:
        raise ParseError(f"{prop}: expected integers, got {value!r}") from e
    if len(out) < minimum:
        raise ParseError(f"{prop}: needs at least {minimum} values, got {value!r}")
    return out


def _compile_declaration(d: Declaration):
    """One declaration -> a tokens->tokens column function."""
    p, v = d.property, d.value
    if p == "append":
        vals = _ints(v, p, 1)
        return lambda t: X.append_children(t, F.array(*[F.lit(x) for x in vals]))
    if p == "prepend":
        vals = _ints(v, p, 1)
        return lambda t: X.prepend_children(t, F.array(*[F.lit(x) for x in vals]))
    if p == "remove-children":
        if v:
            raise ParseError(f"remove-children takes no value, got {v!r}")
        return lambda t: X.remove_children(t)
    if p == "replace-children":
        vals = _ints(v, p, 1)
        return lambda t: X.replace_children(t, F.array(*[F.lit(x) for x in vals]))
    if p == "replace":
        vals = _ints(v, p, 2)
        pos, repl = vals[0], vals[1:]
        return lambda t: X.splice(t, pos, F.array(*[F.lit(x) for x in repl]))
    if p == "insert-before":
        vals = _ints(v, p, 2)
        pos, ins = vals[0], vals[1:]
        return lambda t: X.insert_before(t, pos, F.array(*[F.lit(x) for x in ins]))
    if p == "map":
        src, _, dst = v.partition("->")
        a = _ints(src.strip(), p, 1)[0]
        b = _ints(dst.strip(), p, 1)[0]
        return lambda t: X.subtransform(t, lambda tok: tok == a, lambda tok: F.lit(b))
    raise ParseError(f"unknown declaration property {p!r}")


def compile_ruleset(rs: Ruleset) -> Transform:
    """One ruleset -> one precompiled Transform: its declarations (minus
    the priority meta) compose in order via do_all."""
    fns = [
        _compile_declaration(d) for d in rs.declarations if d.property != "priority"
    ]
    if not fns:
        raise ParseError(f"ruleset {rs.selector_text!r} has no transform declarations")
    return Transform(rs.selector, lambda t, p: X.do_all(t, *fns))


def load_rules(text: str) -> list[tuple[int, Transform]]:
    """Parse + compile: (priority, Transform) in document order."""
    sheet = parse_stylesheet(text)
    return [(rs.priority, compile_ruleset(rs)) for rs in sheet.rulesets]


def apply_stylesheet(tr: Transformer, text: str) -> Transformer:
    """The Ruleset-table entry point: parse a rule file, sort by
    priority descending (document order breaks ties — stable sort), and
    fold every rule through ``Transformer.apply`` — the declarative twin
    of ``apply_all(by_priority=True)`` (pipeline.py)."""
    ranked = load_rules(text)
    ranked.sort(key=lambda pt: -pt[0])
    cur = tr
    for _, t in ranked:
        cur = cur.apply(t)
    return cur
