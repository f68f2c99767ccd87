"""Rule mini-language parser: selector-spec string -> Chain IR.

Mirrors the reference's recursive-descent selector parser
(/root/reference/css/selector/parse.go:9-248) including its error behavior:

* selector groups (``,``) are rejected        (parse.go:208)
* leading combinators are rejected            (parse.go:210-212)
* double combinators are rejected             (parse.go:185-191)
* unclosed ``[`` is rejected                  (parse.go:114)
* unknown pseudo-classes are rejected         (engine is fail-fast; the
  reference panics lazily at match time, data.go:146-148, and even runs a
  zero-value chain after a parse error, transform.go:93-97 — pinned as a
  quirk we deliberately do NOT replicate)

Grammar (token-sequence dialect):

    chain    := sequence (combinator sequence)*
    sequence := part+
    part     := 't'DIGITS      -- tag analogue: token-id equality
              | '*'            -- universal
              | '#'ident       -- doc_id equality
              | '.'ident       -- source equality
              | ':'pseudo      -- first-child|last-child|only-child|empty|root
              | '['key (op value)? ']'    -- attrs-map match; op in = ~= |= ^= $= *=
    combinator := ' ' | '>' | '+' | '~'
"""

from __future__ import annotations

from go_html_transform_spark.plans.rules import (
    PSEUDOS,
    AttrOp,
    Chain,
    Combinator,
    Link,
    PartKind,
    SeqPart,
    Sequence,
)


class ParseError(ValueError):
    pass


_IDENT = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-")
_ATTR_OPS = (
    ("~=", AttrOp.CONTAINS),
    ("|=", AttrOp.DASH_PREFIX),
    ("^=", AttrOp.PREFIX),
    ("$=", AttrOp.SUFFIX),
    ("*=", AttrOp.SUBSTRING),
    ("=", AttrOp.EXACTLY),
)


class _Scanner:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def next(self) -> str:
        c = self.peek()
        self.i += 1
        return c

    def ident(self) -> str:
        start = self.i
        while self.peek() and self.peek() in _IDENT:
            self.i += 1
        if self.i == start:
            raise ParseError(f"expected identifier at offset {start} in {self.s!r}")
        return self.s[start : self.i]


def _parse_part(sc: _Scanner) -> SeqPart:
    c = sc.peek()
    if c == "*":
        sc.next()
        return SeqPart(PartKind.UNIVERSAL)
    if c == "#":
        sc.next()
        return SeqPart(PartKind.ID, sc.ident())
    if c == ".":
        sc.next()
        return SeqPart(PartKind.CLASS, sc.ident())
    if c == ":":
        sc.next()
        if sc.peek() == ":":
            # pseudo-elements can never match (data.go:150-151) — reject.
            raise ParseError("pseudo-elements are not matchable")
        name = sc.ident()
        if name not in PSEUDOS:
            raise ParseError(f"unsupported pseudo-class :{name}")
        return SeqPart(PartKind.PSEUDO, name)
    if c == "[":
        sc.next()
        key = sc.ident()
        rest = sc.s[sc.i :]
        for tok, op in _ATTR_OPS:
            if rest.startswith(tok):
                sc.i += len(tok)
                val = sc.ident()
                if sc.peek() != "]":
                    raise ParseError(f"unclosed attribute selector in {sc.s!r}")
                sc.next()
                return SeqPart(PartKind.ATTR, val, attr_key=key, attr_op=op)
        if sc.peek() != "]":
            raise ParseError(f"unclosed attribute selector in {sc.s!r}")
        sc.next()
        return SeqPart(PartKind.ATTR, "", attr_key=key, attr_op=AttrOp.PRESENCE)
    # tag analogue: tNNN
    ident = sc.ident()
    if not (ident.startswith("t") and ident[1:].isdigit()):
        raise ParseError(
            f"tag selector must be tNNN (token id); got {ident!r} in {sc.s!r}"
        )
    return SeqPart(PartKind.TAG, ident)


def _parse_sequence(sc: _Scanner) -> Sequence:
    parts = []
    while sc.peek() and sc.peek() not in " >+~,":
        parts.append(_parse_part(sc))
    if not parts:
        raise ParseError(f"empty selector sequence in {sc.s!r}")
    return Sequence(tuple(parts))


def parse_rule(spec: str) -> Chain:
    spec = spec.strip()
    if not spec:
        raise ParseError("empty rule spec")
    sc = _Scanner(spec)
    if sc.peek() in ">+~":
        raise ParseError("selector chains cannot start with a combinator")
    head = _parse_sequence(sc)
    links: list[Link] = []
    while sc.i < len(sc.s):
        saw_space = False
        while sc.peek() == " ":
            sc.next()
            saw_space = True
        c = sc.peek()
        if c == "":
            break
        if c == ",":
            raise ParseError("selector groups (',') are not supported")
        if c in ">+~":
            comb = {">": Combinator.CHILD, "+": Combinator.ADJACENT, "~": Combinator.SIBLING}[c]
            sc.next()
            while sc.peek() == " ":
                sc.next()
            if sc.peek() in ">+~" or sc.peek() == "":
                raise ParseError("double or trailing combinator")
            links.append(Link(comb, _parse_sequence(sc)))
        elif saw_space:
            links.append(Link(Combinator.DESCENDANT, _parse_sequence(sc)))
        else:  # pragma: no cover
            raise ParseError(f"unexpected character {c!r} in {spec!r}")
    return Chain(head, tuple(links))
