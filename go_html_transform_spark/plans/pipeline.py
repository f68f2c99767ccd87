"""Pipeline executor: the Transformer (reference: html/transform/transform.go).

``Transformer`` wraps a DataFrame; ``apply(spec, fn)`` parses the rule,
computes the match set and rewrites ``tokens`` on matched rows —
``Transformer.Apply`` (/root/reference/html/transform/transform.go:91-97),
minus the reference's run-even-on-parse-error quirk (we validate first).

``Transform``/``apply_all`` mirror the precompiled-rule path
(transform.go:118-155): compile once, fold over the DataFrame in order.
Catalyst's CollapseProject fuses the chained projections, giving the
single-pass evaluation the reference leaves as a TODO (transform.go:114).

``apply_to_first_match`` mirrors ``ApplyToFirstMatch``/``FirstMatch``
(transform.go:30-39,99-110) as a single-pass per-row coalesce cascade —
no driver-side branching, no repeated scans.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_html_transform_spark.plans.parser import parse_rule
from go_html_transform_spark.plans.rules import Chain, CompiledRule, compile_chain

# A transform takes (tokens Column, match-positions Column) -> new tokens.
TransformFn = Callable[[Column, Column], Column]


@dataclass
class Transform:
    """Precompiled (rule, fn) pair — ``Trans``/``MustTrans``
    (transform.go:128-147). ``specificity`` doubles as priority."""

    chain: Chain
    fn: TransformFn

    @classmethod
    def parse(cls, spec: str, fn: TransformFn) -> "Transform":
        return cls(parse_rule(spec), fn)

    @property
    def specificity(self) -> int:
        return self.chain.specificity


class Transformer:
    """Immutable pipeline context over the sequence DataFrame.

    The reference deep-clones the document before transforming
    (transform.go:57-62); DataFrames are immutable so every method returns a
    new Transformer over a new plan.
    """

    def __init__(
        self,
        df: DataFrame,
        tokens_col: str = "tokens",
        doc_id_col: str = "doc_id",
        source_col: str = "source",
        attrs_col: str | None = None,
    ):
        self.df = df
        self.tokens_col = tokens_col
        self.doc_id_col = doc_id_col
        self.source_col = source_col
        self.attrs_col = attrs_col if (attrs_col and attrs_col in df.columns) else None

    def _compile(self, chain: Chain) -> CompiledRule:
        return compile_chain(
            chain,
            tokens=self.tokens_col,
            doc_id=self.doc_id_col,
            source=self.source_col,
            attrs=self.attrs_col,
        )

    def clone(self) -> "Transformer":
        """Transformer.Clone (transform.go:81-83) — a no-op snapshot."""
        return Transformer(
            self.df, self.tokens_col, self.doc_id_col, self.source_col, self.attrs_col
        )

    def apply(self, rule: str | Chain | Transform, fn: TransformFn | None = None) -> "Transformer":
        """Apply ``fn`` to ``tokens`` on rows matched by ``rule``; other rows
        pass through untouched (the unmatched parts of the tree are never
        visited by applyFuncToCollector, transform.go:85-89)."""
        if isinstance(rule, Transform):
            chain, fn = rule.chain, rule.fn
        else:
            chain = parse_rule(rule) if isinstance(rule, str) else rule
            if fn is None:
                raise ValueError("apply() needs a transform fn")
        compiled = self._compile(chain)
        t = F.col(self.tokens_col)
        new_tokens = F.when(compiled.row_matched, fn(t, compiled.positions)).otherwise(t)
        out = self.df.withColumn(self.tokens_col, new_tokens.cast("array<int>"))
        if "n_tok" in out.columns:
            out = out.withColumn("n_tok", F.size(F.col(self.tokens_col)).cast("int"))
        return Transformer(out, self.tokens_col, self.doc_id_col, self.source_col, self.attrs_col)

    def apply_all(self, *transforms: Transform, by_priority: bool = False) -> "Transformer":
        """ApplyAll (transform.go:149-155): ordered fold of compiled rules.
        ``by_priority=True`` orders by specificity (descending) — the
        reference computes specificity but never uses it (data.go:180-191);
        the engine promotes it to rule priority."""
        ts = list(transforms)
        if by_priority:
            ts.sort(key=lambda t: -t.specificity)
        cur = self
        for t in ts:
            cur = cur.apply(t)
        return cur

    def apply_to_first_match(self, fn: TransformFn, *specs: str) -> "Transformer":
        """ApplyToFirstMatch (transform.go:99-110): per row, use the first
        rule with a non-empty match set — a coalesce cascade evaluated in one
        projection, not N passes."""
        compiled = [self._compile(parse_rule(s)) for s in specs]
        t = F.col(self.tokens_col)
        new_tokens = t
        # build from the last alternative backwards so the first match wins
        for c in reversed(compiled):
            new_tokens = F.when(c.row_matched, fn(t, c.positions)).otherwise(new_tokens)
        out = self.df.withColumn(self.tokens_col, new_tokens.cast("array<int>"))
        if "n_tok" in out.columns:
            out = out.withColumn("n_tok", F.size(F.col(self.tokens_col)).cast("int"))
        return Transformer(out, self.tokens_col, self.doc_id_col, self.source_col, self.attrs_col)

    def matched(self, rule: str | Chain) -> DataFrame:
        """Match-set producer (CollectorFunc analogue, transform.go:17-28):
        rows + their match positions."""
        chain = parse_rule(rule) if isinstance(rule, str) else rule
        c = self._compile(chain)
        return self.df.withColumn("match_pos", c.positions).filter(c.row_matched)

    def fan_out(self, rule: str | Chain, *fns: TransformFn) -> "Transformer":
        """CopyAnd (transform.go:235-248): matched rows explode into one row
        per transform variant; unmatched rows pass through unchanged."""
        chain = parse_rule(rule) if isinstance(rule, str) else rule
        c = self._compile(chain)
        t = F.col(self.tokens_col)
        variants = F.array(*[fn(t, c.positions).cast("array<int>") for fn in fns])
        exploded = F.explode(
            F.when(c.row_matched, variants).otherwise(F.array(t))
        )
        out = self.df.withColumn(self.tokens_col, exploded)
        if "n_tok" in out.columns:
            out = out.withColumn("n_tok", F.size(F.col(self.tokens_col)).cast("int"))
        return Transformer(out, self.tokens_col, self.doc_id_col, self.source_col, self.attrs_col)
