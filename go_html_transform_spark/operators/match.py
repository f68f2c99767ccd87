"""Exploded (row-per-position) chain matching — the join/window
formulation of the selector engine.

The array-native compiler (plans/rules.py) is the default: zero shuffle,
whole-stage codegen. This module is the same semantics expressed over an
EXPLODED view (one row per (row_id, pos, token)) with each combinator as
the join/window Spark primitive SURVEY.md §2.5 maps it to:

| combinator | exploded implementation |
|---|---|
| descendant  | min-position broadcast + range predicate (theta-join shape) |
| child ``>`` | equi-join on (row_id, pos-1) — hash join |
| adjacent ``+`` | lag/lead over (row_id, pos) window — both directions |
| sibling ``~`` | count-over-partition window |

When to use which: the array-native path wins while a row's token array
fits comfortably in one task (every realistic training sequence). The
exploded path is for degenerate giants (multi-million-token rows) where
per-row kernels would monopolize a task — positions become rows and the
usual shuffle machinery (AQE, salting) takes over. Tests assert both
paths produce identical match sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_html_transform_spark.plans.parser import parse_rule
from go_html_transform_spark.plans.rules import Chain, Combinator, PartKind


def explode_positions(df: DataFrame, row_id: str = "event_id") -> DataFrame:
    """WalkNodes as rows (h5/node.go:65-73): one row per (row_id, pos, tok)."""
    return df.select(
        F.col(row_id).alias("__rid"), F.posexplode("tokens").alias("pos", "tok")
    )


def _seq_filter(exploded: DataFrame, seq, n_by_row: DataFrame) -> DataFrame:
    """Token-level predicates of one sequence over the exploded view.
    Row-level parts (id/class/attr) are the caller's job — this module
    covers the positional algebra."""
    out = exploded
    for part in seq.parts:
        if part.kind == PartKind.TAG:
            out = out.filter(F.col("tok") == int(part.value[1:]))
        elif part.kind == PartKind.PSEUDO:
            if part.value in ("first-child", "root"):
                out = out.filter(F.col("pos") == 0)
            elif part.value == "last-child":
                out = out.join(n_by_row, "__rid").filter(
                    F.col("pos") == F.col("__n") - 1
                ).drop("__n")
            elif part.value == "only-child":
                out = out.join(n_by_row, "__rid").filter(F.col("__n") == 1).drop("__n")
    return out


def match_chain_exploded(
    df: DataFrame, rule: str | Chain, row_id: str = "event_id", ordered: bool = False
) -> DataFrame:
    """Match positions for a chain over the exploded view. Returns
    (row_id, pos), deduped. Semantics identical to
    plans/rules.compile_chain (asserted by tests).

    ``ordered=False`` (default): no global sort — this is the giant-row
    fallback path, and a full orderBy at 10^12 match rows would add a
    range-partitioned exchange that no consumer needs (downstream joins
    and aggs are order-insensitive; the array-native primary path gets
    document order for free inside each row). Pass ``ordered=True`` only
    for small, user-facing result sets."""
    chain = parse_rule(rule) if isinstance(rule, str) else rule
    ex = explode_positions(df, row_id).cache()
    n_by_row = ex.groupBy("__rid").agg(F.count("*").alias("__n"))

    cur = _seq_filter(ex, chain.head, n_by_row).select("__rid", "pos")
    for link in chain.links:
        cand = _seq_filter(ex, link.seq, n_by_row).select(
            "__rid", F.col("pos").alias("__q")
        )
        if link.combinator == Combinator.DESCENDANT:
            # q strictly after some p  <=>  q > min(P) per row — aggregate
            # then equi-join (cheap: one row per matched row_id)
            mins = cur.groupBy("__rid").agg(F.min("pos").alias("__minp"))
            cur = (
                cand.join(mins, "__rid")
                .filter(F.col("__q") > F.col("__minp"))
                .select("__rid", F.col("__q").alias("pos"))
            )
        elif link.combinator == Combinator.CHILD:
            # equi-join on (row, pos-1) — the hash-join mapping
            prev = cur.select("__rid", (F.col("pos") + 1).alias("__q"))
            cur = (
                cand.join(prev, ["__rid", "__q"], "leftsemi")
                .select("__rid", F.col("__q").alias("pos"))
            )
        elif link.combinator == Combinator.ADJACENT:
            # both directions (reference quirk data.go:292-299): semi-join
            # against P shifted +1 and -1
            up = cur.select("__rid", (F.col("pos") + 1).alias("__q"))
            down = cur.select("__rid", (F.col("pos") - 1).alias("__q"))
            cur = (
                cand.join(up.unionByName(down).distinct(), ["__rid", "__q"], "leftsemi")
                .select("__rid", F.col("__q").alias("pos"))
            )
        elif link.combinator == Combinator.SIBLING:
            # any other position in P: |P| per row, minus self-membership
            stats = cur.groupBy("__rid").agg(
                F.count("*").alias("__np"), F.collect_set("pos").alias("__ps")
            )
            cur = (
                cand.join(stats, "__rid")
                .filter(
                    (F.col("__np") > 1)
                    | (
                        (F.col("__np") == 1)
                        & ~F.array_contains(F.col("__ps"), F.col("__q"))
                    )
                )
                .select("__rid", F.col("__q").alias("pos"))
            )
    out = cur.distinct()
    if ordered:
        out = out.orderBy("__rid", "pos")
    out = out.withColumnRenamed("__rid", row_id)
    ex.unpersist()
    return out


def adjacent_via_window(df: DataFrame, tok_a: int, tok_b: int, row_id: str = "event_id") -> DataFrame:
    """The lag/lead-window formulation of `tA + tB` (SURVEY §2.5): match
    positions of tok_b whose previous OR next token is tok_a."""
    ex = explode_positions(df, row_id)
    w = Window.partitionBy("__rid").orderBy("pos")
    out = ex.withColumn("__prev", F.lag("tok").over(w)).withColumn(
        "__next", F.lead("tok").over(w)
    )
    return (
        out.filter(
            (F.col("tok") == tok_b)
            & ((F.col("__prev") == tok_a) | (F.col("__next") == tok_a))
        )
        .select(F.col("__rid").alias(row_id), "pos")
        .orderBy(row_id, "pos")
    )
