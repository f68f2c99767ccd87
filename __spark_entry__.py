"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: go_html_transform_spark (see SURVEY.md §2 for the operator
inventory each query exercises).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_html_transform_spark.operators import transforms as X
from go_html_transform_spark.plans.pipeline import Transformer
from go_html_transform_spark.sources import tables as S

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full north-rule pipeline at sf0.001 —
    scan -> selector-rule transform -> as-of join -> windowed features ->
    per-source summary (SURVEY.md §3.1 lifecycle, engine-side)."""
    from go_html_transform_spark.operators.asof import asof_join
    from go_html_transform_spark.operators.window import add_features

    seq = S.sequences(spark, SF0001)
    lab = S.labels(spark, SF0001)
    # rule: sequences containing the hot token 982 get a sentinel appended
    # (AppendChildren analogue, transform.go:157-167)
    tr = Transformer(seq).apply("t982", lambda t, p: X.append_children(t, [1023]))
    feats = add_features(
        asof_join(
            tr.df.select(
                "doc_id", "event_time", "event_id", "tokens", "n_tok", "source", "value"
            ),
            lab,
            direction="backward",
        )
    )
    return (
        feats.groupBy("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_tok").alias("sum_n_tok"),
            F.sum(F.element_at("tokens", -1).cast("bigint")).alias("sum_last_tok"),
            F.round(F.avg("label_value"), 4).alias("avg_label"),
            F.round(F.avg("n_tok_rmean3"), 4).alias("avg_rolling_ntok"),
            F.max("session_id").alias("max_session"),
        )
        .orderBy("source")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from go_html_transform_spark.plans import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from go_html_transform_spark.plans import registry

    return registry.oracle_sql()
