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
    """Flagship: sequences scan -> selector-rule transform -> match stats.

    Mirrors the reference's flagship lifecycle (SURVEY.md §3.1):
    parse rule -> find matches -> transform matched rows -> aggregate.
    """
    seq = S.sequences(spark, SF0001)
    tr = Transformer(seq)
    # rule: sequences containing the hot token 982 get a sentinel appended
    # (AppendChildren analogue, transform.go:157-167)
    tr = tr.apply("t982", lambda t, p: X.append_children(t, [1023]))
    return (
        tr.df.groupBy("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_tok").alias("sum_n_tok"),
            F.sum(F.element_at("tokens", -1).cast("bigint")).alias("sum_last_tok"),
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
