"""Repetition-filter kernels (functions/repetition.py): brute-force
parity on dirty corpora for BOTH engines, the NULL-array contract, and
the zero-exchange plan shape."""

from __future__ import annotations

import random
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.functions import repetition as R

SEED = 77


def _brute(tokens, n):
    if tokens is None:
        return (0, 0)
    t = [x & R.PACK_MASK for x in tokens if x is not None]
    grams = [tuple(t[i : i + n]) for i in range(len(t) - n + 1)]
    m = len(grams)
    if m == 0:
        return (0, 0)
    c = Counter(grams)
    dup = sum(v for v in c.values() if v >= 2)
    return (dup * R.PPM // m, max(c.values()) * R.PPM // m)


def _corpus():
    rng = random.Random(SEED)
    rows = []
    for i in range(150):
        ln = rng.choice([0, 1, 2, 3, 5, 8, 20, 60])
        if rng.random() < 0.7:  # small vocab -> forced repeats
            arr = [rng.choice([1, 2, 3, None]) for _ in range(ln)]
        else:  # big ids exercise the 20-bit mask
            arr = [rng.randrange(0, 1 << 21) for _ in range(ln)]
        rows.append((i, arr))
    rows += [(150, []), (151, [7]), (152, [7, 7, 7, 7]), (153, [1, None, 3]),
             (154, None)]
    return rows


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


@pytest.mark.parametrize("n", [1, 2, 3])
def test_spark_matches_brute_force(spark, corpus, n):
    df = spark.createDataFrame(corpus, "id long, tokens array<int>")
    out = R.with_repetition(df, "tokens", n)
    got = {r["id"]: (r[f"rep{n}_dup_ppm"], r[f"rep{n}_top_ppm"])
           for r in out.collect()}
    for i, arr in corpus:
        assert got[i] == _brute(arr, n), (i, arr)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_duckdb_twin_matches_brute_force(corpus, n):
    duck = duckdb.connect()
    duck.execute("CREATE TABLE c (id BIGINT, tokens INTEGER[])")
    duck.executemany("INSERT INTO c VALUES (?, ?)", corpus)
    dup_sql, top_sql = R.repetition_sql("tokens", n)
    res = duck.sql(
        f"SELECT id, {dup_sql} AS d, {top_sql} AS t FROM c ORDER BY id"
    ).fetchall()
    for (i, arr), (_, d, t) in zip(corpus, res):
        assert (d, t) == _brute(arr, n), (i, arr)


def test_known_values(spark):
    # [1,1,1,1]: bigrams [(1,1)]x3 -> dup=3/3, top=3/3
    # [1,2,1,2,3]: bigrams (1,2),(2,1),(1,2),(2,3) -> dup 2/4, top 2/4
    rows = [(0, [1, 1, 1, 1]), (1, [1, 2, 1, 2, 3])]
    df = spark.createDataFrame(rows, "id long, tokens array<int>")
    got = {r["id"]: (r["rep2_dup_ppm"], r["rep2_top_ppm"])
           for r in R.with_repetition(df, "tokens", 2).collect()}
    assert got[0] == (1_000_000, 1_000_000)
    assert got[1] == (500_000, 500_000)


def test_zero_exchange_plan(spark, corpus):
    """The repetition columns are row-local: adding them to a scan must
    not introduce any Exchange (the 10^12-doc contract — a pure map)."""
    df = spark.createDataFrame(corpus, "id long, tokens array<int>")
    out = R.with_repetition(R.with_repetition(df, "tokens", 2), "tokens", 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_arrow_kernel_matches_expression_twin(spark, corpus):
    """repetition_arrow (production fast path) per-row equals the
    expression twin on the dirty corpus — incl. NULL arrays/elements."""
    from go_html_transform_spark.functions import kernels as K

    df = spark.createDataFrame(corpus, "id long, tokens array<int>")
    expr = R.with_repetition(R.with_repetition(df, "tokens", 2), "tokens", 3)
    arrow = df.select("id", K.repetition_arrow(F.col("tokens")).alias("s"))
    a = {r["id"]: (r["rep2_dup_ppm"], r["rep2_top_ppm"],
                   r["rep3_dup_ppm"], r["rep3_top_ppm"])
         for r in expr.collect()}
    b = {r["id"]: (r["s"]["rep2_dup_ppm"], r["s"]["rep2_top_ppm"],
                   r["s"]["rep3_dup_ppm"], r["s"]["rep3_top_ppm"])
         for r in arrow.collect()}
    assert a == b
