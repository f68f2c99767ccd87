"""F5 — window/session/backfill fixtures + the zero-leakage property test
(FIXTURES.md; north rule BASELINE.json:14)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.operators import window as W

BASE = dt.datetime(2026, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, event_time timestamp, n_tok int, value double"
    )


def _times(*offsets):
    return [BASE + dt.timedelta(seconds=o) for o in offsets]


@pytest.fixture(scope="module")
def tiny(spark):
    t = _times(0, 10, 30, 3630, 3645)
    rows = [
        ("a", t[0], 5, 1.0),
        ("a", t[1], 3, None),
        ("a", t[2], 7, 2.0),
        ("a", t[3], 2, None),
        ("a", t[4], 4, None),
        ("b", t[0], 10, 9.0),
    ]
    return _df(spark, rows)


def test_lag_lead(spark, tiny):
    out = W.lag_lead(tiny, ["n_tok"], [1])
    a = (
        out.filter("doc_id = 'a'")
        .orderBy("event_time")
        .select("n_tok_lag1", "n_tok_lead1")
        .collect()
    )
    assert [r.n_tok_lag1 for r in a] == [None, 5, 3, 7, 2]
    assert [r.n_tok_lead1 for r in a] == [3, 7, 2, 4, None]


def test_rolling_bounded_at_current(spark, tiny):
    out = W.rolling(tiny, "n_tok", 2, aggs=("sum",))
    a = out.filter("doc_id='a'").orderBy("event_time").select("n_tok_rsum2").collect()
    # trailing window of 3 rows incl current: [5],[5,3],[5,3,7],[3,7,2],[7,2,4]
    assert [r.n_tok_rsum2 for r in a] == [5, 8, 15, 12, 13]


def test_sessionize_gap_pattern(spark, tiny):
    # gaps: -,10,20,3600,15 -> sessions [0,0,0,1,1] (FIXTURES.md F5)
    out = W.sessionize(tiny, gap_seconds=1800)
    a = out.filter("doc_id='a'").orderBy("event_time").select("session_id").collect()
    assert [r.session_id for r in a] == [0, 0, 0, 1, 1]
    b = out.filter("doc_id='b'").select("session_id").collect()
    assert [r.session_id for r in b] == [0]  # partitions are independent


def test_sessionize_subsecond_gap_matches_oracle(spark):
    """Round-1 latent bug: gaps in (1800s, 1801s) were lost to second-
    truncated casts. A 1800.5s gap MUST start a new session (µs semantics),
    and a 1799.5s gap must not — verified against DuckDB epoch_us."""
    import duckdb

    t = _times(0, 1800.5, 1800.5 + 1799.5, 1800.5 + 1799.5 + 1800.000001)
    rows = [("a", ts, 1, None) for ts in t]
    df = _df(spark, rows)
    out = (
        W.sessionize(df, gap_seconds=1800)
        .orderBy("event_time")
        .select("session_id")
        .collect()
    )
    assert [r.session_id for r in out] == [0, 1, 1, 2]

    pdf = df.select("doc_id", "event_time").toPandas()
    oracle = duckdb.sql(
        """
        SELECT SUM(is_new) OVER (ORDER BY event_time
                                 ROWS UNBOUNDED PRECEDING) - 1 AS sid
        FROM (
            SELECT event_time,
                   CASE WHEN epoch_us(event_time) - lag(epoch_us(event_time))
                            OVER (ORDER BY event_time) > 1800 * 1000000
                          OR lag(event_time) OVER (ORDER BY event_time) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM pdf
        ) ORDER BY event_time
        """
    ).fetchall()
    assert [int(r[0]) for r in oracle] == [r.session_id for r in out]


def test_time_rolling_count_microsecond_boundary(spark):
    """An event exactly 3600.000001s earlier is OUTSIDE the trailing hour;
    3599.999999s is inside — exact-µs range window, no second bucketing."""
    t = _times(0, 3599.999999, 3600.000001 + 3599.999999)
    df = _df(spark, [("a", ts, 1, None) for ts in t])
    out = (
        W.time_rolling_count(df, seconds=3600)
        .orderBy("event_time")
        .select("cnt_3600s")
        .collect()
    )
    assert [r.cnt_3600s for r in out] == [1, 2, 1]


def test_forward_fill(spark, tiny):
    out = W.forward_fill(tiny, ["value"])
    a = out.filter("doc_id='a'").orderBy("event_time").select("value_ffill").collect()
    assert [r.value_ffill for r in a] == [1.0, 1.0, 2.0, 2.0, 2.0]


def test_time_rolling_count(spark, tiny):
    out = W.time_rolling_count(tiny, seconds=60)
    a = out.filter("doc_id='a'").orderBy("event_time").select("cnt_60s").collect()
    # events at 0,10,30 within 60s of each other; 3630,3645 form their own window
    assert [r.cnt_60s for r in a] == [1, 2, 3, 1, 2]


def test_rank_features(spark, tiny):
    out = W.rank_features(tiny)
    a = out.filter("doc_id='a'").orderBy("event_time").collect()
    assert [r.event_seq for r in a] == [1, 2, 3, 4, 5]
    assert [r.is_first_event for r in a] == [1, 0, 0, 0, 0]


def test_zero_temporal_leakage(spark, tiny):
    """THE leakage property (north rule): perturb every row after time T;
    features at rows <= T must be bit-identical."""
    cutoff = BASE + dt.timedelta(seconds=30)

    def features(df):
        out = W.add_features(df, gap_seconds=1800, rolling_k=3)
        # lead/lag1 of value is in add_features? value_lag1 yes (backward).
        return {
            (r.doc_id, r.event_time): (
                r.n_tok_lag1,
                r.value_lag1,
                r.n_tok_rsum3,
                r.n_tok_rmean3,
                r.session_id,
                r.value_ffill,
                r.event_seq,
            )
            for r in out.collect()
            if r.event_time <= cutoff
        }

    base_feats = features(tiny)

    perturbed = tiny.withColumn(
        "n_tok",
        F.when(F.col("event_time") > F.lit(cutoff), F.col("n_tok") * 100).otherwise(
            F.col("n_tok")
        ),
    ).withColumn(
        "value",
        F.when(F.col("event_time") > F.lit(cutoff), F.lit(777.0)).otherwise(
            F.col("value")
        ),
    )
    assert features(perturbed) == base_feats


def test_single_shuffle_plan(spark, tiny):
    """All bundled window features must share ONE exchange + ONE sort —
    the scale-critical property (SURVEY §4)."""
    plan = W.add_features(tiny)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.lower().count("sort ") <= 2, plan


def test_resample_ffill_matches_duckdb(spark):
    """Regular-grid resample+ffill vs an independent DuckDB formulation
    (generate_series grid + correlated as-of pick), including duplicate
    timestamps (max wins), gaps spanning many ticks, and single-point
    entities."""
    import datetime as dt

    import duckdb

    from go_html_transform_spark.operators.window import resample_ffill

    BASE = dt.datetime(2026, 1, 1)
    rows = [
        ("d0", BASE, 1.0),
        ("d0", BASE + dt.timedelta(seconds=90), 2.0),
        ("d0", BASE + dt.timedelta(seconds=90), 5.0),   # dup t: max wins
        ("d0", BASE + dt.timedelta(seconds=1000), 3.0),  # long gap
        ("d1", BASE + dt.timedelta(seconds=30), 7.0),    # single point
    ]
    df = spark.createDataFrame(rows, "doc_id string, event_time timestamp, v double")
    got = sorted(
        (r.doc_id, r.tick_us, r.v)
        for r in resample_ffill(df, ["v"], step_seconds=60).collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE obs (doc_id VARCHAR, t_us BIGINT, v DOUBLE)")
    con.executemany(
        "INSERT INTO obs VALUES (?, ?, ?)",
        [(d, int(t.timestamp() * 1_000_000), v) for d, t, v in rows],
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            WITH span AS (
              SELECT doc_id, MIN(t_us) t0, MAX(t_us) t1 FROM obs GROUP BY 1
            ),
            grid AS (
              SELECT doc_id, unnest(generate_series(t0, t1, 60000000)) AS tick_us
              FROM span
            )
            SELECT g.doc_id, g.tick_us,
                   (SELECT MAX(o.v) FROM obs o
                    WHERE o.doc_id = g.doc_id AND o.t_us = (
                        SELECT MAX(t_us) FROM obs oo
                        WHERE oo.doc_id = g.doc_id AND oo.t_us <= g.tick_us)) AS v
            FROM grid g ORDER BY 1, 2
            """
        ).fetchall()
    )
    assert got == want
    # leak-free: first tick of d0 sees only the first observation
    assert got[0] == ("d0", int(BASE.timestamp() * 1_000_000), 1.0)


def test_decayed_bucket_counts_known_values(spark):
    """decayed_fp = sum_{d=1..4} count(bucket-d) * 2^(4-d) over 1800s
    buckets — hand-computed on a planted timeline, incl. a µs fraction."""
    t = [
        ("a", BASE + dt.timedelta(seconds=0), 1, 1.0),          # bucket B
        ("a", BASE + dt.timedelta(seconds=10), 1, 1.0),         # bucket B
        ("a", BASE + dt.timedelta(seconds=1800), 1, 1.0),       # B+1
        ("a", BASE + dt.timedelta(seconds=3600, microseconds=5), 1, 1.0),  # B+2
        ("a", BASE + dt.timedelta(seconds=9000), 1, 1.0),       # B+5
        ("b", BASE + dt.timedelta(seconds=0), 1, 1.0),          # isolated
    ]
    df = _df(spark, t)
    out = W.decayed_bucket_counts(df, bucket_seconds=1800, horizon=4)
    got = {
        (r.doc_id, r.event_time): r.decayed_1800s_fp for r in out.collect()
    }
    # bucket B rows: no prior buckets -> 0
    assert got[("a", t[0][1])] == 0
    assert got[("a", t[1][1])] == 0
    # B+1: d=1 sees 2 events -> 2*8 = 16
    assert got[("a", t[2][1])] == 16
    # B+2: d=1 sees 1 (B+1) -> 8; d=2 sees 2 (B) -> 2*4=8 -> 16
    assert got[("a", t[3][1])] == 16
    # B+5: d=3 sees B+2 (1 -> 2), d=4 sees B+1 (1 -> 1) -> 3
    assert got[("a", t[4][1])] == 3
    assert got[("b", t[5][1])] == 0


def test_decayed_bucket_counts_leak_free(spark):
    """Events later in the SAME bucket (and any future bucket) must not
    change a row's decayed feature — the strictly-prior-buckets contract."""
    base_rows = [
        ("a", BASE + dt.timedelta(seconds=0), 1, 1.0),
        ("a", BASE + dt.timedelta(seconds=1800), 1, 1.0),
    ]
    extra = [
        ("a", BASE + dt.timedelta(seconds=1900), 1, 1.0),  # same bucket, later
        ("a", BASE + dt.timedelta(seconds=7200), 1, 1.0),  # future bucket
    ]
    f0 = {
        (r.doc_id, r.event_time): r.decayed_1800s_fp
        for r in W.decayed_bucket_counts(_df(spark, base_rows)).collect()
    }
    f1 = {
        (r.doc_id, r.event_time): r.decayed_1800s_fp
        for r in W.decayed_bucket_counts(_df(spark, base_rows + extra)).collect()
        if (r.doc_id, r.event_time) in f0
    }
    assert f0 == f1


def test_decayed_bucket_counts_matches_duckdb(spark):
    """Cross-engine parity of the RANGE [-d,-d] frame composition on a
    randomized timeline with µs fractions."""
    import random

    import duckdb

    rng = random.Random(9)
    rows = [
        (
            f"e{rng.randrange(3)}",
            BASE + dt.timedelta(seconds=rng.randrange(0, 20000),
                                microseconds=rng.randrange(0, 1000000)),
            1,
            1.0,
        )
        for _ in range(200)
    ]
    df = _df(spark, rows)
    eng = {
        (r.doc_id, r.event_time): r.decayed_1800s_fp
        for r in W.decayed_bucket_counts(df).collect()
    }
    duck = duckdb.connect()
    duck.execute(
        "CREATE TABLE ev (doc_id VARCHAR, event_time TIMESTAMP)"
    )
    duck.executemany("INSERT INTO ev VALUES (?, ?)", [(r[0], r[1]) for r in rows])
    sql = W.decayed_bucket_counts_sql()
    ora = duck.sql(
        f"""
        SELECT doc_id, event_time, {sql} AS fp FROM (
          SELECT doc_id, event_time,
                 CAST(epoch_us(event_time) AS BIGINT) // 1800000000 AS __bkt
          FROM ev)
        """
    ).fetchall()
    assert len(ora) == len(eng)
    for doc_id, event_time, fp in ora:
        assert eng[(doc_id, event_time)] == fp, (doc_id, event_time)


def test_decayed_bucket_counts_plan(spark, tiny):
    """One exchange, one sort: the horizon RANGE frames share a single
    Window node (same partition/order) — no self-join, no extra shuffle."""
    plan = (
        W.decayed_bucket_counts(tiny)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_ewma_matches_pandas_and_leak_free(spark):
    """applyInPandas EWMA: (1) equals a pure-pandas groupby reference,
    (2) NULL for each entity's first row, (3) zero temporal leakage
    (future perturbation invariance), (4) plan = one exchange + Arrow
    (FlatMapGroupsInPandas), no row-at-a-time Python."""
    import math
    import random

    import pandas as pd

    rng = random.Random(3)
    rows = []
    for i in range(300):
        rows.append(
            (
                f"e{rng.randrange(5)}",
                BASE + dt.timedelta(seconds=rng.randrange(100000),
                                    microseconds=rng.randrange(1000000)),
                rng.randrange(100),
                float(rng.randrange(10)),
            )
        )
    # deterministic event ids for the tie-break: derive from row content
    df = _df(spark, rows).withColumn(
        "event_id", F.xxhash64("doc_id", "event_time", "n_tok")
    )
    out = W.ewma(df, "n_tok", alpha=0.3)
    got = {
        (r.doc_id, r.event_time, r.event_id): r.n_tok_ewma
        for r in out.collect()
    }
    ref = pd.DataFrame(
        [(r.doc_id, r.event_time, r.n_tok, r.event_id) for r in df.collect()],
        columns=["doc_id", "event_time", "n_tok", "event_id"],
    )
    for ent, g in ref.groupby("doc_id"):
        g = g.sort_values(["event_time", "event_id"], kind="mergesort")
        exp = g["n_tok"].astype("float64").shift(1).ewm(
            alpha=0.3, adjust=True
        ).mean()
        for (_, row), e in zip(g.iterrows(), exp):
            k = (row.doc_id, row.event_time.to_pydatetime(), row.event_id)
            gv = got[k]
            if pd.isna(e):
                assert gv is None or math.isnan(gv), k
            else:
                assert gv is not None and abs(gv - e) < 1e-12, k
    # leak-freeness: multiply every value after a cutoff; earlier rows fixed
    cutoff = BASE + dt.timedelta(seconds=50000)
    pert = df.withColumn(
        "n_tok",
        F.when(F.col("event_time") > F.lit(cutoff), F.col("n_tok") * 100)
        .otherwise(F.col("n_tok")),
    )
    got2 = {
        (r.doc_id, r.event_time, r.event_id): r.n_tok_ewma
        for r in W.ewma(pert, "n_tok", alpha=0.3).collect()
        if r.event_time <= cutoff
    }
    for k, v in got2.items():
        b = got[k]
        assert (v is None and b is None) or abs(v - b) < 1e-12, k
    plan = out._jdf.queryExecution().executedPlan().toString()
    # after collect() AQE prints final + initial plans; count the final only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final
    assert "FlatMapGroupsInPandas" in final, final
