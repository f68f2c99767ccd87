"""Point-in-time windowed feature layer (north rule: lag/lead, rolling
counts over n_tok, gap-based sessionization, forward-fill backfill).

Reference precedent (SURVEY.md §2.7): the sibling combinators ARE window
logic — AdjacentSibling's both-direction probe
(/root/reference/css/selector/data.go:292-299) is lag/lead; the sibling
full-scan (data.go:300-311) is the unbounded partition window; FirstMatch
fallback (html/transform/transform.go:30-39) is forward-fill.

ZERO-LEAKAGE INVARIANT: every feature here derives only from windows bounded
at the current row (``rowsBetween(-k, 0)`` / ``unboundedPreceding..0``) —
no feature ever reads an event after its own timestamp. The property test
(tests/test_window.py) perturbs future rows and asserts invariance.

Scale notes: all of these are single-shuffle operators — one exchange on
``partition_by`` (doc_id), then every window reuses the same sort order.
Catalyst collapses adjacent Window nodes that share (partitionBy, orderBy),
so ``add_features`` costs ONE shuffle + ONE sort at any scale. Hot entities
(a doc_id with millions of events) serialize within one task — for those,
pre-split by time-bucket upstream (operators/skew.py) or rely on AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql import types as T


def entity_window(
    partition_by: str | list[str] = "doc_id",
    order_by: str | list[str] = "event_time",
) -> WindowSpec:
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    return Window.partitionBy(*parts).orderBy(*order)


def lag_lead(
    df: DataFrame,
    cols: list[str],
    offsets: list[int] = (1,),
    w: WindowSpec | None = None,
) -> DataFrame:
    """lag(col,k)/lead(col,k) features. lead() reads the future — it is a
    LABEL-side feature; the leakage test covers only lag_* outputs."""
    w = w or entity_window()
    out = df
    for c in cols:
        for k in offsets:
            out = out.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
            out = out.withColumn(f"{c}_lead{k}", F.lead(c, k).over(w))
    return out


def rolling(
    df: DataFrame,
    col: str,
    k: int,
    aggs: tuple[str, ...] = ("sum", "mean", "count"),
    w: WindowSpec | None = None,
) -> DataFrame:
    """Rolling aggregates over the trailing k+1 rows INCLUDING current —
    bounded at the current row (rowsBetween(-k, 0)): leak-free."""
    w = (w or entity_window()).rowsBetween(-k, 0)
    out = df
    c = F.col(col)
    if "sum" in aggs:
        out = out.withColumn(f"{col}_rsum{k}", F.sum(c).over(w))
    if "mean" in aggs:
        out = out.withColumn(f"{col}_rmean{k}", F.avg(c).over(w))
    if "count" in aggs:
        out = out.withColumn(f"{col}_rcnt{k}", F.count(c).over(w))
    if "min" in aggs:
        out = out.withColumn(f"{col}_rmin{k}", F.min(c).over(w))
    if "max" in aggs:
        out = out.withColumn(f"{col}_rmax{k}", F.max(c).over(w))
    return out


def time_rolling_count(
    df: DataFrame,
    seconds: int,
    time_col: str = "event_time",
    partition_by: str = "doc_id",
    out_col: str | None = None,
) -> DataFrame:
    """Count of events in the trailing ``seconds`` window (rangeBetween on
    epoch seconds) — time-based rolling, still bounded at current row."""
    out_col = out_col or f"cnt_{seconds}s"
    # Exact-µs trailing window: second-truncated casts diverge from the
    # µs-precision oracle for events landing inside the same wall-second
    # (round-1 latent bug). unix_micros needs a tz-aware timestamp; the
    # session tz is UTC so the NTZ->TZ cast is exact.
    us = F.unix_micros(F.col(time_col).cast("timestamp"))
    w = (
        Window.partitionBy(partition_by)
        .orderBy(us)
        .rangeBetween(-seconds * 1_000_000, 0)
    )
    return df.withColumn(out_col, F.count(F.lit(1)).over(w))


def decayed_bucket_counts(
    df: DataFrame,
    bucket_seconds: int = 1800,
    horizon: int = 4,
    time_col: str = "event_time",
    partition_by: str = "doc_id",
    out_col: str | None = None,
) -> DataFrame:
    """Exponentially time-decayed event count — the classic point-in-time
    counter feature (decay 1/2 per ``bucket_seconds`` bucket, horizon
    ``horizon`` buckets), as an EXACT fixed-point int64 scaled by
    2^(horizon-1):

        decayed_fp = sum_{d=1..horizon} count(bucket - d) * 2^(horizon-d)

    i.e. the previous bucket at full weight, each older bucket halved.
    Powers of two keep the arithmetic exact in BOTH engines — no exp(),
    no float, no cross-engine libm divergence (the quality_score_ppm
    lesson applied to decay curves).

    ZERO-LEAKAGE by construction: only STRICTLY-EARLIER buckets
    contribute (d >= 1); events inside the current bucket — including the
    row itself — never feed their own feature, so the feature is "as of
    the start of the current bucket" and stable under late arrivals
    within the bucket.

    Plan shape: one exchange on ``partition_by`` + ONE sort on the bucket
    id; the ``horizon`` RANGE frames ``[-d, -d]`` (exact single-bucket
    lookbacks — count over an absent bucket is 0, not NULL) all share
    that sort, and Catalyst collapses them into a single Window node.
    No self-join, no pre-aggregation pass, no Python.
    """
    out_col = out_col or f"decayed_{bucket_seconds}s_fp"
    us = F.unix_micros(F.col(time_col).cast("timestamp"))
    width = bucket_seconds * 1_000_000
    bkt = ((us - F.pmod(us, F.lit(width))) / F.lit(width)).cast("long")
    tmp = f"__bkt_{out_col}"
    out = df.withColumn(tmp, bkt)
    total = F.lit(0).cast("long")
    for d in range(1, horizon + 1):
        w = (
            Window.partitionBy(partition_by)
            .orderBy(F.col(tmp))
            .rangeBetween(-d, -d)
        )
        total = total + F.count(F.lit(1)).over(w) * F.lit(
            1 << (horizon - d)
        ).cast("long")
    return out.withColumn(out_col, total).drop(tmp)


def decayed_bucket_counts_sql(
    rel_time: str = "event_time",
    partition_by: str = "doc_id",
    bucket_seconds: int = 1800,
    horizon: int = 4,
) -> str:
    """DuckDB twin of :func:`decayed_bucket_counts` as a single SELECT
    expression over a relation exposing ``{partition_by}`` and a bucket
    column precomputed as ``__bkt`` (integer floor-division of epoch_us)."""
    width = bucket_seconds * 1_000_000
    terms = []
    for d in range(1, horizon + 1):
        terms.append(
            f"CAST(COUNT(*) OVER (PARTITION BY {partition_by} ORDER BY __bkt "
            f"RANGE BETWEEN {d} PRECEDING AND {d} PRECEDING) AS BIGINT)"
            f" * {1 << (horizon - d)}"
        )
    _ = width  # width is baked into __bkt by the caller's CTE
    return "(" + " + ".join(terms) + ")"


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    time_col: str = "event_time",
    partition_by: str = "doc_id",
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from the
    previous event exceeds ``gap_seconds``. Classic lag + running-sum —
    both windows bounded at the current row.

    No reference precedent (the reference has no time axis); the structural
    analogue is sibling adjacency chains (data.go:292-311)."""
    w = entity_window(partition_by, time_col)
    # Gap computed at µs precision: a true gap in (gap_seconds, gap_seconds+1)
    # must start a new session; second-truncated casts would miss it.
    us = F.unix_micros(F.col(time_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )


def ewma(
    df: DataFrame,
    value_col: str = "n_tok",
    alpha: float = 0.5,
    time_col: str = "event_time",
    partition_by: str = "doc_id",
    tiebreak_col: str = "event_id",
    out_col: str | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average of ``value_col`` per entity —
    the Arrow-backed pandas-UDF feature of the north-star bundle
    (``applyInPandas`` over sorted entity timelines; the recursion
    s_i = a*x_i + (1-a)*s_{i-1} has no bounded-window SQL form, so this
    is the documented place Python IS the right tool — one vectorized
    ``Series.ewm`` per entity batch, never per-row).

    ZERO-LEAKAGE: the input is shifted by one row before the ewm, so row
    i's feature aggregates values STRICTLY before i (ordered by
    (time, tiebreak) — the deterministic total order). The first row of
    each entity gets NULL (no history), matching lag/forward-fill
    semantics. pandas ``adjust=True`` form: the finite-history weights
    are renormalized, i.e. s = sum w_j x_j / sum w_j with w_j = (1-a)^j.

    Scale shape: ONE exchange on the entity key; each group is a single
    Arrow batch (hot entities bound the batch — pre-split giant entities
    upstream exactly as add_features documents)."""
    import pandas as pd

    out_col = out_col or f"{value_col}_ewma"
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([time_col, tiebreak_col], kind="mergesort")
        prior = pdf[value_col].astype("float64").shift(1)
        pdf[out_col] = prior.ewm(alpha=alpha, adjust=True, ignore_na=False).mean()
        return pdf

    return df.groupBy(partition_by).applyInPandas(fn, schema)


def ewma_recurrence_sql(
    value_col: str = "n_tok",
    time_col: str = "event_time",
    partition_by: str = "doc_id",
    tiebreak_col: str = "event_id",
    src: str = "seq",
) -> str:
    """DuckDB twin of ``ewma`` at alpha = 0.5: a recursive CTE that
    replays pandas' ``ewm(adjust=True, ignore_na=False)`` state machine
    step for step — old_wt halves (EXACT in binary floats), the update
    ``(old_wt*avg + cur) / (old_wt + 1)`` mirrors pandas' op order and
    its equal-value skip guard, so every intermediate double is
    bit-identical and the output hash-matches with NO rounding. Only
    alpha=0.5 is twinned (0.5 multiplies exactly; other alphas would
    re-open one rounding per step to cross-engine drift). Requires the
    caller's WITH to be RECURSIVE. Yields a relation
    (tiebreak_col, <value_col>_ewma)."""
    return f"""(
      WITH RECURSIVE eobs AS (
        SELECT {partition_by} AS pid, {tiebreak_col} AS tb,
               CAST({value_col} AS DOUBLE) AS x,
               ROW_NUMBER() OVER (PARTITION BY {partition_by}
                                  ORDER BY {time_col}, {tiebreak_col}) AS rn
        FROM {src}
      ),
      ew(pid, rn, avg, w) AS (
        SELECT pid, 1, CAST(NULL AS DOUBLE), 1.0 FROM eobs WHERE rn = 1
        UNION ALL
        SELECT ew.pid, ew.rn + 1,
               CASE WHEN ew.avg IS NULL THEN p.x
                    WHEN ew.avg = p.x THEN ew.avg
                    ELSE ((ew.w * 0.5) * ew.avg + p.x) / (ew.w * 0.5 + 1.0)
               END,
               CASE WHEN ew.avg IS NULL THEN 1.0
                    ELSE ew.w * 0.5 + 1.0 END
        FROM ew JOIN eobs p ON p.pid = ew.pid AND p.rn = ew.rn
      )
      SELECT e.tb AS {tiebreak_col}, ew.avg AS {value_col}_ewma
      FROM ew JOIN eobs e ON e.pid = ew.pid AND e.rn = ew.rn
    )"""


def forward_fill(
    df: DataFrame,
    cols: list[str],
    time_col: str = "event_time",
    partition_by: str = "doc_id",
    suffix: str = "_ffill",
) -> DataFrame:
    """Forward-fill backfill: last non-null value at or before the current
    row. The FirstMatch-fallback analogue (transform.go:30-39): take the
    first non-empty looking backwards."""
    w = entity_window(partition_by, time_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = df
    for c in cols:
        out = out.withColumn(c + suffix, F.last(c, ignorenulls=True).over(w))
    return out


def rank_features(
    df: DataFrame,
    time_col: str = "event_time",
    partition_by: str = "doc_id",
) -> DataFrame:
    """row_number / first-in-group flags — :first-child/:last-child
    analogues (data.go:138-141) on the temporal axis. ``is_first`` is
    leak-free; note ``n`` (total events) is NOT and is not produced here."""
    w = entity_window(partition_by, time_col)
    rn = F.row_number().over(w)
    return df.withColumn("event_seq", rn).withColumn(
        "is_first_event", (rn == 1).cast("int")
    )


def add_features(
    df: DataFrame,
    gap_seconds: int = 1800,
    rolling_k: int = 3,
) -> DataFrame:
    """The standard feature bundle used by bench + entry: one shuffle on
    doc_id, one sort on event_time, every window reuses it."""
    w = entity_window()
    us = F.unix_micros(F.col("event_time").cast("timestamp"))
    wcur = w.rowsBetween(Window.unboundedPreceding, 0)
    wk = w.rowsBetween(-rolling_k, 0)
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.select(
        "*",
        F.lag("n_tok", 1).over(w).alias("n_tok_lag1"),
        F.lag("value", 1).over(w).alias("value_lag1"),
        F.sum("n_tok").over(wk).alias(f"n_tok_rsum{rolling_k}"),
        F.avg("n_tok").over(wk).alias(f"n_tok_rmean{rolling_k}"),
        (F.sum(is_new).over(wcur) - 1).alias("session_id"),
        F.last("value", ignorenulls=True).over(wcur).alias("value_ffill"),
        F.row_number().over(w).alias("event_seq"),
    )


def resample_ffill(
    df: DataFrame,
    value_cols: list[str],
    step_seconds: int,
    time_col: str = "event_time",
    partition_by: str = "doc_id",
) -> DataFrame:
    """Regular-grid resample + forward-fill: one output row per entity per
    `step_seconds` tick from the entity's first observation to its last,
    carrying the latest value at-or-before each tick (half of the north
    rule's "forward-fill backfill"; the observed-row variant is
    forward_fill above).

    Plan shape: the per-entity tick grid is F.sequence over the µs span
    (pure Column arithmetic, fan-out = span/step — no driver loop, no
    cross join); the as-of pick joins ticks to observations with a single
    (entity)-partitioned window: union ticks+observations, last(value)
    ignorenulls over event-time order — the same one-exchange-one-sort
    union trick as operators/asof.py, so a grid at 10^12 scale shuffles
    once. Leak-free: a tick only sees observations with t_obs <= tick."""
    us = F.unix_micros(F.col(time_col).cast("timestamp"))
    step_us = step_seconds * 1_000_000
    span = df.groupBy(partition_by).agg(
        F.min(us).alias("__t0"), F.max(us).alias("__t1")
    )
    ticks = span.select(
        partition_by,
        F.explode(
            F.sequence(F.col("__t0"), F.col("__t1"), F.lit(step_us))
        ).alias("__tick_us"),
    )
    obs = df.select(
        partition_by,
        us.alias("__t_us"),
        *[F.col(c) for c in value_cols],
    )
    # union trick: observations sort before the tick at the same µs is
    # WRONG for as-of inclusive semantics? No: tick at exactly t_obs must
    # SEE it -> order by (time, is_tick) so the observation comes first.
    tick_rows = ticks.select(
        partition_by,
        F.col("__tick_us").alias("__t_us"),
        F.lit(1).alias("__is_tick"),
        *[F.lit(None).cast(df.schema[c].dataType).alias(c) for c in value_cols],
    )
    obs_rows = obs.select(
        partition_by, "__t_us", F.lit(0).alias("__is_tick"), *value_cols
    )
    unioned = obs_rows.unionByName(tick_rows)
    # value_cols in the order = deterministic max-value-wins on duplicate
    # (entity, t) observations — the same dedup contract asof_join pins
    w = (
        Window.partitionBy(partition_by)
        .orderBy("__t_us", "__is_tick", *value_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        partition_by,
        "__t_us",
        "__is_tick",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col("__is_tick") == 1).select(
        partition_by, F.col("__t_us").alias("tick_us"), *value_cols
    )
