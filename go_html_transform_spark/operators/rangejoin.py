"""Bucketized range (interval) join — the set-based twin of the as-of
join (operators/asof.py): probe rows join every build interval they fall
inside, not just the nearest one.

Reference parity: go-html-transform has no temporal join at all — this is
an engine-added operator of the point-in-time feature layer (SURVEY §2.5),
pairing each probe event with all open windows of its entity, e.g. "every
purchase inside one hour of a click".

Scale story: Spark's own planner turns `a.key = b.key AND a.t BETWEEN b.s
AND b.e` into a sort-merge join on `key` alone — every probe row meets
every interval of its key (quadratic for hot keys), or worse a broadcast
nested-loop when no equi-key exists. The bucketized form makes the time
predicate part of the SHUFFLE KEY:

* each build interval [s, e) is exploded into the fixed-width time
  buckets it covers — a bounded fan-out of ceil(L/width)+1 rows per
  interval (choose width ~ the typical interval length so this is <= 2);
* each probe row hashes to exactly ONE bucket (floor(t/width));
* the join is a plain equi-join on (key, bucket) followed by the residual
  `s <= t < e` filter.

Each qualifying (probe, interval) pair is emitted exactly once — the
probe only visits its own bucket, and an interval appears at most once
per bucket — so no post-join dedup is needed. Per-partition work is
bounded by bucket occupancy, not per-key row counts; AQE's skew-join
split handles residual hot (key, bucket) cells. This is the same plan
shape Databricks' RANGE_JOIN bin hint produces, built here from
first-class relational ops so it runs on stock Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000


def _bucket(us: Column, width_us: int) -> Column:
    # floor division on BIGINT microseconds. The quotient crosses a double
    # (Spark `/` on longs), but (us - us mod w) is an exact multiple of w
    # and doubles represent integers exactly below 2^53 — i.e. any µs
    # timestamp before year ~2255 — so the bucket id is exact.
    return (us - F.pmod(us, F.lit(width_us))) / F.lit(width_us)


def interval_buckets(start_us: Column, end_us: Column, width_us: int) -> Column:
    """array<bigint> of every bucket index the half-open interval
    [start_us, end_us) covers. Empty intervals (end <= start) cover none."""
    first = _bucket(start_us, width_us).cast("long")
    last = _bucket(end_us - 1, width_us).cast("long")
    return F.when(end_us > start_us, F.sequence(first, last)).otherwise(
        F.array().cast("array<long>")
    )


def range_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_time_us: str,
    start_us: str,
    end_us: str,
    width_us: int,
    n_salts: int = 1,
) -> DataFrame:
    """Inner-join probe rows into build intervals of the same `on` key:
    keeps pairs with start_us <= probe_time_us < end_us (half-open, µs
    precision end-to-end). All non-key columns of both inputs pass
    through; `width_us` is the bucketization width (pick ~ the typical
    interval length; fan-out per interval is ceil(L/width)+1).

    `n_salts > 1` splits hot (key, bucket) cells: each probe row hashes
    deterministically to one of n_salts sub-keys (pmod of its own µs
    timestamp — reproducible, no RNG) and every interval-bucket row is
    replicated across all n_salts, so per-partition work drops by ~n_salts
    at the cost of an n_salts× build-side fan-out. Use when one viral key
    concentrates probes in a few buckets; AQE's skew split handles milder
    cases without the replication cost."""
    b = build.withColumn(
        "__bk", F.explode(interval_buckets(F.col(start_us), F.col(end_us), width_us))
    )
    p = probe.withColumn(
        "__bk", _bucket(F.col(probe_time_us), width_us).cast("long")
    )
    keys = [on, "__bk"]
    if n_salts > 1:
        p = p.withColumn(
            "__salt", F.pmod(F.col(probe_time_us), F.lit(n_salts)).cast("int")
        )
        b = b.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        )
        keys.append("__salt")
    joined = p.join(b, keys).filter(
        (F.col(start_us) <= F.col(probe_time_us))
        & (F.col(probe_time_us) < F.col(end_us))
    )
    return joined.drop("__bk", *(["__salt"] if n_salts > 1 else []))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    width_us: int,
) -> DataFrame:
    """Join interval pairs of the same `on` key whose half-open spans
    overlap (ls < re AND rs < le). Both sides explode into their covered
    buckets and equi-join on (key, bucket); an overlapping pair meets in
    every bucket both cover, so to emit EXACTLY ONCE without a distinct
    (which would shuffle the full payload again) the residual keeps only
    the bucket containing the overlap's start, max(ls, rs) — a pure
    per-row predicate, no second exchange."""
    l = left.withColumn(
        "__bkl", F.explode(interval_buckets(F.col(left_start), F.col(left_end), width_us))
    )
    r = right.withColumn(
        "__bkr",
        F.explode(interval_buckets(F.col(right_start), F.col(right_end), width_us)),
    )
    joined = l.join(r, (l["__bkl"] == r["__bkr"]) & (l[on] == r[on])).filter(
        (F.col(left_start) < F.col(right_end))
        & (F.col(right_start) < F.col(left_end))
        & (
            F.col("__bkl")
            == _bucket(F.greatest(F.col(left_start), F.col(right_start)), width_us).cast(
                "long"
            )
        )
    )
    return joined.drop(r[on]).drop("__bkl").drop("__bkr")
