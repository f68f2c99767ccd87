"""Hypothesis property soaks for the session-7 kernels: repetition
stats vs a Counter brute force, decayed counters vs a python brute
force, and the pack-assembly round-trip — randomized with shrinking
(the fuzz harness uses fixed corpora; hypothesis finds boundary shapes
those miss). GHTS_DEEP_FUZZ raises max_examples for soak runs."""

from __future__ import annotations

import os
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from go_html_transform_spark.functions import repetition as R

_SETTINGS = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    max_examples=int(os.environ.get("GHTS_DEEP_FUZZ", "10")),
)

tokens_lists = st.lists(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=1 << 21)),
        max_size=40,
    ),
    min_size=1,
    max_size=12,
)


def _brute_rep(tokens, n):
    t = [x & R.PACK_MASK for x in tokens if x is not None]
    grams = [tuple(t[i : i + n]) for i in range(len(t) - n + 1)]
    m = len(grams)
    if m == 0:
        return (0, 0)
    c = Counter(grams)
    dup = sum(v for v in c.values() if v >= 2)
    return (dup * R.PPM // m, max(c.values()) * R.PPM // m)


@settings(**_SETTINGS)
@given(corpus=tokens_lists, n=st.sampled_from([1, 2, 3]))
def test_repetition_matches_counter_brute_force(spark, corpus, n):
    rows = list(enumerate(corpus))
    df = spark.createDataFrame(rows, "id long, tokens array<int>")
    got = {
        r["id"]: (r[f"rep{n}_dup_ppm"], r[f"rep{n}_top_ppm"])
        for r in R.with_repetition(df, "tokens", n).collect()
    }
    for i, arr in rows:
        assert got[i] == _brute_rep(arr, n), (i, arr)


@settings(**_SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=20_000),  # seconds
        ),
        min_size=1,
        max_size=60,
    ),
    bucket=st.sampled_from([600, 1800]),
)
def test_decayed_counts_match_python_brute_force(spark, events, bucket):
    import datetime as dt

    from go_html_transform_spark.operators.window import decayed_bucket_counts

    BASE = dt.datetime(2026, 1, 1)
    rows = [
        (e, BASE + dt.timedelta(seconds=s), i)
        for i, (e, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, event_time timestamp, event_id long"
    )
    out = decayed_bucket_counts(df, bucket_seconds=bucket, horizon=4)
    got = {r.event_id: r[f"decayed_{bucket}s_fp"] for r in out.collect()}
    # brute force: count per (entity, bucket), then the shifted sum
    per = Counter(
        (e, s // bucket) for e, s in events
    )
    for i, (e, s) in enumerate(events):
        b = s // bucket
        want = sum(per.get((e, b - d), 0) << (4 - d) for d in range(1, 5))
        assert got[i] == want, (i, e, s)


@settings(**_SETTINGS)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=90), min_size=1,
                   max_size=40),
    ctx=st.sampled_from([16, 64]),
)
def test_pack_assembly_roundtrip_property(spark, sizes, ctx):
    from go_html_transform_spark.operators import packing as PK
    from go_html_transform_spark.operators import sharding as SHO

    rows = [
        (i, list(range(i * 1000, i * 1000 + n))) for i, n in enumerate(sizes)
    ]
    df = (
        spark.createDataFrame(rows, "doc_key long, tokens array<int>")
        .withColumn("doc_id", F.col("doc_key").cast("string"))
        .withColumn("n_tok", F.size("tokens"))
    )
    assigned = PK.pack_assign(
        SHO.assign_shards(df, F.col("doc_key"), 2), F.col("doc_key"),
        "n_tok", ctx,
    )
    packs = PK.pack_contexts(assigned, context_len=ctx).collect()
    rebuilt: dict[str, list] = {}
    for p in sorted(packs, key=lambda p: (p.shard, p.pack_id)):
        pos = 0
        for sp in p.spans:  # gapless tiling inside every pack
            assert sp.begin == pos
            pos = sp.end
            rebuilt.setdefault(sp.doc_id, []).extend(
                p.tokens[sp.begin : sp.end]
            )
        assert pos == len(p.tokens) <= ctx
    want = {str(i): toks for i, toks in rows if toks}
    assert rebuilt == want
