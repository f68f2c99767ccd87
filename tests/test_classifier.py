"""Hashed-feature logistic quality classifier: learning signal,
fixed-point layout invariance, scoring semantics."""

import random

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.operators import classifier as CL


@pytest.fixture(scope="module")
def labeled(spark):
    """Separable fixture: 'good' docs draw bigrams from tokens 0..19,
    'bad' docs from 500..519 — disjoint hashed-feature support."""
    rng = random.Random(41)
    rows = []
    for i in range(60):
        good = i % 2 == 0
        lo = 0 if good else 500
        toks = [lo + rng.randrange(20) for _ in range(rng.randrange(10, 40))]
        rows.append((f"d{i:06d}", toks, 1 if good else 0))
    rows.append(("d000060", [7], 1))  # featureless: no bigram
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>, y int")


def test_training_separates_planted_signal(spark, labeled):
    w, b = CL.train_logistic_hashed(
        labeled, F.col("y"), num_iters=15, lr=1.0
    )
    scored = CL.score_logistic_hashed(labeled, w, b)
    got = {
        r.doc_id: r.quality_p
        for r in scored.join(labeled.select("doc_id", "y"), "doc_id").collect()
    }
    ys = {r.doc_id: r.y for r in labeled.collect()}
    good = [p for d, p in got.items() if ys[d] == 1 and d != "d000060"]
    bad = [p for d, p in got.items() if ys[d] == 0]
    assert min(good) > max(bad)  # disjoint support must separate fully
    assert all(p > 0.5 for p in good) and all(p < 0.5 for p in bad)


def test_training_is_layout_invariant(spark, labeled):
    w1, b1 = CL.train_logistic_hashed(labeled, F.col("y"), num_iters=5)
    w2, b2 = CL.train_logistic_hashed(
        labeled.repartition(13), F.col("y"), num_iters=5
    )
    assert w1 == w2 and b1 == b2  # bit-identical, not allclose


def test_scoring_covers_every_doc_and_is_layout_invariant(spark, labeled):
    w, b = CL.train_logistic_hashed(labeled, F.col("y"), num_iters=3)
    s1 = {r.doc_id: (r.quality_logit, r.quality_p)
          for r in CL.score_logistic_hashed(labeled, w, b).collect()}
    s2 = {r.doc_id: (r.quality_logit, r.quality_p)
          for r in CL.score_logistic_hashed(labeled.repartition(7), w, b).collect()}
    assert s1 == s2
    assert set(s1) == {r.doc_id for r in labeled.collect()}
    # featureless doc scores the bare bias
    import math
    assert s1["d000060"][0] == b
    assert abs(s1["d000060"][1] - 1 / (1 + math.exp(-b))) < 1e-12


def test_gradient_descent_reduces_logloss(spark, labeled):
    import math

    def logloss(w, b):
        scored = CL.score_logistic_hashed(labeled, w, b)
        rows = scored.join(labeled.select("doc_id", "y"), "doc_id").collect()
        rows = [r for r in rows if r.doc_id != "d000060"]
        return -sum(
            r.y * math.log(max(r.quality_p, 1e-12))
            + (1 - r.y) * math.log(max(1 - r.quality_p, 1e-12))
            for r in rows
        ) / len(rows)

    w0, b0 = [0.0] * CL.DSIR_BUCKETS, 0.0
    w5, b5 = CL.train_logistic_hashed(labeled, F.col("y"), num_iters=5)
    w15, b15 = CL.train_logistic_hashed(labeled, F.col("y"), num_iters=15)
    l0, l5, l15 = logloss(w0, b0), logloss(w5, b5), logloss(w15, b15)
    assert l5 < l0 and l15 < l5
