"""Realistic-vocabulary synthetic corpus: determinism, planted dup
structure, Zipf rank law, and the hashed embedding map."""

import math

import pytest
from pyspark.sql import functions as F

from go_html_transform_spark.sources import synth as Z


@pytest.fixture(scope="module")
def docs(spark):
    return Z.zipf_documents(spark, 400, vocab_size=4096, avg_len=80).persist()


def test_layout_independent(spark, docs):
    a = sorted((r.doc_id, tuple(r.tokens)) for r in docs.collect())
    b = sorted(
        (r.doc_id, tuple(r.tokens))
        for r in Z.zipf_documents(
            spark, 400, vocab_size=4096, avg_len=80
        ).repartition(17).collect()
    )
    assert a == b


def test_dup_structure(docs):
    rows = {r.doc_key: r for r in docs.collect()}
    dups = [k for k, r in rows.items() if r.is_dup]
    assert len(dups) == 400 // 20  # every i % 20 == 1 except i=1>0 ok
    for k in dups:
        d, b = list(rows[k].tokens), list(rows[k - 1].tokens)
        assert len(d) == len(b)  # length keyed by content seed
        same = sum(1 for x, y in zip(d, b) if x == y)
        assert same / len(d) > 0.85  # ~5% positions perturbed
        assert d != b or len(d) < 40  # perturbation is real (w.h.p.)
    # non-dup neighbors are unrelated
    b0, b2 = list(rows[0].tokens), list(rows[2].tokens)
    overlap = len(set(b0) & set(b2)) / len(set(b0) | set(b2))
    assert overlap < 0.5


def test_zipf_rank_law(docs):
    counts = dict(
        (r.t, r.n)
        for r in docs.select(F.explode("tokens").alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert min(counts) >= 1 and max(counts) <= 4096
    # rank-frequency ~ 1/k: count(1) >> count(~100) >> count(~3000)
    c1 = counts.get(1, 0) + counts.get(2, 0)
    c100 = sum(counts.get(t, 0) for t in range(100, 110))
    c3000 = sum(counts.get(t, 0) for t in range(3000, 3010))
    assert c1 > c100 > c3000 > 0


def test_topic_embeddings_cluster_structure(docs):
    emb = Z.topic_embeddings(docs, n_topics=8)
    rows = [(r.doc_key, r.topic, list(r.embedding)) for r in emb.collect()]
    by_key = {k: (t, v) for k, t, v in rows}
    assert len(by_key) == 400

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    import math

    for _, _, v in rows[:10]:
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9
    # dup shares its base's topic and is jitter-close
    for k in range(21, 400, 20):
        assert by_key[k][0] == by_key[k - 1][0]
        assert cos(by_key[k][1], by_key[k - 1][1]) > 0.995
    # same-topic pairs are far closer than cross-topic pairs
    import collections

    groups = collections.defaultdict(list)
    for k, (t, v) in by_key.items():
        groups[t].append(v)
    same = [cos(vs[0], vs[1]) for vs in groups.values() if len(vs) >= 2]
    keys = sorted(groups)
    cross = [
        cos(groups[keys[i]][0], groups[keys[i + 1]][0])
        for i in range(len(keys) - 1)
    ]
    assert min(same) > max(cross)
    # deterministic across partitionings
    again = {
        r.doc_key: list(r.embedding)
        for r in Z.topic_embeddings(docs.repartition(13), n_topics=8).collect()
    }
    assert all(again[k] == v for k, (_, v) in by_key.items())


def test_hashed_embeddings_unit_norm_and_dup_proximity(docs):
    emb = Z.hashed_embeddings(docs)
    rows = {r.doc_key: list(r.embedding) for r in emb.collect()}
    assert len(rows) == 400 and all(len(v) == 64 for v in rows.values())
    for v in list(rows.values())[:20]:
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    dup_cos = [cos(rows[k], rows[k - 1]) for k in range(21, 400, 20)]
    rnd_cos = [cos(rows[k], rows[k + 2]) for k in range(0, 380, 20)]
    assert min(dup_cos) > 0.9
    assert sum(rnd_cos) / len(rnd_cos) < 0.8
