"""F3 — token-array transform fixtures, mirroring the reference's golden
transform suite (/root/reference/html/transform/transform_test.go:34-198).
Assertions are exact token-array equality — the analogue of rendered-string
equality (transform_test.go:40,51,64)."""

from pyspark.sql import functions as F

from go_html_transform_spark.operators import transforms as X
from go_html_transform_spark.plans.pipeline import Transform, Transformer


def _one(spark, tokens, **cols):
    row = {"doc_id": "d000000", "tokens": tokens, "source": "web", **cols}
    df = spark.createDataFrame(
        [row], "doc_id string, tokens array<int>, source string"
        if not cols
        else None,
    )
    return df


def _result(tr, doc="d000000"):
    return [r.tokens for r in tr.df.filter(F.col("doc_id") == doc).collect()]


def test_append(spark):
    # TestTransformApply (transform_test.go:34-41) + the direct-op
    # TestAppendChildren (transform_test.go:67-73): append at matched
    df = spark.createDataFrame(
        [("d000000", [1, 2, 3], "web"), ("d000001", [9], "web")],
        "doc_id string, tokens array<int>, source string",
    )
    tr = Transformer(df).apply("t2", lambda t, p: X.append_children(t, [77]))
    out = {r.doc_id: r.tokens for r in tr.df.collect()}
    assert out["d000000"] == [1, 2, 3, 77]
    assert out["d000001"] == [9]  # unmatched untouched


def test_apply_all_pipeline(spark):
    # TestTransformApplyAll (transform_test.go:43-52): two rules in order
    df = spark.createDataFrame(
        [("d000000", [1, 2], "web")], "doc_id string, tokens array<int>, source string"
    )
    t1 = Transform.parse("t1", lambda t, p: X.append_children(t, [100]))
    t2 = Transform.parse("t100", lambda t, p: X.append_children(t, [200]))
    tr = Transformer(df).apply_all(t1, t2)
    assert _result(tr) == [[1, 2, 100, 200]]  # second rule sees first's output


def test_do_all_compose(spark):
    # TestDoAll (transform_test.go:151-161): prepend+append composition
    df = spark.createDataFrame(
        [("d000000", [5], "web")], "doc_id string, tokens array<int>, source string"
    )
    tr = Transformer(df).apply(
        "t5",
        lambda t, p: X.do_all(
            t,
            lambda c: X.prepend_children(c, [1]),
            lambda c: X.append_children(c, [9]),
        ),
    )
    assert _result(tr) == [[1, 5, 9]]


def test_remove_children(spark):
    # TestRemoveChildren (transform_test.go:75-79)
    df = spark.createDataFrame(
        [("d000000", [1, 2, 3], "web"), ("d000001", [4], "wiki")],
        "doc_id string, tokens array<int>, source string",
    )
    tr = Transformer(df).apply(".web", lambda t, p: X.remove_children(t))
    out = {r.doc_id: r.tokens for r in tr.df.collect()}
    assert out["d000000"] == []
    assert out["d000001"] == [4]


def test_replace_children(spark):
    # TestReplaceChildren (transform_test.go:81-88)
    df = spark.createDataFrame(
        [("d000000", [1, 2, 3], "web")], "doc_id string, tokens array<int>, source string"
    )
    tr = Transformer(df).apply("t2", lambda t, p: X.replace_children(t, [7, 8]))
    assert _result(tr) == [[7, 8]]


def test_splice_replace(spark):
    # TestReplace / TestReplaceSplice (transform_test.go:90-117):
    # replace the element AT the matched position
    df = spark.createDataFrame(
        [("d000000", [1, 2, 3], "web")], "doc_id string, tokens array<int>, source string"
    )
    tr = Transformer(df).apply(
        "t2", lambda t, p: X.splice(t, F.element_at(p, 1), [70, 71])
    )
    assert _result(tr) == [[1, 70, 71, 3]]


def test_splice_at_zero_and_end(spark):
    df = spark.createDataFrame(
        [("d000000", [1, 2, 3], "web")], "doc_id string, tokens array<int>, source string"
    )
    tr = Transformer(df).apply("t1", lambda t, p: X.splice(t, 0, [9]))
    assert _result(tr) == [[9, 2, 3]]
    tr = Transformer(df).apply("t3", lambda t, p: X.splice(t, 2, [9]))
    assert _result(tr) == [[1, 2, 9]]


def test_splice_out_of_range_is_noop(spark):
    # pinned semantics: the reference panics on root-replace
    # (transform_test.go:119-132); flat sequences have no root, so the
    # engine pins out-of-range splice -> unchanged
    df = spark.createDataFrame(
        [("d000000", [1, 2], "web")], "doc_id string, tokens array<int>, source string"
    )
    tr = Transformer(df).apply("t1", lambda t, p: X.splice(t, 5, [9]))
    assert _result(tr) == [[1, 2]]


def test_insert_before(spark):
    df = spark.createDataFrame(
        [("d000000", [1, 2, 3], "web")], "doc_id string, tokens array<int>, source string"
    )
    tr = Transformer(df).apply(
        "t3", lambda t, p: X.insert_before(t, F.element_at(p, 1), [99])
    )
    assert _result(tr) == [[1, 2, 99, 3]]


def test_copy_and_fan_out(spark):
    # TestCopyAnd (transform_test.go:163-178): 1 row -> 2 variant rows
    df = spark.createDataFrame(
        [("d000000", [1, 2], "web"), ("d000001", [5], "wiki")],
        "doc_id string, tokens array<int>, source string",
    )
    tr = Transformer(df).fan_out(
        "t1",
        lambda t, p: X.append_children(t, [77]),
        lambda t, p: X.replace_children(t, [88]),
    )
    rows = sorted((r.doc_id, tuple(r.tokens)) for r in tr.df.collect())
    assert rows == [
        ("d000000", (1, 2, 77)),
        ("d000000", (88,)),
        ("d000001", (5,)),  # unmatched: single pass-through row
    ]


def test_subtransform_scoped(spark):
    # TestTransformSubtransforms (transform_test.go:180-198): nested rule
    # applies only within the matched scope
    df = spark.createDataFrame(
        [("d000000", [1, 2, 1, 3], "web")], "doc_id string, tokens array<int>, source string"
    )
    tr = Transformer(df).apply(
        "t2",
        lambda t, p: X.subtransform(t, lambda tok: tok == 1, lambda tok: tok + 100),
    )
    assert _result(tr) == [[101, 2, 101, 3]]


def test_filter_tokens(spark):
    df = spark.createDataFrame(
        [("d000000", [1, 2, 1, 3], "web")], "doc_id string, tokens array<int>, source string"
    )
    tr = Transformer(df).apply("t1", lambda t, p: X.filter_tokens(t, lambda tok: tok != 1))
    assert _result(tr) == [[2, 3]]


def test_modify_attrib_upsert(spark):
    # TestModifyAttrib (transform_test.go:134-141): update-if-present else append
    df = spark.createDataFrame(
        [("a", {"k": "1"}), ("b", {})],
        "doc_id string, attrs map<string,string>",
    )
    out = df.withColumn("attrs", X.modify_attrib("attrs", "k", "9")).collect()
    got = {r.doc_id: r.attrs for r in out}
    assert got["a"] == {"k": "9"}
    assert got["b"] == {"k": "9"}


def test_transform_attrib_noop_if_absent(spark):
    # TestTransformAttrib (transform_test.go:143-149): no-op when key absent
    df = spark.createDataFrame(
        [("a", {"k": "x"}), ("b", {"z": "y"})],
        "doc_id string, attrs map<string,string>",
    )
    out = df.withColumn(
        "attrs",
        X.transform_attrib("attrs", "k", lambda v: F.concat(v, F.lit("!"))),
    ).collect()
    got = {r.doc_id: r.attrs for r in out}
    assert got["a"] == {"k": "x!"}
    assert got["b"] == {"z": "y"}


def test_apply_to_first_match(spark):
    # ApplyToFirstMatch (transform.go:99-110): first non-empty rule wins per row
    df = spark.createDataFrame(
        [("d000000", [1, 2], "web"), ("d000001", [2, 3], "web"), ("d000002", [9], "web")],
        "doc_id string, tokens array<int>, source string",
    )
    tr = Transformer(df).apply_to_first_match(
        lambda t, p: X.append_children(t, [50]), "t1", "t2"
    )
    got = {r.doc_id: r.tokens for r in tr.df.collect()}
    assert got["d000000"] == [1, 2, 50]  # t1 matched first
    assert got["d000001"] == [2, 3, 50]  # t1 missed, t2 matched
    assert got["d000002"] == [9]  # nothing matched


def test_priority_ordering(spark):
    # specificity-priority application: higher-specificity rule runs first
    df = spark.createDataFrame(
        [("d000000", [1], "web")], "doc_id string, tokens array<int>, source string"
    )
    low = Transform.parse("t1", lambda t, p: X.append_children(t, [2]))
    high = Transform.parse("#d000000", lambda t, p: X.append_children(t, [3]))
    tr = Transformer(df).apply_all(low, high, by_priority=True)
    assert _result(tr) == [[1, 3, 2]]  # id-rule (1e14) before tag-rule (1)


def test_subtransform_scoped_after_match(spark):
    # Subtransform re-roots at the matched node (transform.go:250-281):
    # the inner rewrite must NOT touch tokens before the match scope
    df = spark.createDataFrame(
        [("d000000", [1, 9, 2, 1, 3], "web"), ("d000001", [1, 1, 1], "web")],
        "doc_id string, tokens array<int>, source string",
    )
    tr = Transformer(df).apply(
        "t2",
        lambda t, p: X.subtransform_scoped(t, p, lambda tok: tok == 1, lambda tok: tok + 100),
    )
    got = {r.doc_id: r.tokens for r in tr.df.collect()}
    assert got["d000000"] == [1, 9, 2, 101, 3]  # the 1 BEFORE the 2 untouched
    assert got["d000001"] == [1, 1, 1]  # no outer match -> untouched


def test_new_transformer_preserves_doc(spark):
    # TestNewTransformer (transform_test.go:27-32): the freshly wrapped
    # document is the input document (here: the plan is the SAME DataFrame,
    # untouched until a rule is applied)
    df = spark.createDataFrame(
        [("d000000", [1, 2], "web")], "doc_id string, tokens array<int>, source string"
    )
    tr = Transformer(df)
    assert tr.df is df
    assert [r.tokens for r in tr.df.collect()] == [[1, 2]]


def test_clone_is_independent_snapshot(spark):
    # TestNodeClone (h5_test.go:32-43) + Transformer.Clone
    # (transform.go:81-83): mutating the clone must not touch the original
    # — immutability gives the reference's deep-clone contract for free.
    df = spark.createDataFrame(
        [("d000000", [1, 2], "web")], "doc_id string, tokens array<int>, source string"
    )
    tr = Transformer(df)
    cl = tr.clone().apply("t1", lambda t, p: X.append_children(t, [99]))
    assert [r.tokens for r in cl.df.collect()] == [[1, 2, 99]]
    assert [r.tokens for r in tr.df.collect()] == [[1, 2]]  # original untouched


def test_node_walk_counts(spark):
    # TestNodeWalk (h5_test.go:45-56): walking the tree visits every node
    # exactly once — the flat-sequence analogue is sum(size(tokens)) over
    # the corpus equalling the python-side count.
    rows = [("d%06d" % i, list(range(i % 5)), "web") for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string"
    )
    total = df.select(F.sum(F.size("tokens"))).first()[0]
    assert total == sum(len(t) for _, t, _ in rows)
