"""Arrow-vectorized pandas-UDF token kernels — the engine's §2.14
extension point (b): custom numeric kernels that built-in Column
expressions can't express efficiently, as Series->Series pandas UDFs
(never row-at-a-time Python).

Reference analogue: ``TransformFunc``/``CollectorFunc`` are arbitrary
user code plugged into the pipeline
(/root/reference/html/transform/transform.go:17-28,41-42); here the plug-in
shape is a ``@pandas_udf`` over Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def token_entropy(tokens: pd.Series) -> pd.Series:
    """Shannon entropy (nats) of each row's token distribution — a
    quality/diversity feature. Vectorized per Arrow batch with numpy;
    empty sequences -> 0.0."""

    def one(arr) -> float:
        if arr is None or len(arr) == 0:
            return 0.0
        _, counts = np.unique(np.asarray(arr), return_counts=True)
        p = counts / counts.sum()
        return float(-(p * np.log(p)).sum())

    return tokens.map(one)


@pandas_udf("double")
def repetition_ratio(tokens: pd.Series) -> pd.Series:
    """1 - distinct/len: how repetitive a sequence is (dedup signal)."""

    def one(arr) -> float:
        if arr is None or len(arr) == 0:
            return 0.0
        a = np.asarray(arr)
        return float(1.0 - np.unique(a).size / a.size)

    return tokens.map(one)


def entropy_expr(tokens: Column | str = "tokens") -> Column:
    """Array-native entropy twin built ONLY from Column expressions —
    used by tests to pin the pandas kernel's semantics JVM-side (and as
    the hot-path choice when the expression form is fast enough)."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    n = F.size(t)
    uniq = F.array_distinct(t)
    # sum over distinct v of -(c/n)*ln(c/n), c = count of v in t
    contrib = F.transform(
        uniq,
        lambda v: -(
            F.size(F.filter(t, lambda x: x == v)).cast("double") / n
        )
        * F.log(F.size(F.filter(t, lambda x: x == v)).cast("double") / n),
    )
    return F.when(n > 0, F.aggregate(contrib, F.lit(0.0), lambda a, b: a + b)).otherwise(
        F.lit(0.0)
    )
