"""Approximate-nearest-neighbor search over embedding columns
(array<float>): brute-force cosine top-k baseline + sign-LSH bucketed
scale path.

Scale story: brute-force is a broadcast of ONE query vector over the
corpus — embarrassingly parallel, no shuffle, fine at any corpus size for
single queries. For query BATCHES the LSH variant buckets the corpus once
(8 deterministic hyperplanes -> 256 buckets) and probes only matching
buckets — recall traded for a 256x candidate reduction; multi-probe
(Hamming-1 neighbors) recovers most recall.

Hyperplane weights are deterministic integer arithmetic (no RNG) so the
DuckDB oracle can reproduce the exact same buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_html_transform_spark.operators.dedup import cosine

N_PLANES = 8
_W_MOD = 1001  # weight lattice: w in {-500/1000 .. +500/1000}
_W_MUL = 2654435761  # Knuth multiplicative constant


def plane_weight(p: int, d: Column | int) -> Column:
    """Deterministic pseudo-random weight for plane p, dimension d:
    (((p*31 + d) * MUL) mod 1001)/1000 - 0.5  in [-0.5, 0.5]."""
    dd = d if isinstance(d, Column) else F.lit(d)
    raw = ((F.lit(p * 31) + dd) * F.lit(_W_MUL)) % _W_MOD
    return raw.cast("double") / 1000.0 - 0.5


def plane_weight_sql(p: int, d: str) -> str:
    return f"((({p} * 31 + {d}) * {_W_MUL}) % {_W_MOD}) / 1000.0 - 0.5"


def lsh_bucket(
    vec: Column, n_planes: int = N_PLANES, plane_offset: int = 0
) -> Column:
    """Sign-LSH bucket id in [0, 2^n_planes): bit j = 1 iff
    <w_{offset+j}, v> > 0. ``plane_offset`` selects a disjoint plane
    family so independent hash TABLES (multi-table LSH for pair dedup)
    share one weight lattice."""
    def weigher(p: int):
        # closure factory — PySpark miscounts `_p=p` defaults in lambda arity
        return lambda v, d: v * plane_weight(p, d)

    out = F.lit(0)
    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                weigher(plane_offset + j),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(proj > 0, F.lit(2**j)).otherwise(F.lit(0))
    return out


def lsh_bucket_sql(
    vec: str = "embedding", n_planes: int = N_PLANES, plane_offset: int = 0
) -> str:
    terms = []
    for j in range(n_planes):
        proj = (
            f"list_sum(list_transform(range(len({vec})), "
            f"d -> {vec}[d+1] * ({plane_weight_sql(plane_offset + j, 'd')})))"
        )
        terms.append(f"CASE WHEN {proj} > 0 THEN {2**j} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k by cosine. The query is a literal array —
    broadcast inside the expression; the scan is a single stage with a
    global top-k (TakeOrderedAndProject), no full sort."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = emb.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket (plus
    Hamming-1 buckets when multiprobe). Approximate by design — tests
    measure recall vs cosine_topk rather than equality."""
    import math

    # driver-side bucket of the query (pure python mirror of lsh_bucket)
    def w(p: int, d: int) -> float:
        return ((p * 31 + d) * _W_MUL % _W_MOD) / 1000.0 - 0.5

    qb = 0
    for p in range(n_planes):
        proj = sum(v * w(p, d) for d, v in enumerate(query_vec))
        if proj > 0:
            qb |= 1 << p
    probes = [qb] + ([qb ^ (1 << p) for p in range(n_planes)] if multiprobe else [])

    q = F.array(*[F.lit(float(v)) for v in query_vec])
    bucketed = emb.withColumn("__b", lsh_bucket(F.col(vec_col).cast("array<double>"), n_planes))
    cand = bucketed.filter(F.col("__b").isin(probes))
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def lsh_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = N_PLANES,
    multiprobe: bool = True,
) -> DataFrame:
    """Batched ANN: top-k per query over a bucketed corpus — the real
    scale path (a single-vector query is a broadcast; a query BATCH is a
    join). Corpus is bucketed once; queries join on bucket (plus Hamming-1
    probes via an exploded probe list), cosine scored inside the join,
    ranked per query with a window top-k.

    Shuffle profile: one exchange per side on the bucket key + one
    window; candidate volume is |corpus|/2^n_planes per probe.
    """
    from pyspark.sql.window import Window

    cvec = F.col(vec_col).cast("array<double>")
    c = corpus.select(
        F.col(id_col), cvec.alias("__cv"), lsh_bucket(cvec, n_planes).alias("__b")
    )
    qvec = F.col(vec_col).cast("array<double>")
    q = queries.select(
        F.col(query_id_col), qvec.alias("__qv"), lsh_bucket(qvec, n_planes).alias("__qb")
    )
    if multiprobe:
        probes = F.array(
            F.col("__qb"),
            *[
                F.col("__qb").bitwiseXOR(F.lit(1 << p))
                for p in range(n_planes)
            ],
        )
    else:
        probes = F.array(F.col("__qb"))
    q = q.withColumn("__b", F.explode(probes))

    joined = q.join(c, "__b")
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("__cv"), F.col("__qv")), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the partition-pruning scale path
# ---------------------------------------------------------------------------


def ivf_centroids(
    emb: DataFrame, k: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse codebook: the k lowest-id vectors seed the
    centroids (production would Lloyd-iterate; the sandbox pins seeds so
    the DuckDB oracle reproduces the identical partition assignment —
    quantizer QUALITY is orthogonal to the distributed search structure).
    Returns driver-side rows: k is small by design (codebooks broadcast)."""
    rows = (
        emb.filter(F.col(id_col) < k)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .collect()
    )
    return sorted((int(r[0]), list(r[1])) for r in rows)


def _lit_vec(v: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def ivf_assign(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
    use_arrow: bool = False,
) -> DataFrame:
    """Assign every vector to its argmax-cosine centroid — ZERO shuffle:
    the codebook is inlined as literals, the argmax is an array_max over
    k (cos, -centroid_id) structs computed per row inside one projection.
    At 10^12 rows this is the map-side quantization pass that feeds a
    cluster-partitioned (Iceberg `bucket(centroid_id)`) layout, after
    which every probe is partition-pruned to nprobe/k of the data.

    ``use_arrow=True``: vectorized Arrow kernel — one batch matmul
    against the (centroid-id-sorted) codebook matrix + argmax, still
    zero shuffle. The expression form's per-row cost is k interpreted
    HOF cosines (k*dim*3 interpreted ops — it DOMINATES large-k
    assignment passes); the kernel is one BLAS call per Arrow batch.
    Ties and zero-norm rows resolve to the min centroid id in both
    forms; argmax values may differ in final-ulp from the expression
    fold (matmul summation order), so the expression form remains the
    DuckDB-oracle anchor.

    Both forms emit the assignment as int32 (the expression form's
    ``.cast("int")``, the kernel's ``returnType='int'``), so centroid
    ids outside int32 would silently wrap — validated here instead of
    discovered as a wrong cluster id downstream."""
    _I32 = 2**31
    bad = [cid for cid, _ in centroids if not (-_I32 <= cid < _I32)]
    if bad:
        raise ValueError(
            f"ivf_assign emits int32 centroid ids; out-of-range: {bad[:3]}"
        )
    if use_arrow:
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        ordered = sorted(centroids, key=lambda t: t[0])
        cids = np.array([cid for cid, _ in ordered], dtype="int64")
        Cm = np.vstack([cv for _, cv in ordered]).astype("float64")
        cn = np.linalg.norm(Cm, axis=1)
        Cn = Cm / np.where(cn == 0.0, 1.0, cn)[:, None]
        Cn[cn == 0.0] = 0.0

        # no annotations: `from __future__ import annotations` stringifies
        # them and pandas_udf's signature inference rejects the strings;
        # the explicit "int" returnType + SCALAR default carry the typing
        def _assign_impl(vs):
            if not len(vs):
                return pd.Series([], dtype="int32")
            V = np.vstack(vs.to_numpy()).astype("float64")
            n = np.linalg.norm(V, axis=1)
            Vn = V / np.where(n == 0.0, 1.0, n)[:, None]
            Vn[n == 0.0] = 0.0
            best = np.argmax(Vn @ Cn.T, axis=1)  # first max = min cid
            return pd.Series(cids[best].astype("int32"))

        return emb.withColumn(
            out_col, pandas_udf(_assign_impl, "int")(F.col(vec_col))
        )
    v = F.col(vec_col).cast("array<double>")
    scored = F.array(
        *[
            F.struct(
                cosine(v, _lit_vec(cv)).alias("c"),
                F.lit(-cid).alias("negid"),
            )
            for cid, cv in centroids
        ]
    )
    return emb.withColumn(out_col, (-F.array_max(scored)["negid"]).cast("int"))


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: rank centroids against the query driver-side, probe
    the nprobe nearest clusters only, exact-score the candidates. One
    stage: filter + TakeOrderedAndProject, no shuffle, no Python."""

    def cos_py(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    probes = [
        cid
        for cid, _ in sorted(
            centroids, key=lambda c: (-cos_py(query_vec, c[1]), c[0])
        )[:nprobe]
    ]
    q = _lit_vec(query_vec)
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("centroid_id").isin(probes))
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Lloyd-refined IVF codebook (iterative k-means, exact fixed-point means)
# ---------------------------------------------------------------------------

LLOYD_SCALE = 1_000_000


def lloyd_refine(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """One exact Lloyd iteration: assign every vector to its argmax-cosine
    centroid (zero-shuffle literal codebook, ivf_assign), then recompute
    each centroid as the element-wise mean of its members in FIXED-POINT
    arithmetic — per-element BIGINT sums are exact and order-independent,
    so the new codebook is bit-identical across partitionings AND across
    engines (the DuckDB twin reproduces it; naive double sums would
    diverge in the last ulp and flip near-tie assignments).

    Cost at scale: ONE aggregation shuffle shipping k x dim int64 partial
    sums (map-side combined) — independent of corpus size. Empty clusters
    keep their previous centroid (standard Lloyd)."""
    dim = len(centroids[0][1])
    assigned = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    fx = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * LLOYD_SCALE).cast("long"),
    )
    rows = (
        assigned.withColumn("__fx", fx)
        .groupBy("centroid_id")
        .agg(
            F.count("*").alias("__n"),
            *[
                F.sum(F.element_at("__fx", i + 1)).alias(f"__s{i}")
                for i in range(dim)
            ],
        )
        .collect()
    )
    means = {
        int(r["centroid_id"]): [
            r[f"__s{i}"] / (r["__n"] * float(LLOYD_SCALE)) for i in range(dim)
        ]
        for r in rows
    }
    return sorted((cid, means.get(cid, cv)) for cid, cv in centroids)


def ivf_lloyd_centroids(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Seed codebook + ``iters`` exact Lloyd iterations (driver-side loop;
    the codebook is k rows, each iteration is one distributed pass)."""
    c = ivf_centroids(emb, k=k, id_col=id_col, vec_col=vec_col)
    for _ in range(iters):
        c = lloyd_refine(emb, c, id_col=id_col, vec_col=vec_col)
    return c


def _lloyd_cos_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(len({a})), "
        f"i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * x)))"
        f" * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * x))))"
    )


def lloyd_cte_sql(k: int = 8, iters: int = 2, dim: int = 64) -> tuple[str, str]:
    """DuckDB twin of ivf_lloyd_centroids + final assignment: returns
    (cte_body, final_assign_name). The CTE chain is
    lc0 (seeds) -> la{i} (assign) -> lm{i} (fixed-point means) ->
    lc{i+1} (COALESCE empty clusters to previous centroid)."""
    parts = [
        f"""lc0 AS (
            SELECT vec_id AS cid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
            FROM embeddings WHERE vec_id < {k})"""
    ]
    for i in range(iters + 1):
        parts.append(
            f"""la{i} AS (
              SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       ROW_NUMBER() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY {_lloyd_cos_sql('e.embedding', 'c.cvec')} DESC,
                                  c.cid
                       ) AS rk
                FROM embeddings e CROSS JOIN lc{i} c
              ) WHERE rk = 1)"""
        )
        if i == iters:
            break
        sums = ", ".join(
            f"SUM(CAST(ROUND(e.embedding[{j + 1}] * {LLOYD_SCALE}) AS BIGINT))"
            for j in range(dim)
        )
        parts.append(
            f"""lm{i} AS (
              SELECT a.cid, COUNT(*) AS n, [{sums}] AS s
              FROM la{i} a JOIN embeddings e ON a.vec_id = e.vec_id
              GROUP BY a.cid)"""
        )
        parts.append(
            f"""lc{i + 1} AS (
              SELECT c.cid,
                     CASE WHEN m.cid IS NULL THEN c.cvec
                          ELSE list_transform(m.s, x -> x / (m.n * {LLOYD_SCALE}.0))
                     END AS cvec
              FROM lc{i} c LEFT JOIN lm{i} m ON c.cid = m.cid)"""
        )
    return ",\n".join(parts), f"la{iters}"


# ---------------------------------------------------------------------------
# Product quantization (PQ): the ANN memory-scale path
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces (dim 64 -> 16 dims each)
PQ_KSUB = 16  # codes per subspace -> 4 bits; packed code fits 16 bits


def pq_codebooks(
    emb: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Deterministic per-subspace codebooks: the ksub lowest-id vectors'
    subvectors seed subspace j's codes (the ivf_centroids convention —
    production would k-means each subspace; seeding pins the DuckDB
    oracle to the identical encoding). Driver-side: m*ksub*(dim/m)
    doubles — a few KB, broadcast as literals."""
    rows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in emb.filter(F.col(id_col) < ksub)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .collect()
    )
    dim = len(rows[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    return [
        [(code, vec[j * ds : (j + 1) * ds]) for code, vec in rows]
        for j in range(m)
    ]


def _l2sq(a: Column, b: Column) -> Column:
    """Sum of squared differences, left-to-right fold (the order every
    engine twin reproduces — float determinism depends on it)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
    codes_col: str | None = None,
) -> DataFrame:
    """PQ-encode every vector — ZERO shuffle, zero Python: per subspace
    the argmin-L2 code is an array_min over ksub (dist, code) structs
    (struct ordering = dist asc, code asc — the deterministic tie-break),
    all codebook entries inlined as literals. The packed code is
    sum(code_j * ksub^j): 4 subspaces x 16 codes = 16 bits — a 64-dim
    float32 vector (256 B) compresses to 2 B, the layout that lets a
    10^12-vector index live in cluster RAM for ADC scans.

    ``codes_col`` optionally also emits the unpacked array<int>."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    v = F.col(vec_col).cast("array<double>")
    ds = len(codebooks[0][0][1])
    code_exprs = []
    for j in range(m):
        sub = F.slice(v, j * ds + 1, ds)
        scored = F.array(
            *[
                F.struct(
                    _l2sq(sub, _lit_vec(cv)).alias("d"),
                    F.lit(code).alias("code"),
                )
                for code, cv in codebooks[j]
            ]
        )
        code_exprs.append(F.array_min(scored)["code"])
    packed = F.lit(0)
    for j in range(m):
        packed = packed + code_exprs[j] * F.lit(ksub**j)
    out = emb.withColumn(out_col, packed.cast("int"))
    if codes_col:
        out = out.withColumn(codes_col, F.array(*code_exprs))
    return out


def pq_l2sq_sql(a: str, b: str) -> str:
    """DuckDB twin of _l2sq (same index order; list_sum over doubles
    matches the engine's left fold — the _IVF_COS precedent)."""
    return (
        f"list_sum(list_transform(range(len({a})), "
        f"i -> (CAST({a}[i+1] AS DOUBLE) - CAST({b}[i+1] AS DOUBLE))"
        f" * (CAST({a}[i+1] AS DOUBLE) - CAST({b}[i+1] AS DOUBLE))))"
    )


def pq_encode_cte_sql(
    m: int = PQ_M, ksub: int = PQ_KSUB, dim: int = 64
) -> str:
    """CTE chain ending in ``pqe`` (vec_id, j, code): the exact encoding
    pq_encode produces, from the same seeded codebooks."""
    ds = dim // m
    sv = f"e.embedding[p.j*{ds}+1 : p.j*{ds}+{ds}]"
    return f"""
    pqc AS (
      SELECT j, vec_id AS code,
             embedding[j*{ds}+1 : j*{ds}+{ds}] AS cvec
      FROM embeddings CROSS JOIN (SELECT unnest(range(0, {m})) AS j)
      WHERE vec_id < {ksub}),
    pqe AS (
      SELECT vec_id, j, code FROM (
        SELECT e.vec_id, p.j, p.code,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id, p.j
                 ORDER BY {pq_l2sq_sql(sv, 'p.cvec')} ASC, p.code
               ) AS rk
        FROM embeddings e CROSS JOIN pqc p
      ) WHERE rk = 1)
    """


def ivfpq_encode_cte_sql(
    m: int = PQ_M, ksub: int = PQ_KSUB, dim: int = 64
) -> str:
    """DuckDB twin of ``ivfpq_encode`` with the seeded coarse codebook:
    CTE chain ending in ``ipqp`` (vec_id, cid, pq_code). Requires the
    caller's WITH to already define ``a`` (vec_id, cid — the seeded IVF
    assignment, the sim_bucket_stats _IVF_ASSIGN_CTE) and ``c``
    (cid, cvec — its centroid relation); the coarse width k is entirely
    the ``a``/``c`` CTEs' concern — this body never references it. Residuals, residual codebooks
    (the ksub lowest-id vectors' residuals, the pq_codebooks convention)
    and the argmin encode all mirror the Spark op order, so every double
    is bit-identical."""
    if ksub & (ksub - 1):
        raise ValueError(f"ksub must be a power of two for the packed shift, got {ksub}")
    bits = ksub.bit_length() - 1
    ds = dim // m
    sv = f"r.rvec[p.j*{ds}+1 : p.j*{ds}+{ds}]"
    return f"""
    ires AS (
      SELECT e.vec_id, a2.cid,
             list_transform(range({dim}),
               i -> CAST(e.embedding[i+1] AS DOUBLE)
                    - CAST(c2.cvec[i+1] AS DOUBLE)) AS rvec
      FROM embeddings e
      JOIN a a2 ON a2.vec_id = e.vec_id
      JOIN c c2 ON c2.cid = a2.cid),
    ipqc AS (
      SELECT j, vec_id AS code, rvec[j*{ds}+1 : j*{ds}+{ds}] AS cvec
      FROM ires CROSS JOIN (SELECT unnest(range(0, {m})) AS j)
      WHERE vec_id < {ksub}),
    ipqe AS (
      SELECT vec_id, cid, j, code FROM (
        SELECT r.vec_id, r.cid, p.j, p.code,
               ROW_NUMBER() OVER (
                 PARTITION BY r.vec_id, p.j
                 ORDER BY {pq_l2sq_sql(sv, 'p.cvec')} ASC, p.code
               ) AS rk
        FROM ires r CROSS JOIN ipqc p
      ) WHERE rk = 1),
    ipqp AS (
      SELECT vec_id, cid,
             CAST(SUM(code * (1 << ({bits} * j))) AS INTEGER) AS pq_code
      FROM ipqe GROUP BY vec_id, cid)
    """


def pq_adc_topk(
    emb: DataFrame,
    query_vec: list[float],
    codebooks: list[list[tuple[int, list[float]]]],
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k with exact rescore —
    the standard PQ search architecture:

    1. driver-side distance tables dt[j][code] = l2sq(q_sub_j, c_{j,code})
       (m*ksub doubles, inlined as literals);
    2. approximate distance per vector = sum_j dt[j][code_j] — pure array
       element_at over the PQ codes, no float vector math on the corpus;
    3. TakeOrdered the best ``rerank`` candidates by (adc, id);
    4. exact-cosine rescore of the candidates, top-k by (cos desc, id).

    Single stage, no shuffle, no Python; at 10^12 vectors step 2 touches
    2 bytes/vector instead of 256."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    ds = len(codebooks[0][0][1])
    dts = []
    for j in range(m):
        qsub = [float(x) for x in query_vec[j * ds : (j + 1) * ds]]
        row = []
        for code, cv in codebooks[j]:
            acc = 0.0
            for x, y in zip(qsub, cv):
                acc += (x - y) * (x - y)
            row.append(acc)
        dts.append(row)
    enc = pq_encode(emb, codebooks, vec_col=vec_col, codes_col="__codes")
    adc = F.lit(0.0)
    for j in range(m):
        table = F.array(*[F.lit(d) for d in dts[j]])
        adc = adc + F.element_at(table, F.element_at("__codes", j + 1) + 1)
    cand = (
        enc.withColumn("__adc", adc)
        .orderBy(F.asc("__adc"), F.col(id_col))
        .limit(rerank)
    )
    q = _lit_vec([float(x) for x in query_vec])
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias(
                "cos"
            ),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF index at rest: centroid-partitioned layout + file-pruned probes
# ---------------------------------------------------------------------------


def ivf_write_index(
    table,
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Materialize the IVF layout: vectors quantized (zero-shuffle
    literal-codebook argmax) then range-partitioned by ``centroid_id``
    so each data file covers a contiguous centroid range, and committed
    to a ManifestTable with centroid_id footer stats. This is the
    `bucket(centroid_id)` Iceberg layout made concrete: at 10^12
    vectors a probe of nprobe/k clusters reads nprobe/k of the FILES —
    the manifest prunes before Spark lists anything."""
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    laid_out = assigned.repartitionByRange(
        max(1, len(centroids)), F.col("centroid_id")
    )
    return table.append(laid_out, stats_cols=["centroid_id"])


def ivf_topk_indexed(
    table,
    spark,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "tuple[DataFrame, int, int]":
    """IVF top-k against the at-rest index: rank centroids driver-side,
    manifest-prune to the probed clusters' files, exact-score only what
    survives. Returns (result, files_read, files_total) so callers — and
    tests — can see the prune doing its job."""

    def cos_py(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    probes = sorted(
        cid
        for cid, _ in sorted(
            centroids, key=lambda c: (-cos_py(query_vec, c[1]), c[0])
        )[:nprobe]
    )
    total = len(table.files())
    paths: list[str] = []
    seen: set[str] = set()
    for cid in probes:
        for f in table.files(prune={"centroid_id": (cid, cid)}):
            if f.path not in seen:
                seen.add(f.path)
                paths.append(f.path)
    if not paths:
        # probed centroids own no files (empty clusters, or footer stats
        # pruned everything): empty top-k, not a read.parquet() crash
        empty = spark.createDataFrame([], f"{id_col} long, cos double")
        return empty, 0, total
    q = _lit_vec([float(x) for x in query_vec])
    cand = spark.read.parquet(*paths).filter(
        F.col("centroid_id").isin([int(c) for c in probes])
    )
    out = (
        cand.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias(
                "cos"
            ),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )
    return out, len(paths), total


# ---------------------------------------------------------------------------
# IVF-PQ: product quantization over coarse-cluster residuals
# ---------------------------------------------------------------------------


def _residual(vec: Column, centroids: list[tuple[int, list[float]]],
              cid_col: Column) -> Column:
    """v - centroid[cid], all literals: the centroid table is an
    array-of-arrays literal indexed by centroid id (ids are the dense
    0..k-1 seed ids by construction)."""
    table = F.array(*[_lit_vec(cv) for _, cv in sorted(centroids)])
    chosen = F.element_at(table, cid_col + 1)
    return F.zip_with(vec, chosen, lambda a, b: a - b)


def ivfpq_encode(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[tuple[int, list[float]]]]]:
    """The canonical billion-scale ANN layout (faiss IVFPQ): coarse
    cluster id + a PQ code of the RESIDUAL (v - centroid). Residuals
    concentrate near the origin, so the same 16-bit code budget spends
    its resolution inside the cluster instead of re-encoding the
    cluster's position — strictly more informative per bit than flat PQ.

    Zero shuffle end-to-end: assignment is the literal-codebook argmax,
    the residual is a zip_with against a literal centroid table, the PQ
    encode is the struct-min argmin — one projection over the scan.
    Residual codebooks are seeded from the ksub lowest-id vectors'
    residuals (the pq_codebooks convention — deterministic, so tests and
    engines reproduce the identical index).

    Returns (DataFrame[id, centroid_id, pq_code], residual codebooks)."""
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    res = _residual(
        F.col(vec_col).cast("array<double>"), centroids, F.col("centroid_id")
    )
    with_res = assigned.withColumn("__res", res)
    books = pq_codebooks(with_res, m, ksub, id_col, "__res")
    enc = pq_encode(with_res, books, vec_col="__res")
    return enc.drop("__res"), books


def ivfpq_topk(
    encoded: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFPQ search: rank centroids driver-side, build a PER-PROBED-
    CLUSTER ADC table from the query's residual against that cluster
    (the asymmetric part), approximate-distance only rows inside probed
    clusters, exact-cosine rescore of the best ``rerank``. The per-row
    table choice is a codegen'd CASE over nprobe literal tables."""

    def cos_py(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    cents = dict(centroids)
    probes = [
        cid
        for cid, _ in sorted(
            centroids, key=lambda c: (-cos_py(query_vec, c[1]), c[0])
        )[:nprobe]
    ]
    m = len(books)
    ksub = len(books[0])
    ds = len(books[0][0][1])

    def adc_tables(cid: int) -> list[list[float]]:
        qres = [float(x) - c for x, c in zip(query_vec, cents[cid])]
        out = []
        for j in range(m):
            sub = qres[j * ds : (j + 1) * ds]
            row = []
            for _, cv in books[j]:
                acc = 0.0
                for x, y in zip(sub, cv):
                    acc += (x - y) * (x - y)
                row.append(acc)
            out.append(row)
        return out

    cand = encoded.filter(F.col("centroid_id").isin([int(c) for c in probes]))
    # unpack code_j = (pq_code div ksub^j) % ksub, look up the probed
    # cluster's table
    adc = F.lit(0.0)
    for j in range(m):
        code_j = F.pmod(
            (F.col("pq_code") - F.pmod(F.col("pq_code"), F.lit(ksub**j)))
            / F.lit(ksub**j),
            F.lit(ksub),
        ).cast("int")
        expr = None
        for cid in probes:
            t = F.array(*[F.lit(d) for d in adc_tables(cid)[j]])
            branch = F.element_at(t, code_j + 1)
            expr = (
                F.when(F.col("centroid_id") == cid, branch)
                if expr is None
                else expr.when(F.col("centroid_id") == cid, branch)
            )
        adc = adc + expr
    short = (
        cand.withColumn("__adc", adc)
        .orderBy(F.asc("__adc"), F.col(id_col))
        .limit(rerank)
    )
    q = _lit_vec([float(x) for x in query_vec])
    return (
        short.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias(
                "cos"
            ),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Trained codebooks: k-means++ seeding + distributed Lloyd for IVF and PQ
# ---------------------------------------------------------------------------
# The seeded codebooks above stay as the DuckDB-oracle anchors (an oracle
# needs a closed-form codebook); the trained paths below are what a user
# points at a real corpus — recall governed by k-means++ + Lloyd instead
# of arbitrary low-id seeds. Quality is pinned by recall/objective
# assertions (tests + tools/eval_ann.py), not an SQL twin.


def _sample_vectors(
    emb: DataFrame,
    n: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic bounded driver sample: the n smallest xxhash64(id)
    rows (hash order is layout- and partitioning-independent, and
    orderBy+limit compiles to TakeOrdered — per-partition top-n + a
    driver merge, never a global sort). n*dim doubles on the driver:
    2048 x 64 = ~1 MB regardless of corpus size."""
    import numpy as np

    rows = (
        emb.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .orderBy(F.xxhash64(F.col("__id")), F.col("__id"))
        .limit(n)
        .collect()
    )
    return np.array([r["__v"] for r in rows], dtype=np.float64)


def _kmeanspp(X, k: int, seed: int = 13):
    """Classic k-means++ D^2 seeding (Arthur & Vassilvitskii 2007) on a
    driver-side sample — numpy, deterministic via the seed."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = len(X)
    if n <= k:
        reps = np.tile(X, (k // max(1, n) + 1, 1))
        return reps[:k].copy()
    first = int(rng.randint(n))
    chosen = [first]
    d2 = ((X - X[first]) ** 2).sum(axis=1)
    for _ in range(1, k):
        tot = float(d2.sum())
        if tot <= 0:
            nxt = int(rng.randint(n))
        else:
            nxt = int(rng.choice(n, p=d2 / tot))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(axis=1))
    return X[chosen].copy()


def ivf_trained_centroids(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    sample_n: int = 2048,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """TRAINED coarse codebook: k-means++ on a deterministic sample of
    row-normalized vectors (L2 k-means++ on the unit sphere == spherical/
    cosine seeding — ivf_assign's cosine argmax is scale-invariant), then
    ``iters`` exact distributed Lloyd passes over the FULL corpus
    (lloyd_refine: one k*dim int64 partial-sum exchange per pass).

    Drop-in for ivf_centroids everywhere a codebook is consumed
    (ivf_assign/ivf_topk/ivf_write_index/ivfpq_*)."""
    import numpy as np

    X = _sample_vectors(emb, sample_n, id_col, vec_col)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    Xn = np.divide(X, norms, out=np.zeros_like(X), where=norms > 0)
    seeds = _kmeanspp(Xn, k, seed)
    cents = [(i, [float(x) for x in seeds[i]]) for i in range(k)]
    for _ in range(iters):
        cents = lloyd_refine(emb, cents, id_col=id_col, vec_col=vec_col)
    return cents


def pq_lloyd_refine(
    emb: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """One exact Lloyd iteration over ALL PQ subspaces in a single
    distributed pass: encode with the current books (pq_encode — zero
    shuffle), explode each row into m narrow (subspace, code, subvector)
    records, then ONE map-side-combined aggregation keyed on
    (subspace, code) — m*ksub groups of ds fixed-point int64 sums, a
    driver-sized result independent of corpus size. Empty codes keep
    their previous centroid (the lloyd_refine convention)."""
    m = len(codebooks)
    ds = len(codebooks[0][0][1])
    enc = pq_encode(emb, codebooks, vec_col=vec_col, codes_col="__codes")
    fx = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * LLOYD_SCALE).cast("long"),
    )
    sub_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.element_at("__codes", j + 1).alias("code"),
                F.slice(F.col("__fx"), j * ds + 1, ds).alias("sv"),
            )
            for j in range(m)
        ]
    )
    rows = (
        enc.withColumn("__fx", fx)
        .select(F.explode(sub_structs).alias("e"))
        .select(
            "e.j",
            "e.code",
            *[F.element_at("e.sv", i + 1).alias(f"x{i}") for i in range(ds)],
        )
        .groupBy("j", "code")
        .agg(
            F.count("*").alias("n"),
            *[F.sum(f"x{i}").alias(f"s{i}") for i in range(ds)],
        )
        .collect()
    )
    means = {
        (int(r["j"]), int(r["code"])): [
            r[f"s{i}"] / (r["n"] * float(LLOYD_SCALE)) for i in range(ds)
        ]
        for r in rows
    }
    return [
        [(code, means.get((j, code), cv)) for code, cv in codebooks[j]]
        for j in range(m)
    ]


def pq_train_codebooks(
    emb: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 2,
    sample_n: int = 2048,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """TRAINED per-subspace PQ codebooks: k-means++ seeds each subspace
    on the deterministic sample (raw L2 — PQ quantizes raw subvectors),
    then ``iters`` pq_lloyd_refine passes over the full corpus. Drop-in
    for pq_codebooks in pq_encode/pq_adc_topk."""
    X = _sample_vectors(emb, sample_n, id_col, vec_col)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    books = []
    for j in range(m):
        seeds = _kmeanspp(X[:, j * ds : (j + 1) * ds], ksub, seed + j)
        books.append(
            [(c, [float(x) for x in seeds[c]]) for c in range(ksub)]
        )
    for _ in range(iters):
        books = pq_lloyd_refine(emb, books, vec_col=vec_col)
    return books


def ivfpq_encode_trained(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 2,
    sample_n: int = 2048,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "tuple[DataFrame, list[list[tuple[int, list[float]]]]]":
    """ivfpq_encode with TRAINED residual codebooks: the PQ books are
    k-means++ + Lloyd over the residuals (v - assigned centroid) — the
    faiss IVFPQ training recipe — instead of low-id seeds. Same zero-
    shuffle encode; searchable with the unchanged ivfpq_topk."""
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    res = _residual(
        F.col(vec_col).cast("array<double>"), centroids, F.col("centroid_id")
    )
    with_res = assigned.withColumn("__res", res)
    books = pq_train_codebooks(
        with_res, m, ksub, iters, sample_n, seed, id_col, "__res"
    )
    enc = pq_encode(with_res, books, vec_col="__res")
    return enc.drop("__res"), books


def pq_distortion(
    emb: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    vec_col: str = "embedding",
) -> float:
    """Mean total squared quantization error (sum over subspaces of
    l2sq(subvector, chosen code)) — the k-means objective PQ training
    minimizes; lets tests assert trained <= seeded without an oracle.
    One partial-agg'd mean, no shuffle of payloads."""
    m = len(codebooks)
    ds = len(codebooks[0][0][1])
    v = F.col(vec_col).cast("array<double>")
    total = F.lit(0.0)
    for j in range(m):
        sub = F.slice(v, j * ds + 1, ds)
        scored = F.array(
            *[
                F.struct(
                    _l2sq(sub, _lit_vec(cv)).alias("d"),
                    F.lit(code).alias("code"),
                )
                for code, cv in codebooks[j]
            ]
        )
        total = total + F.array_min(scored)["d"]
    return float(emb.select(F.avg(total)).first()[0])


def ivf_objective(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> float:
    """Mean cosine of every vector to its assigned centroid — the
    spherical k-means objective (higher is better)."""
    v = F.col(vec_col).cast("array<double>")
    best = F.array_max(
        F.array(*[cosine(v, _lit_vec(cv)) for _, cv in centroids])
    )
    return float(emb.select(F.avg(best)).first()[0])
