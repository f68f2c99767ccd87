"""Deterministic sampling + source mixing — the corpus-composition ops a
training-data pipeline runs after dedup/filtering:

* ``sample_flag`` / ``sample_deterministic`` — seeded Bernoulli keep
  decision per document, a pure function of (key, seed). Unlike
  ``df.sample()`` the decision is independent of partitioning, task
  retries, and cluster size, so a resumed or re-run job keeps exactly the
  same rows — and the SQL twin makes the decision oracle-checkable.
* ``stratified_sample`` — per-stratum keep rates (e.g. downsample crawl
  text to 10% while keeping all code), one map-literal lookup, no join.
* ``mix_weights_to_rates`` — driver-side math that converts target mix
  WEIGHTS (e.g. web .5, code .3, wiki .2) + observed per-stratum counts
  into per-stratum keep rates, never up-sampling (rate is capped at
  keep-everything; the binding stratum keeps 100%).

Scale shape: sampling is a stateless per-row filter — no shuffle, no
join, fully pushed into the scan stage; stratified rates ride a literal
map so the plan stays whole-stage-codegen. The oracle-checkable variate
composes two affine hashes (family of operators/sharding.py) into a
~2^38-range value; because the family reduces keys mod P = 524287 the
decision granularity is ~2 ppm and keys congruent mod P share a
decision — the production path (``sample_flag_production``) uses
xxhash64's full 64 bits instead, the same default/oracle split as
plans/lineage.py.

Reference analogue: none (the reference is single-document); this is the
engine-added corpus-composition layer alongside operators/sharding.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_html_transform_spark.operators.dedup import MINHASH_P
from go_html_transform_spark.operators.sharding import shuffle_hash, shuffle_hash_sql

PPM = 1_000_000


def _uniform_ppm(key_num: Column, seed: int) -> Column:
    """Seeded uniform variate in [0, 1_000_000): two independent affine
    hashes composed into [0, P^2) ~ 2^38 then reduced — every term exact
    in int64 (P = 524287, h1*P + h2 < 2^38)."""
    h1 = shuffle_hash(key_num, seed)
    h2 = shuffle_hash(key_num, seed + 1_000_003)
    return (h1 * MINHASH_P + h2) % PPM


def _uniform_ppm_sql(key_num: str, seed: int) -> str:
    h1 = shuffle_hash_sql(key_num, seed)
    h2 = shuffle_hash_sql(key_num, seed + 1_000_003)
    return f"(({h1} * {MINHASH_P} + {h2}) % {PPM})"


def sample_flag(key_num: Column, rate_ppm: int, seed: int = 0) -> Column:
    """Boolean keep decision at rate_ppm parts-per-million."""
    return _uniform_ppm(key_num, seed) < F.lit(int(rate_ppm))


def sample_flag_sql(key_num: str, rate_ppm: int, seed: int = 0) -> str:
    return f"({_uniform_ppm_sql(key_num, seed)} < {int(rate_ppm)})"


def sample_flag_production(key: Column, rate_ppm: int, seed: int = 0) -> Column:
    """Production twin of ``sample_flag`` on ``xxhash64`` (full 64-bit
    avalanche — no P-residue key classes; same xxhash64-default /
    affine-oracle split as plans/lineage.py). No DuckDB twin, so the
    oracle-checked path is the affine variant."""
    return F.pmod(F.xxhash64(key, F.lit(int(seed))), F.lit(PPM)) < F.lit(
        int(rate_ppm)
    )


def sample_deterministic(
    df: DataFrame, key_num: Column, rate_ppm: int, seed: int = 0
) -> DataFrame:
    """Keep ~rate_ppm/1e6 of rows, decided per-key: stable across
    partitioning, retries and re-runs (same key+seed -> same decision)."""
    return df.filter(sample_flag(key_num, rate_ppm, seed))


def stratified_sample(
    df: DataFrame,
    key_num: Column,
    strata_col: str,
    rates_ppm: dict[str, int],
    default_ppm: int = PPM,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum keep rates via one literal map lookup — no join, the
    filter stays inside the scan's codegen stage."""
    pairs: list[Column] = []
    for k, v in sorted(rates_ppm.items()):
        pairs += [F.lit(k), F.lit(int(v))]
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col))
        if pairs
        else F.lit(None).cast("int"),
        F.lit(int(default_ppm)),
    )
    return df.filter(_uniform_ppm(key_num, seed) < rate)


def stratified_sample_sql(
    key_num: str,
    strata_col: str,
    rates_ppm: dict[str, int],
    default_ppm: int = PPM,
    seed: int = 0,
) -> str:
    """DuckDB twin of the stratified keep predicate."""
    cases = " ".join(
        f"WHEN '{k}' THEN {int(v)}" for k, v in sorted(rates_ppm.items())
    )
    rate = f"(CASE {strata_col} {cases} ELSE {int(default_ppm)} END)"
    return f"({_uniform_ppm_sql(key_num, seed)} < {rate})"


def mix_weights_to_rates(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, int]:
    """Convert target mix weights + observed per-stratum counts into
    per-stratum keep rates (ppm), downsample-only: the stratum whose
    supply is scarcest relative to its weight keeps 100% and every other
    stratum is trimmed to match its proportion. Driver-side math over the
    (tiny) per-stratum count dict — never a corpus op."""
    active = {k: w for k, w in weights.items() if w > 0 and counts.get(k, 0) > 0}
    if not active:
        return {k: 0 for k in weights}
    # total output size is bound by the scarcest stratum: T = min(c_k / w_k)
    total = min(counts[k] / w for k, w in active.items())
    rates = {}
    for k in weights:
        if k not in active:
            rates[k] = 0
        else:
            rates[k] = min(PPM, round(total * active[k] / counts[k] * PPM))
    return rates


# ---------------------------------------------------------------------------
# deterministic train/val/test split assignment
# ---------------------------------------------------------------------------


def assign_split(
    key_num: Column,
    val_ppm: int = 10_000,
    test_ppm: int = 10_000,
    seed: int = 0,
) -> Column:
    """'train' | 'val' | 'test' from the same per-key uniform the
    sampling layer uses: u < val_ppm -> val, u < val_ppm+test_ppm ->
    test, else train. Deterministic per key (stable under partitioning,
    retries, re-runs — a document can never leak between splits across
    pipeline versions), disjoint and exhaustive by construction, and one
    codegen'd CASE — no shuffle, no join.

    Eval-set hygiene note: held-out splits get the same key-hash
    treatment as sampling, so near-duplicate leakage across splits is
    handled UPSTREAM by dedup/decontaminate — split assignment must stay
    a pure function of the canonical doc key."""
    u = _uniform_ppm(key_num, seed)
    return (
        F.when(u < F.lit(int(val_ppm)), F.lit("val"))
        .when(u < F.lit(int(val_ppm + test_ppm)), F.lit("test"))
        .otherwise(F.lit("train"))
    )


def assign_split_sql(
    key_num: str,
    val_ppm: int = 10_000,
    test_ppm: int = 10_000,
    seed: int = 0,
) -> str:
    u = _uniform_ppm_sql(key_num, seed)
    return (
        f"(CASE WHEN {u} < {int(val_ppm)} THEN 'val' "
        f"WHEN {u} < {int(val_ppm + test_ppm)} THEN 'test' "
        f"ELSE 'train' END)"
    )
