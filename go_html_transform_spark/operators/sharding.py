"""Deterministic sharding + reproducible corpus shuffle — the two
training-data layout ops every large-scale pipeline needs downstream of
dedup/filtering:

* ``assign_shards`` — a stable shard id per document, independent of
  physical partitioning, cluster size, or row order, so a re-run (or a
  resumed run, plans/lineage.py) routes every document to the same shard.
* ``deterministic_shuffle`` — a reproducible pseudo-random global
  permutation of the corpus (training wants shuffled data; reproducible
  experiments want the SAME shuffle every run). Implemented as
  ``orderBy(h)`` over a seeded hash: Spark executes that as a
  range-partitioned sort (sampled range boundaries + per-partition local
  sort) — a parallel, spill-safe global order, never a single-node sort.

Hashes use the MinHash affine family ((k*a+b) mod P, every term exact in
int64 — plans/lineage.py:affine_digest), so shard assignment has an
exact DuckDB twin and is verified in the dedup_signatures oracle query.
Reference: the engine-added layout layer has no go-html-transform
counterpart (the reference is single-document; SURVEY §2.8 ordering is
the closest analogue).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_html_transform_spark.operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P


def _seeded_const(seed: int) -> tuple[int, int]:
    # distinct odd multiplier + offset per seed, same derivation both engines
    return (2 * seed + 1) * MINHASH_A % MINHASH_P, seed * MINHASH_B % MINHASH_P


def shuffle_hash(key_num: Column, seed: int = 0) -> Column:
    """Seeded affine permutation hash over a NUMERIC key: exact int64 in
    any engine, uniform enough for range-partitioned sorting."""
    a, b = _seeded_const(seed)
    return ((key_num.cast("long") % MINHASH_P) * a + b) % MINHASH_P


def shuffle_hash_py(key_num: int, seed: int = 0) -> int:
    """Pure-python twin (tests + driver-side shard planning)."""
    a, b = _seeded_const(seed)
    return ((key_num % MINHASH_P) * a + b) % MINHASH_P


def shuffle_hash_sql(key_num: str, seed: int = 0) -> str:
    a, b = _seeded_const(seed)
    return f"(((CAST({key_num} AS BIGINT) % {MINHASH_P}) * {a} + {b}) % {MINHASH_P})"


def assign_shards(
    df: DataFrame, key_num: Column, n_shards: int, seed: int = 0
) -> DataFrame:
    """Add a stable ``shard`` column in [0, n_shards). Shard-ids depend
    only on (key, seed) — never on partitioning or order — so sharded
    output layouts are resumable and re-runnable byte-for-byte."""
    return df.withColumn(
        "shard", F.pmod(shuffle_hash(key_num, seed), F.lit(n_shards)).cast("int")
    )


def assign_shards_sql(key_num: str, n_shards: int, seed: int = 0) -> str:
    return f"CAST({shuffle_hash_sql(key_num, seed)} % {n_shards} AS INTEGER)"


def deterministic_shuffle(
    df: DataFrame, key_num: Column, seed: int = 0
) -> DataFrame:
    """Reproducible global permutation: sort by the seeded hash with the
    key itself as tie-break (identical hash values cannot reorder across
    runs). Spark plans this as Exchange rangepartitioning + local Sort —
    fully parallel; at 10^12 rows prefer writing the result through
    ``assign_shards`` + sortWithinPartitions(shard-local hash) to skip
    the global range exchange when only within-shard order matters."""
    h = shuffle_hash(key_num, seed)
    return df.orderBy(h, key_num.cast("long"))
