"""End-to-end corpus-preparation bench at REALISTIC scale.

VERDICT r4 next-round #8: prepare.py's full recipe was stage-parity
tested at fixture scale only. This tool runs the default recipe on a
100k-doc 32k-vocab Zipf corpus rendered as TEXT documents (so every
stage — quality scoring, exact dedup on text, minhash near-dup,
sharding — does real work at production-shaped candidate rates) and
reports:

* ``stats_off_sec`` — the production mode (collect_stats=False): one
  job, no intermediate corpus passes.
* ``stage_sec`` — per-stage wall at each stats barrier
  (collect_stats=True + prepare's ``stage_times`` hook): with the
  recipe's persist points, the delta at barrier k is ONLY stage k's
  new work.
* ``single_execution_overhead`` — (sum of stage barriers) /
  stats_off_sec: close to 1.0 == the composition holds its per-op
  numbers and nothing recomputes (the measured form of the recipe's
  single-execution discipline).

Usage: python tools/bench_prepare.py [n_docs]   (default 100000)
Prints one JSON line; paste into BENCH/OPS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    from pyspark.sql import functions as F

    from go_html_transform_spark.plans.prepare import (
        prepare_training_corpus,
        release_training_corpus,
    )
    from go_html_transform_spark.session import get_spark
    from go_html_transform_spark.sources import synth as Z

    spark = get_spark(
        app_name="bench-prepare",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_PARTITIONS", "128")),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
            # compression ON (unlike the shuffle-micro benches): the
            # recipe's near-dup verify stage shuffles candidate-pair
            # token arrays whose uncompressed volume on the tmpfs local
            # dir competes with the JVM for the SAME physical RAM —
            # 100k zipf docs OOM-killed the driver uncompressed
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Render the Zipf corpus as a documents table: text = space-joined
    # zipf token words (documents_tokenized re-derives ids from the
    # text, preserving the vocabulary shape), round-robin sources for
    # the sharding/mix stages.
    tmp = tempfile.mkdtemp(prefix="ghts_prep_bench_")
    try:
        docs = Z.zipf_documents(spark, n_docs, vocab_size=32_768, avg_len=200)
        (
            docs.select(
                F.col("doc_key").alias("doc_id"),
                F.concat_ws(
                    " ", F.transform(F.col("tokens"), lambda t: F.concat(F.lit("w"), t))
                ).alias("text"),
                F.lit("xx").alias("lang"),
                F.concat(F.lit("s"), F.pmod(F.col("doc_key"), F.lit(5))).alias(
                    "source"
                ),
            )
            .withColumn("n_chars", F.length("text"))
            .repartition(64)
            .write.parquet(os.path.join(tmp, "documents.parquet"))
        )

        kwargs = dict(
            min_quality_ppm=0,  # synthetic words carry no stopwords
            lang=None,
            # shingle-set Jaccard of a 5%-perturbed copy is ~0.75
            # ((1-p)^3 shingle survival, inclusion-exclusion), while
            # unrelated docs sit near 0 — 0.6 splits them with margin
            jaccard_threshold=0.6,
            n_shards=64,
            # production knobs: shingle-set near-dup signal (raw-token
            # minhash degenerates on a Zipf head — see
            # ngram_near_duplicates) + the band-bucket size guard;
            # recall on the planted dups reported below
            near_dup_on="shingles3",
            lsh_max_bucket=4096,
        )

        # warmup pass (codegen/Arrow/JIT): the FIRST pipeline execution
        # on a fresh JVM measured 2x slower than the second on identical
        # data — run one throwaway before any timed run
        warm, _ = prepare_training_corpus(
            spark, tmp, collect_stats=False, **kwargs
        )
        warm.count()
        release_training_corpus(warm)

        t0 = time.perf_counter()
        out, _ = prepare_training_corpus(
            spark, tmp, collect_stats=False, **kwargs
        )
        n_off = out.count()
        stats_off = round(time.perf_counter() - t0, 2)
        release_training_corpus(out)

        stage_times: dict[str, float] = {}
        t0 = time.perf_counter()
        out2, stats = prepare_training_corpus(
            spark, tmp, collect_stats=True, stage_times=stage_times, **kwargs
        )
        n_on = out2.count()
        stats_on = round(time.perf_counter() - t0, 2)
        release_training_corpus(out2)

        assert n_on == n_off, (n_on, n_off)
        barrier_sum = round(sum(stage_times.values()), 2)

        # near-dedup recall on the PLANTED structure: doc_key % 20 == 1
        # is a near-copy of doc_key-1 (sources/synth.py) — a recalled
        # dup is one the recipe REMOVED from the final corpus
        out3, _ = prepare_training_corpus(
            spark, tmp, collect_stats=False, **kwargs
        )
        planted = n_docs // 20  # doc_key % 20 == 1, doc_key > 0 -> floor
        survivors = out3.filter(
            (F.col("doc_key") % 20 == 1) & (F.col("doc_key") > 0)
        ).count()
        release_training_corpus(out3)
        dup_recall = round(1.0 - survivors / max(1, planted), 4)
        print(
            json.dumps(
                {
                    "metric": "prepare.py default recipe end-to-end "
                    "(32k-vocab zipf text corpus)",
                    "n_docs": n_docs,
                    "prepared_rows": n_off,
                    "stats_off_sec": stats_off,
                    "stats_on_sec": stats_on,
                    "stage_sec": stage_times,
                    "stage_counts": {
                        k: v for k, v in stats.items() if isinstance(v, int)
                    },
                    "barrier_sum_sec": barrier_sum,
                    "single_execution_overhead": round(
                        barrier_sum / max(stats_off, 1e-9), 3
                    ),
                    "docs_per_sec": round(n_docs / stats_off, 1),
                    "planted_dup_removal_recall": dup_recall,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
