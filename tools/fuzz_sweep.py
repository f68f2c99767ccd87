"""Multi-seed randomized-equivalence sweep for the selector/match core.

tests/test_randomized_equivalence.py proves the compiled chain matcher
equals an independent pure-Python reference on ONE seeded corpus and a
fixed 9-spec list. This tool widens both axes: fresh random corpora per
seed AND randomly GENERATED rule specs (tags, optional pseudo-classes,
1-3 links over all four combinators), evaluating every spec of a seed in
ONE DataFrame pass (the positions columns batch into a single
projection, so a 36-spec seed costs one collect).

Usage: python tools/fuzz_sweep.py [n_seeds] [n_specs_per_seed]
Prints one JSON line; exits non-zero on any divergence, printing every
(seed, spec, doc, got, want) counterexample first.
"""

from __future__ import annotations

import json
import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

VOCAB = 8
N_DOCS = 400
MAX_LEN = 24
COMBS = [" ", " > ", " + ", " ~ "]
PSEUDOS = [":first-child", ":last-child", ":only-child"]


def gen_spec(rng: random.Random) -> str:
    def seq() -> str:
        s = f"t{rng.randrange(VOCAB)}"
        if rng.random() < 0.3:
            s += rng.choice(PSEUDOS)
        return s

    out = seq()
    for _ in range(rng.randrange(0, 3)):
        out += rng.choice(COMBS).replace("  ", " ") + seq()
    return out


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n_specs = int(sys.argv[2]) if len(sys.argv) > 2 else 36

    from pyspark.sql import functions as F

    from go_html_transform_spark.plans.parser import parse_rule
    from go_html_transform_spark.plans.rules import compile_chain
    from go_html_transform_spark.session import get_spark
    from test_randomized_equivalence import py_positions

    spark = get_spark(app_name="fuzz-sweep", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    total_specs = 0
    total_checks = 0
    failures: list[tuple] = []
    for seed in range(n_seeds):
        rng = random.Random(seed * 2654435761 + 17)
        rows = [
            (
                i,
                [rng.randrange(VOCAB) for _ in range(rng.randrange(0, MAX_LEN))],
            )
            for i in range(N_DOCS)
        ]
        df = spark.createDataFrame(rows, "id int, tokens array<int>")
        specs = sorted({gen_spec(rng) for _ in range(n_specs)})
        cols = [
            compile_chain(
                parse_rule(s), attrs=None, doc_id=F.lit("x"), source=F.lit("s")
            ).positions.alias(f"p{j}")
            for j, s in enumerate(specs)
        ]
        got = {r["id"]: r for r in df.select("id", *cols).collect()}
        for j, s in enumerate(specs):
            total_specs += 1
            for i, toks in rows:
                total_checks += 1
                g = list(got[i][f"p{j}"])
                w = py_positions(toks, s)
                if g != w:
                    failures.append((seed, s, i, toks, g, w))
    for f in failures[:20]:
        print("DIVERGENCE", f, file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "selector-engine fuzz sweep vs python reference",
                "seeds": n_seeds,
                "specs": total_specs,
                "doc_checks": total_checks,
                "divergences": len(failures),
            }
        )
    )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
