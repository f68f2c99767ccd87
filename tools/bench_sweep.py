"""Config sweep for the N-vs-4N scaling gate (north rule: throughput
scaling efficiency >= 0.8 going N -> 4N; sandbox pair local[8] vs
local[32] per driver instruction).

Round-2 evidence (BENCH/BASELINE.md) put raw efficiency at 0.550-0.695
with the gap dominated by 32-thread memory/GC pressure on a shared VM.
This harness attacks the raw number: each candidate config runs a full
8-vs-32 bench.py pair (taskset-pinned, fresh JVM per level) and reports
per-stage efficiency + task CPU inflation, so a config that genuinely
relieves the 32-thread bottleneck (GC strategy, off-heap execution
memory, partition count, shuffle compression) is visible as raw
efficiency, not guessed.

Usage: python tools/bench_sweep.py [configs...]   (default: all)
Writes one JSON line per pair to BENCH/sweep.jsonl (append).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS: dict[str, dict] = {
    "baseline": {},
    "parallel_gc": {
        "conf": {"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"}
    },
    "offheap16g": {
        "conf": {
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": "16g",
        }
    },
    "parallel_gc_offheap": {
        "conf": {
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": "16g",
        }
    },
    "parts64": {"env": {"SPARK_GRAFT_PARTITIONS": "64"}},
    "parts256": {"env": {"SPARK_GRAFT_PARTITIONS": "256"}},
    "compress_on": {"env": {"SPARK_GRAFT_SHUFFLE_COMPRESS": "true"}},
}


def run(cpus: int, spec: dict, iters: int, replicate: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_ITERS=str(iters),
        SPARK_GRAFT_REPLICATE=str(replicate),
        SPARK_GRAFT_EXTRA_CONF=json.dumps(spec.get("conf", {})),
        **spec.get("env", {}),
    )
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
         os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    names = sys.argv[1:] or list(CONFIGS)
    iters = int(os.environ.get("SWEEP_ITERS", "2"))
    replicate = int(os.environ.get("SWEEP_REPLICATE", "100"))
    out_path = os.path.join(REPO, "BENCH", "sweep.jsonl")
    for name in names:
        spec = CONFIGS[name]
        r8 = run(8, spec, iters, replicate)
        r32 = run(32, spec, iters, replicate)
        effs = {
            k: round(r8["queries"][k] / (4 * r32["queries"][k]), 3)
            for k in r8["queries"]
        }
        rec = {
            "config": name,
            "eff": effs,
            "t8": r8["queries"],
            "t32": r32["queries"],
            "cpu_inflation_full": round(
                r32["full_task_cpu_ms"] / max(1, r8["full_task_cpu_ms"]), 2
            ),
            "steal8": r8["env"]["steal_pct_of_busy"],
            "steal32": r32["env"]["steal_pct_of_busy"],
            "load8": r8["env"]["load_start"],
            "load32": r32["env"]["load_start"],
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
