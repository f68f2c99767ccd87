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
    # round-4 re-measurement label: identical spec to baseline, but the
    # as-of union window now sorts on the packed (micros*2+tag) long key
    # (operators/asof.py) — keep its rows separate so fits never mix
    # pre- and post-pack timings under one config name.
    "r4_packed": {},
    # final round-4 label: same spec, measured AFTER the NULL-group
    # side-tag + numeric-time fallback fix landed on the packed-key sort
    # (commit 09fce47) — the tag rides as a second order column, which
    # only the comparator on prefix-equal rows ever reads, but the fit
    # population must not mix pre- and post-fix binaries.
    "r4_final": {},
    # round-5 label: same spec as r4_final (the bench pipeline's own
    # stages are untouched this round); rows carry the new per-stage
    # cpu_inflation_stage field so the eff x inflation ~ 1.0 hardware
    # attribution is checkable per stage at rep=600.
    "r5_final": {},
}


def wait_quiet(max_wait: int = 1200, load_thresh: float = 1.5) -> None:
    """Block until the box's 1-min load (excluding us — nothing of ours
    runs between levels) drops under ``load_thresh``. The shared VM's
    ambient tenants produce load spikes of 10-25 that poison a level;
    starting into one wastes the whole pair."""
    import time

    t0 = time.time()
    while time.time() - t0 < max_wait:
        load1 = os.getloadavg()[0]
        if load1 < load_thresh:
            return
        time.sleep(20)
    print(f"# wait_quiet: still loaded after {max_wait}s, proceeding",
          flush=True)


def run(cpus: int, spec: dict, iters: int, replicate: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_ITERS=str(iters),
        SPARK_GRAFT_REPLICATE=str(replicate),
        SPARK_GRAFT_EXTRA_CONF=json.dumps(spec.get("conf", {})),
        **spec.get("env", {}),
    )

    def once() -> dict:
        wait_quiet()
        out = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
             os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        )
        line = [
            l for l in out.stdout.strip().splitlines() if l.startswith("{")
        ][-1]
        return json.loads(line)

    # retry a level whose window got contaminated (hypervisor steal or an
    # ambient tenant) — keep the cleanest attempt
    attempts = []
    for i in range(int(os.environ.get("SWEEP_RETRIES", "2")) + 1):
        r = once()
        e = r["env"]
        # clean window: negligible hypervisor steal AND the end-of-run
        # load is explainable by our own threads (ambient tenants show
        # up as load far above the level's core count)
        ambient = max(0.0, e["load_end"][0] - cpus)
        clean = e["steal_pct_of_busy"] < 3.0 and ambient < cpus * 0.5 + 2
        attempts.append((e["steal_pct_of_busy"] + ambient, r))
        print(
            f"# level {cpus}: attempt {i} steal={e['steal_pct_of_busy']} "
            f"load_end={e['load_end'][0]} full={r['queries']['full_pipeline']}",
            flush=True,
        )
        if clean:
            return r
    return min(attempts, key=lambda t: t[0])[1]


def main() -> None:
    names = sys.argv[1:] or list(CONFIGS)
    iters = int(os.environ.get("SWEEP_ITERS", "2"))
    replicate = int(os.environ.get("SWEEP_REPLICATE", "100"))
    lo, hi = (
        int(x) for x in os.environ.get("SWEEP_PAIR", "8,32").split(",")
    )
    out_path = os.path.join(REPO, "BENCH", "sweep.jsonl")
    for name in names:
        spec = CONFIGS[name]
        r8 = run(lo, spec, iters, replicate)
        r32 = run(hi, spec, iters, replicate)
        effs = {
            k: round(r8["queries"][k] / (4 * r32["queries"][k]), 3)
            for k in r8["queries"]
        }
        rec = {
            "config": name,
            "pair": f"{lo}v{hi}",
            "replicate": replicate,
            "iters": iters,
            "eff": effs,
            "t_lo": r8["queries"],
            "t_hi": r32["queries"],
            "cpu_inflation_full": round(
                r32["full_task_cpu_ms"] / max(1, r8["full_task_cpu_ms"]), 2
            ),
            # per-stage task-CPU inflation hi/lo: eff x inflation ~ 1.0
            # means the raw loss is hardware slowdown (busy-but-slower
            # cores), not scheduling — the probe_membus signature, now
            # checkable per stage at any replicate
            "cpu_inflation_stage": {
                k: round(
                    r32["stage_tasks"][k]["task_cpu_ms"]
                    / max(1.0, r8["stage_tasks"][k]["task_cpu_ms"]),
                    2,
                )
                for k in r8.get("stage_tasks", {})
                if k in r32.get("stage_tasks", {})
            },
            "steal_lo": r8["env"]["steal_pct_of_busy"],
            "steal_hi": r32["env"]["steal_pct_of_busy"],
            "load_lo": r8["env"]["load_start"],
            "load_hi": r32["env"]["load_start"],
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
