"""A/B: off-heap Tungsten + off-heap parquet column vectors vs default
heap, on the replay bench (round-3 memory-bandwidth experiment,
VERDICT r2 next-5). Interleaved order (A,B,B,A per parallelism) to
de-confound environmental drift; /proc/stat steal%% recorded per run.

Usage: TMPDIR=/dev/shm DPS_DRIVER_MEM=48g python scripts/offheap_ab.py \
    [n_events] [samples]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_stat():
    parts = open("/proc/stat").readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[3] + vals[4], vals[7] if len(vals) > 7 else 0


def run_once(cpus: int, n_events: int, offheap: str | None) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(cpus),
        "DPS_BENCH_EVENTS": str(n_events),
        "DPS_BENCH_BUCKETS": "32",
        "DPS_BENCH_SEGMENTS": os.environ.get("DPS_BENCH_SEGMENTS", "4"),
        "DPS_BENCH_REPLAY_ONLY": "1",
        "DPS_BENCH_MODE": "cow",
        "DPS_BENCH_CACHE_DIR": os.environ.get(
            "DPS_BENCH_CACHE_DIR", "/tmp/dps_bench_cache"
        ),
        "PYTHONPATH": REPO,
    }
    # bench.py now DEFAULTS to DPS_OFFHEAP=20g (setdefault), so the
    # baseline arm must override with an explicit "0" — popping the
    # var would silently run the "off" arm WITH off-heap and null the
    # comparison
    env["DPS_OFFHEAP"] = offheap if offheap else "0"
    t0, i0, s0 = cpu_stat()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    t1, i1, s1 = cpu_stat()
    lines = out.stdout.strip().splitlines()
    if not lines:
        raise RuntimeError(f"no output rc={out.returncode}\n{out.stderr[-2000:]}")
    r = json.loads(lines[-1])
    dt = max(t1 - t0, 1)
    r["steal_pct"] = round(100.0 * (s1 - s0) / dt, 2)
    r["idle_pct"] = round(100.0 * (i1 - i0) / dt, 2)
    return r


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    results: dict[tuple, list] = {}
    for cpus in (32, 8):
        order = []
        for _ in range(samples):
            order += [None, "24g"] if len(order) % 4 == 0 else ["24g", None]
        for oh in order:
            key = (cpus, bool(oh))
            r = run_once(cpus, n_events, oh)
            results.setdefault(key, []).append(r)
            print(
                f"local[{cpus}] offheap={bool(oh)}: "
                f"{r['replay_events_per_sec']:,.0f} ev/s "
                f"({r['replay_sec']}s, steal {r['steal_pct']}%, "
                f"idle {r['idle_pct']}%)",
                flush=True,
            )
    print("\nsummary (best | median):")
    import statistics

    for key, rs in sorted(results.items()):
        vs = [r["replay_events_per_sec"] for r in rs]
        print(
            f"local[{key[0]}] offheap={key[1]}: best {max(vs):,.0f} | "
            f"median {statistics.median(vs):,.0f} ev/s | steal "
            f"{[r['steal_pct'] for r in rs]}"
        )
    print(time.strftime("%Y-%m-%d %H:%M:%S"))


if __name__ == "__main__":
    main()
