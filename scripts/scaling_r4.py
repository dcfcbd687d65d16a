"""Round-4 scaling-matrix re-run, APPENDED to BENCH/BASELINE.md.

Same methodology as scripts/scaling_final.py (interleaved 8,32,32,8
order per write mode, identical cached input in every cell, per-run
/proc/stat steal%/idle%), but appends a dated round-4 section instead
of rewriting the ledger (scaling_final.py regenerates the whole file,
which would drop the round-4 engineering-log entries).

Usage:
  TMPDIR=/dev/shm DPS_DRIVER_MEM=48g python scripts/scaling_r4.py \
      [n_events] [samples_per_cell]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_final import run_once  # noqa: E402


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cells: dict[tuple[str, int], list[dict]] = {}
    order = []
    for mode in ("cow", "mor"):
        seq = [8, 32, 32, 8] * ((samples + 1) // 2)
        for c in seq[: samples * 2]:
            order.append((mode, c))
    for mode, cpus in order:
        r = run_once(cpus, n_events, mode)
        cells.setdefault((mode, cpus), []).append(r)
        print(
            f"{mode} local[{cpus}]: {r['replay_events_per_sec']:,.0f} ev/s "
            f"({r['replay_sec']}s, steal {r['steal_pct']}%, idle {r['idle_pct']}%)",
            flush=True,
        )

    best = {k: max(x["replay_events_per_sec"] for x in v) for k, v in cells.items()}
    med = {
        k: statistics.median(x["replay_events_per_sec"] for x in v)
        for k, v in cells.items()
    }
    eff_best = {m: (best[(m, 32)] / best[(m, 8)]) / 4.0 for m in ("cow", "mor")}
    eff_med = {m: (med[(m, 32)] / med[(m, 8)]) / 4.0 for m in ("cow", "mor")}
    total_events = n_events + max(1000, n_events // 20)

    rows = "\n".join(
        f"| {m} | local[{c}] {'(N)' if c == 8 else '(4N)'} | {best[(m, c)]:,.0f} | "
        f"{med[(m, c)]:,.0f} | "
        + "; ".join(
            f"{x['replay_events_per_sec']:,.0f} (steal {x['steal_pct']}%)"
            for x in cells[(m, c)]
        )
        + " |"
        for m in ("cow", "mor")
        for c in (8, 32)
    )
    offheap = os.environ.get("DPS_OFFHEAP") or "20g (bench.py default)"
    md = f"""

## Round-4 scaling matrix (re-run at r4 HEAD, {time.strftime('%Y-%m-%d %H:%M')})

Same job/methodology as the round-3 matrix above (seed=42,
{total_events:,} events, 32 buckets, cold session per run, order
interleaved 8,32,32,8; DPS_OFFHEAP={offheap}); {samples} samples/cell.

| write mode | parallelism | events/s (best) | events/s (median) | samples |
|---|---|---|---|---|
{rows}

**N -> 4N efficiency, best-of-cell: cow = {eff_best['cow']:.3f},
mor = {eff_best['mor']:.3f}; median: cow = {eff_med['cow']:.3f},
mor = {eff_med['mor']:.3f}** (single-box memory-bus ceiling — see the
honesty ledger above; the compute-bound control scales ~0.98).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
