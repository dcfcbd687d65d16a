"""Final scaling-evidence harness.

Improvements over scaling_bench.py, motivated by measured run-to-run
noise of 25-50% on this shared VM:

- **interleaved order** (8,32,32,8 per mode) — de-confounds the
  monotone environmental drift observed when all N-core runs precede
  all 4N-core runs;
- **best-of-N per cell** — on a host with variable external contention
  the max approximates uncontended capability (medians also reported);
- **/proc/stat telemetry** per run (steal%, idle%) to quantify host
  contention alongside each sample.

Writes BENCH/BASELINE.md. Usage:
  TMPDIR=/dev/shm DPS_DRIVER_MEM=48g python scripts/scaling_final.py \
      [n_events] [samples_per_cell]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_stat() -> tuple[int, int, int]:
    parts = open("/proc/stat").readline().split()
    vals = [int(x) for x in parts[1:]]
    idle = vals[3] + vals[4]
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals), idle, steal


def run_once(cpus: int, n_events: int, mode: str) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(cpus),
        "DPS_BENCH_EVENTS": str(n_events),
        "DPS_BENCH_BUCKETS": "32",
        "DPS_BENCH_SEGMENTS": os.environ.get("DPS_BENCH_SEGMENTS", "4"),
        "DPS_BENCH_REPLAY_ONLY": "1",
        "DPS_BENCH_MODE": mode,
        "DPS_BENCH_CACHE_DIR": os.environ.get(
            "DPS_BENCH_CACHE_DIR", "/tmp/dps_bench_cache"
        ),
        "PYTHONPATH": REPO,
    }
    t0, i0, s0 = cpu_stat()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    t1, i1, s1 = cpu_stat()
    dt = max(t1 - t0, 1)
    lines = out.stdout.strip().splitlines()
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    r = json.loads(lines[-1])
    r["steal_pct"] = round(100.0 * (s1 - s0) / dt, 2)
    r["idle_pct"] = round(100.0 * (i1 - i0) / dt, 2)
    return r


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cells: dict[tuple[str, int], list[dict]] = {}
    # interleaved: alternate parallelism within each mode
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

    def agg(mode, cpus, f):
        return f(x["replay_events_per_sec"] for x in cells[(mode, cpus)])

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
    # report the EFFECTIVE child config: bench.py setdefaults
    # DPS_OFFHEAP=20g, so an unset parent env still measures WITH
    # off-heap — the ledger must say so
    offheap = os.environ.get("DPS_OFFHEAP") or "20g (bench.py default)"
    md = f"""# BENCH baseline — scaling evidence (final, interleaved)

North-rule metric: change-events/sec applied replaying a deterministic
CDC log through the full engine (snapshot epoch + {os.environ.get('DPS_BENCH_SEGMENTS', '4')} WAL tail epochs,
exactly-once validated commits). Identical input in every cell: seed=42,
{total_events:,} events (snapshot reads + WAL), 32 buckets, cold
SparkSession per run, {samples} samples per cell, order interleaved
(8,32,32,8) to de-confound environmental drift.

| write mode | parallelism | events/s (best) | events/s (median) | samples |
|---|---|---|---|---|
{rows}

**Scaling efficiency (N -> 4N), best-of-cell: cow = {eff_best['cow']:.3f},
mor = {eff_best['mor']:.3f}; median: cow = {eff_med['cow']:.3f},
mor = {eff_med['mor']:.3f}.**

## Measurement environment honesty ledger

- This is ONE shared VM (Firecracker guest), not two cluster sizes:
  local[8] and local[32] share a single memory bus, JVM heap, and page
  cache. Run-to-run variance of 25-50% was measured with identical
  configs; per-run steal% is reported above to quantify external host
  contention.
- Profiling (Spark event logs, BENCH/PLANS.md) shows local[32] burning
  ~5x the task-CPU of local[8] for identical work with ~70x the GC
  time: threads add memory-bandwidth pressure, not bandwidth. A real
  N -> 4N executor step multiplies memory channels, heaps, and I/O
  lanes by 4; this replay is byte-movement-bound (wide token arrays
  through shuffle + parquet codec), exactly the resource a bigger
  cluster adds.
- Control experiment, same box, same session configs: a compute-bound
  Spark job (md5 over 50M rows) scales 8 -> 32 cores at 3.9x
  (efficiency 0.98). Event-log analysis shows no hot-path stage with
  sub-8-way parallelism — the plans parallelize; the box does not.

## Throughput engineering log (all at local[32], 42M events)

1. struct-ordered max_by compiled to SortAggregate (sorts wide rows both
   shuffle sides) -> primitive max + SHUFFLE_HASH join-back: ~3x.
2. dropDuplicates tie-guard (SortAggregate over full winner set) ->
   pre-commit count validation with guarded retry: +44%.
3. merge-on-read deltas (write batch winners + tombstones, resolve on
   read, compact at threshold) vs per-epoch CoW rewrite: +66% on top.
4. generator: splittable row groups (32k rows) so scans parallelize.

## Round-2 engineering log

5. MoR READ path: dropped the per-read dropDuplicates (SortAggregate
   over wide token rows) — stored rows are tie-free by construction
   (proof in plans/lake.py _resolve_mor); a delta-bucket read plan now
   contains no sort at all (tests/test_mor.py pins it).
6. MinHash family: signature values are 60-bit BIGINTs (md5 15-hex
   prefix) instead of 32-char hex strings — ~6x fewer minhash shuffle
   bytes (sf0.1: 7.6s -> 3.3s); band hashes BIGINT too.
7. Replay-path scan pruning verified by formatted explain: the WAL
   scan reads only (op, doc_id, lsn, after.{{tokens,n_tok,source}}) —
   `snapshot`, `table_partition`, and even after.doc_id never leave
   the parquet reader; the planning scan reads (op, doc_id, lsn) only.

## Round-3 engineering log

8. OFF-HEAP column vectors + Tungsten off-heap memory
   (`spark.memory.offHeap.*`, `spark.sql.columnVector.offheap.enabled`;
   DPS_OFFHEAP knob, now the bench default at 20g): the one lever that
   directly attacks the 32-thread GC/allocation wall. Interleaved A/B
   (scripts/offheap_ab.py, 16.8M events, cow, steal% recorded per run):
   local[32] best 139,500 -> 221,573 ev/s (+59%), median 114,709 ->
   192,809 (+68%); local[8] neutral (best 278,917 -> 281,759, within
   noise). Consistent with the r2 diagnosis: at 32 threads the heap
   allocator/GC amplifies memory-bus pressure; moving scan vectors and
   shuffle pages off-heap removes that amplification. This matrix below
   runs with DPS_OFFHEAP={offheap}.
9. Cluster-output near-dup (near_dup_clusters): the verified set-pair
   graph goes through connected components (min-label propagation +
   pointer jumping) instead of pair expansion — a 10^6-doc duplicate
   group is ONE graph node and n output rows, vs n(n-1)/2 pair rows
   from jaccard_pairs (kept as the debug view).
10. Lineage-truncate shared subplans in the near-dup family: the r2
   "output-bound ~110s" diagnosis for jaccard_pairs was WRONG — the
   time was recomputation. Catalyst does not reuse exchanges across
   separately optimized subtrees, so every self-join/rep-attach branch
   re-executed the shingle/md5 pipeline (~8x per query, measured).
   localCheckpoint(eager=False) on members/reps/banded (narrow
   columns / O(distinct sets) — NOT the array-carrying sets_ plan,
   which would pin an O(corpus) copy): bench-to-bench at sf0.1,
   jaccard_pairs 105.6 -> 46.3s, near_dup_clusters 100.6 -> 31.4s,
   minhash_lsh_pairs 4.1 -> 3.5s (the r2 +14% "drift" was this),
   embedding_near_dup 5.1 -> 2.9s. Plus a size-ratio gate before the
   exact array_intersect (J >= t forces min(sz)/max(sz) >= t —
   output-identical, verified by unchanged oracle hashes and pair
   counts), and a gc.collect() between bench queries so one query's
   checkpoint blocks are released before the next is timed.

`jaccard_pairs`: candidates from MinHash LSH bands over one
representative per DISTINCT shingle set (dedup-before-neardup), exact
array_intersect verify on candidate set-pairs, expansion to doc pairs
(Omega(output): ~8.9M true pairs at sf0.1, the residual ~20s); oracle
mirrors the gate (99.91% recall vs exhaustive at sf0.01). `core_sec`
in the bench JSON is the round-1-comparable subtotal without it.

Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by scripts/scaling_final.py.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
