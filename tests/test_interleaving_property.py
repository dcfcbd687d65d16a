"""Randomized interleaving property (the round-2 watermark-fix
invariant): because every WAL event is EVENTUALLY applied (the replay
filter never skips past unapplied events — the r1 bug) and application
is an idempotent (lsn, op_rank) max-merge, the final state of ANY
interleaving of {WAL arrival, tail drain, partial re-snapshot, runner
restart} that ends with a full drain equals the order-independent
max-merge of:

    {all WAL events}  ∪  {source-state rows stamped at the LAST
                          snapshot watermark of their (claimed) bucket}

with delete-winners dropped. Before the fix, WAL events for unclaimed
partitions that were in the log at claim time were silently excluded
from the merge set, breaking this equality.
"""

import os
import random

from pyspark.sql import functions as F

from debezium_partial_snapshotter_spark.config import PipelineConfig
from debezium_partial_snapshotter_spark.functions import bucket_id_py
from debezium_partial_snapshotter_spark.schemas import CHANGE_EVENT_SCHEMA, OP_RANK
from debezium_partial_snapshotter_spark.sources.eventlog import (
    EventLogSpec,
    generate_initial_state,
)
from debezium_partial_snapshotter_spark.sources.readers import ParquetWalSource
from debezium_partial_snapshotter_spark.streaming.runner import PartialIngestRunner
from tests.test_tracker import write_state

NB = 4


def _mini_oracle(state, wal_events, snap_w_by_bucket):
    """Winner per key over WAL ∪ (state rows at last snapshot W)."""
    cand = {}

    def offer(key, lsn, rank, row):
        best = cand.get(key)
        if best is None or (lsn * 4 + rank) > (best[0] * 4 + best[1]):
            cand[key] = (lsn, rank, row)

    for ev in wal_events:
        offer(ev["doc_id"], ev["lsn"], OP_RANK[ev["op"]], ev)
    for r in state:
        b = bucket_id_py(r["doc_id"], NB)
        if b in snap_w_by_bucket:
            offer(r["doc_id"], snap_w_by_bucket[b], OP_RANK["r"],
                  {"op": "r", "doc_id": r["doc_id"], "after": r})
    out = {}
    for k, (lsn, rank, ev) in cand.items():
        if ev["op"] != "d":
            out[k] = (lsn, rank, ev["after"]["tokens"] if "after" in ev else None)
    return out


def test_random_interleavings_converge_to_max_merge(spark, tmp_warehouse):
    spec = EventLogSpec(n_docs=40, n_events=0, n_segments=1, seed=9, num_buckets=NB)
    state = generate_initial_state(spec)
    docs = [r["doc_id"] for r in state]

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        wh = os.path.join(tmp_warehouse, f"case{seed}")
        state_path = os.path.join(wh, "state.parquet")
        write_state(state_path, state)
        log_dir = os.path.join(wh, "wal")
        os.makedirs(log_dir)

        cfg = PipelineConfig(
            pipeline_id="prop", warehouse=os.path.join(wh, "wh"), num_buckets=NB
        )
        src = ParquetWalSource(spark, state_path, log_dir, num_buckets=NB)
        runner = PartialIngestRunner(spark, cfg, src)
        runner.start()
        snap_w_by_bucket = {
            b: runner.table.snapshot_lsn() for b in range(NB)
        }  # full snapshot claimed everything

        all_wal, next_lsn, seg_no = [], 1_000, 0

        def write_segment():
            nonlocal next_lsn, seg_no
            n = rng.randint(1, 6)
            rows = []
            for _ in range(n):
                d = rng.choice(docs + [f"new{rng.randint(0, 5)}"])
                op = rng.choice(["u", "u", "c", "d"])
                after = None if op == "d" else (d, [next_lsn % 97], 1, "p")
                rows.append((op, d, next_lsn, "false",
                             f"tokens/{bucket_id_py(d, NB):04d}", after))
                all_wal.append(
                    {"op": op, "doc_id": d, "lsn": next_lsn,
                     "after": {"doc_id": d, "tokens": [next_lsn % 97],
                               "n_tok": 1, "source": "p"}}
                )
                next_lsn += 1
            spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).coalesce(1)\
                .write.mode("overwrite").parquet(
                    os.path.join(log_dir, f"seg-{seg_no:05d}.parquet"))
            seg_no += 1

        for _ in range(8):
            action = rng.choice(["wal", "wal", "tail", "resnap", "restart"])
            if action == "wal":
                write_segment()
            elif action == "tail":
                runner.tail_batch()
            elif action == "resnap":
                b = rng.randrange(NB)
                runner.tracker.set_needs(
                    [f"tokens/{b:04d}"], cfg.pipeline_id, needs=True
                )
                out = runner.snapshot_epoch()
                if out.get("applied"):
                    for p in out["claimed"]:
                        snap_w_by_bucket[int(p.rsplit("/", 1)[1])] = out[
                            "snapshot_watermark"
                        ]
            else:  # crash/restart: new runner over the same warehouse
                runner = PartialIngestRunner(spark, cfg, src)

        runner.tail_batch()  # final full drain
        expected = _mini_oracle(state, all_wal, snap_w_by_bucket)
        got = {
            r["doc_id"]: (r["_lsn"], r["_op_rank"], list(r["tokens"]))
            for r in runner.table.read(spark).collect()
        }
        assert set(got) == set(expected), (
            f"seed {seed}: extra={set(got) - set(expected)} "
            f"missing={set(expected) - set(got)}"
        )
        for k, (lsn, rank, tokens) in expected.items():
            assert got[k][0] == lsn and got[k][1] == rank, (seed, k, got[k])
            if tokens is not None and rank != 0:
                assert got[k][2] == tokens, (seed, k)
