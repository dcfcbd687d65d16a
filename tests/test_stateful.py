"""Cross-batch stateful dedup (applyInPandasWithState): redelivered /
stale events in LATER micro-batches are suppressed by per-key state."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from debezium_partial_snapshotter_spark.streaming.stateful import (
    latest_events_stateful,
)

FLAT = "doc_id string, lsn long, op string, value double"


def _write(rows, path):
    """Plain parquet FILES: the streaming file source does not list
    Spark-written output DIRECTORIES."""
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "lsn": pa.array([r[1] for r in rows], pa.int64()),
                "op": [r[2] for r in rows],
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        path,
    )


def _run_stream(spark, in_dir, chk, out_rows):
    stream = spark.readStream.schema(FLAT).parquet(in_dir)
    deduped = latest_events_stateful(stream)

    def sink(df, batch_id):
        out_rows.extend(
            (r["doc_id"], r["lsn"], r["op"], r["value"]) for r in df.collect()
        )

    q = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()


def test_stateful_dedup_suppresses_cross_batch_redelivery(spark, tmp_warehouse):
    in_dir = os.path.join(tmp_warehouse, "feed")
    chk = os.path.join(tmp_warehouse, "chk")
    os.makedirs(in_dir)
    out = []

    batch1 = [("a", 10, "u", 1.0), ("a", 12, "u", 2.0), ("b", 11, "c", 5.0)]
    _write(batch1, os.path.join(in_dir, "b1.parquet"))
    _run_stream(spark, in_dir, chk, out)
    assert sorted(out) == [("a", 12, "u", 2.0), ("b", 11, "c", 5.0)]

    # batch 2: full redelivery of batch 1 + one genuinely new event
    out.clear()
    batch2 = batch1 + [("b", 13, "u", 6.0)]
    _write(batch2, os.path.join(in_dir, "b2.parquet"))
    _run_stream(spark, in_dir, chk, out)
    # a's redelivered events are ALL stale -> suppressed by state;
    # b advances to lsn 13 -> exactly one emission
    assert out == [("b", 13, "u", 6.0)]


def test_stateful_dedup_rank_breaks_lsn_ties(spark, tmp_warehouse):
    in_dir = os.path.join(tmp_warehouse, "feed2")
    chk = os.path.join(tmp_warehouse, "chk2")
    os.makedirs(in_dir)
    out = []
    # same lsn: delete (rank 3) must beat update (rank 2) and 'r' (0)
    rows = [("k", 7, "r", 0.0), ("k", 7, "d", 0.0), ("k", 7, "u", 1.0)]
    _write(rows, os.path.join(in_dir, "b1.parquet"))
    _run_stream(spark, in_dir, chk, out)
    assert out == [("k", 7, "d", 0.0)]
