"""M3 — Structured Streaming tail + checkpoint resume (B2/B3/B6).

Pins: snapshot epoch then streamed tail reproduces the oracle; restart
with the same checkpoint processes only new WAL segments; losing the
checkpoint entirely still cannot double-apply or resurrect deleted keys
(LSN high-watermark + idempotent commit keys).
"""

import os

from debezium_partial_snapshotter_spark.config import PipelineConfig
from debezium_partial_snapshotter_spark.sources.eventlog import (
    EventLogSpec,
    generate_change_log,
    generate_initial_state,
    oracle_apply,
    snapshot_read_events,
)
from debezium_partial_snapshotter_spark.sources.readers import ParquetWalSource
from debezium_partial_snapshotter_spark.streaming.runner import PartialIngestRunner
from tests.test_replay import assert_state_matches
from tests.test_tracker import write_state

NB = 4


def make_env(tmp_warehouse, spark, spec):
    state = generate_initial_state(spec)
    state_path = os.path.join(tmp_warehouse, "source", "state.parquet")
    write_state(state_path, state)
    log_dir = os.path.join(tmp_warehouse, "source", "wal")
    os.makedirs(log_dir, exist_ok=True)
    cfg = PipelineConfig(
        pipeline_id="p1",
        warehouse=os.path.join(tmp_warehouse, "wh"),
        num_buckets=NB,
    )
    src = ParquetWalSource(spark, state_path, log_dir, num_buckets=NB)
    return state, log_dir, cfg, src


def test_snapshot_then_stream(spark, tmp_warehouse):
    spec = EventLogSpec(n_docs=150, n_events=900, n_segments=3, seed=5, num_buckets=NB)
    state, log_dir, cfg, src = make_env(tmp_warehouse, spark, spec)

    runner = PartialIngestRunner(spark, cfg, src)
    runner.start()  # snapshot only; WAL dir still empty

    wal = generate_change_log(spec, out_dir=log_dir)
    runner.stream()

    snap = snapshot_read_events(state, spec.start_lsn, spec)
    expected = oracle_apply([snap] + wal)
    assert_state_matches(spark, runner.table, expected)
    cl = runner.commit_log.read_pandas()
    assert (cl["phase"] == "tail").any()


def test_stream_restart_processes_only_new_segments(spark, tmp_warehouse):
    spec = EventLogSpec(n_docs=150, n_events=1000, n_segments=4, seed=9, num_buckets=NB)
    state, log_dir, cfg, src = make_env(tmp_warehouse, spark, spec)

    runner = PartialIngestRunner(spark, cfg, src)
    runner.start()

    # phase 1: first half of the WAL
    all_segments = generate_change_log(spec, out_dir=None)
    import pyarrow.parquet as pq

    for i, t in enumerate(all_segments[:2]):
        pq.write_table(t, os.path.join(log_dir, f"seg-{i:05d}.parquet"))
    runner.stream()
    v_mid = runner.table.current_version()

    # restart: same checkpoint, two more segments arrive
    for i, t in enumerate(all_segments[2:], start=2):
        pq.write_table(t, os.path.join(log_dir, f"seg-{i:05d}.parquet"))
    runner2 = PartialIngestRunner(spark, cfg, src)
    runner2.stream()

    snap = snapshot_read_events(state, spec.start_lsn, spec)
    expected = oracle_apply([snap] + all_segments)
    assert_state_matches(spark, runner2.table, expected)
    # resumed stream added commits on top, it did not rewind
    assert runner2.table.current_version() > v_mid


def test_checkpoint_loss_is_safe(spark, tmp_warehouse):
    """Blow away the checkpoint after a full stream: a fresh stream
    re-reads every file, but the LSN high-watermark filter drops all of
    it — deleted keys stay deleted, final state unchanged."""
    spec = EventLogSpec(
        n_docs=120, n_events=800, n_segments=2, seed=13, num_buckets=NB,
        delete_frac=0.2,
    )
    state, log_dir, cfg, src = make_env(tmp_warehouse, spark, spec)
    runner = PartialIngestRunner(spark, cfg, src)
    runner.start()
    wal = generate_change_log(spec, out_dir=log_dir)
    runner.stream()

    snap = snapshot_read_events(state, spec.start_lsn, spec)
    expected = oracle_apply([snap] + wal)
    assert_state_matches(spark, runner.table, expected)

    import shutil

    shutil.rmtree(cfg.checkpoint_dir)
    runner2 = PartialIngestRunner(spark, cfg, src)
    runner2.stream()
    assert_state_matches(spark, runner2.table, expected)
