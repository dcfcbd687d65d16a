"""Storage reclamation (VERDICT r4 top item): LakeTable.expire_versions
must shrink bytes-on-disk after CoW history / folded MoR deltas, make
time travel below the horizon raise cleanly, preserve the exactly-once
commit-key history, GC orphaned (crashed-commit) files behind a grace
window, and keep stale writers SAFE (conservative conflict) when their
read version crosses the horizon."""

import os
import time

import pyarrow.parquet as pq
import pytest

from debezium_partial_snapshotter_spark.operators.upsert import (
    apply_batch,
    empty_table_for,
)
from debezium_partial_snapshotter_spark.plans.lake import VersionExpiredError
from debezium_partial_snapshotter_spark.schemas import TOKENS_SCHEMA
from debezium_partial_snapshotter_spark.sources.eventlog import (
    EventLogSpec,
    generate_change_log,
    generate_initial_state,
    oracle_apply,
    snapshot_read_events,
)
from tests.test_replay import assert_state_matches, load_events

NB = 4


def _du(path: str) -> int:
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _build(spark, tmp_warehouse, write_mode="cow", n_segments=4):
    spec = EventLogSpec(
        n_docs=120, n_events=900, n_segments=n_segments, seed=31,
        num_buckets=NB, delete_frac=0.1,
    )
    state = generate_initial_state(spec)
    snap = snapshot_read_events(state, spec.start_lsn, spec)
    wal = generate_change_log(spec)
    table = empty_table_for(
        os.path.join(tmp_warehouse, "tokens"), TOKENS_SCHEMA, num_buckets=NB
    )
    d0 = os.path.join(tmp_warehouse, "e0")
    os.makedirs(d0)
    pq.write_table(snap, os.path.join(d0, "s.parquet"))
    apply_batch(table, load_events(spark, d0), commit_key="p:0",
                write_mode=write_mode)
    for i, seg in enumerate(wal, start=1):
        d = os.path.join(tmp_warehouse, f"e{i}")
        os.makedirs(d)
        pq.write_table(seg, os.path.join(d, "w.parquet"))
        apply_batch(table, load_events(spark, d), commit_key=f"p:{i}",
                    write_mode=write_mode)
    return table, oracle_apply([snap] + wal), d0


def test_expire_reclaims_cow_history_and_gates_time_travel(
    spark, tmp_warehouse
):
    table, expected, _d0 = _build(spark, tmp_warehouse)
    old_version = 1  # the bootstrap manifest, long superseded
    before = _du(table.path)
    n_manifests_before = len(table._versions())

    out = table.expire_versions(keep_last=1, min_age_sec=0,
                                orphan_grace_sec=0)
    assert out["applied"]
    assert out["expired_manifests"] > 0
    assert out["files_deleted"] > 0 and out["bytes_deleted"] > 0
    # on-disk usage shrinks by the reported reclaim (modulo the one
    # new horizon manifest this run wrote)
    assert _du(table.path) <= before - out["bytes_deleted"] + 8192
    assert _du(table.path) < before
    assert len(table._versions()) < n_manifests_before

    # current content untouched
    assert_state_matches(spark, table, expected)
    # time travel below the horizon raises the TYPED error, with the
    # horizon attached
    with pytest.raises(VersionExpiredError) as ei:
        table.read(spark, version=old_version)
    assert ei.value.horizon == out["horizon"]
    # re-running reclaims no DATA files (idempotent on the data plane;
    # it may expire the previous run's own horizon manifest)
    again = table.expire_versions(keep_last=1, min_age_sec=0,
                                  orphan_grace_sec=0)
    assert again["files_deleted"] == 0


def test_expire_preserves_exactly_once_keys(spark, tmp_warehouse):
    table, expected, d0 = _build(spark, tmp_warehouse)
    keys_before = table.committed_keys()
    table.expire_versions(keep_last=1, min_age_sec=0, orphan_grace_sec=0)
    # the key history rides the CURRENT manifest: nothing evicted
    assert table.committed_keys() == keys_before
    # a redelivered snapshot batch (pinned key p:0) is still suppressed
    v = table.current_version()
    r = apply_batch(table, load_events(spark, d0), commit_key="p:0")
    assert not r["applied"] and table.current_version() == v
    assert_state_matches(spark, table, expected)


def test_expire_reclaims_folded_mor_deltas(spark, tmp_warehouse):
    table, expected, _d0 = _build(spark, tmp_warehouse, write_mode="mor")
    assert table.delta_stats()["delta_files"] > 0
    table.compact(spark)
    assert table.delta_stats()["delta_files"] == 0
    # compaction folded the deltas into a new base, but the old delta
    # FILES are still on disk (referenced only by expired-to-be
    # manifests) until expiration reclaims them
    before = _du(table.path)
    out = table.expire_versions(keep_last=1, min_age_sec=0,
                                orphan_grace_sec=0)
    assert out["bytes_deleted"] > 0
    assert _du(table.path) < before
    assert_state_matches(spark, table, expected)


def test_expire_orphan_gc_respects_grace(spark, tmp_warehouse):
    table, expected, _d0 = _build(spark, tmp_warehouse, n_segments=2)
    # a crashed commit: files written, manifest swap never happened
    stale_dir = os.path.join(table.data_dir, "c-deadbeef", "_bucket=0")
    os.makedirs(stale_dir)
    stale = os.path.join(stale_dir, "part-0.parquet")
    with open(stale, "wb") as fh:
        fh.write(b"x" * 128)
    os.utime(stale, (time.time() - 7200, time.time() - 7200))
    # an IN-FLIGHT commit: fresh files, manifest swap still coming
    fresh_dir = os.path.join(table.data_dir, "c-00c0ffee", "_bucket=1")
    os.makedirs(fresh_dir)
    fresh = os.path.join(fresh_dir, "part-0.parquet")
    with open(fresh, "wb") as fh:
        fh.write(b"y" * 128)

    # ROUTINE expire (the ingest-cadence path) never lists the data
    # dir, so it cannot see orphans — both crashed-commit files survive
    table.expire_versions(keep_last=1, min_age_sec=0, orphan_grace_sec=3600)
    assert os.path.exists(stale) and os.path.exists(fresh)

    # the scheduled maintenance sweep reclaims the aged orphan and
    # leaves the in-grace (possibly in-flight) one alone
    table.expire_versions(keep_last=1, min_age_sec=0,
                          orphan_grace_sec=3600, sweep_orphans=True)
    assert not os.path.exists(stale)  # aged orphan reclaimed
    assert not os.path.exists(os.path.dirname(stale))  # dir pruned
    assert os.path.exists(fresh)  # inside grace: left alone
    assert_state_matches(spark, table, expected)


def test_expire_routine_path_never_walks_data_dir(spark, tmp_warehouse):
    """Round-6 top item (VERDICT r5 What's-wrong 1): the routine
    reclamation set is (expired-manifest refs − retained refs) —
    metadata already in hand — so the ingest-cadence path must never
    list the data directory. At 100 TB an os.walk + per-file stat per
    expiring sweep is a driver-side full listing inside the ingest
    loop. Pinned by making any walk raise."""
    table, expected, _d0 = _build(spark, tmp_warehouse)
    before = _du(table.path)
    import debezium_partial_snapshotter_spark.plans.lake as lake_mod

    real_walk = os.walk

    def _forbidden(*a, **k):
        raise AssertionError("routine expire listed the data directory")

    lake_mod.os.walk = _forbidden
    try:
        out = table.expire_versions(keep_last=1, min_age_sec=0,
                                    orphan_grace_sec=0)
    finally:
        lake_mod.os.walk = real_walk
    # ...and it still reclaims the full CoW history, same as the
    # walk-based implementation did
    assert out["applied"] and out["files_deleted"] > 0
    assert _du(table.path) < before
    assert_state_matches(spark, table, expected)
    # idempotent re-run, still walk-free
    lake_mod.os.walk = _forbidden
    try:
        again = table.expire_versions(keep_last=1, min_age_sec=0,
                                      orphan_grace_sec=0)
    finally:
        lake_mod.os.walk = real_walk
    assert again["files_deleted"] == 0


def test_expire_min_age_protects_manifest_missing_ts(spark, tmp_warehouse):
    """ADVICE r5: a manifest that exists but carries no `ts` (pre-ts /
    externally produced) must read as 'committed now' — protected —
    not as epoch 0 ('certainly old'), or the in-flight-reader guard
    silently skips its predecessor."""
    import json

    table, _expected, _d0 = _build(spark, tmp_warehouse, n_segments=2)
    n_before = len(table._versions())
    for v in table._versions():
        p = os.path.join(table.manifest_dir, f"v{v:08d}.json")
        with open(p) as fh:
            man = json.load(fh)
        man.pop("ts", None)
        with open(p, "w") as fh:
            json.dump(man, fh)
    out = table.expire_versions(keep_last=1, min_age_sec=3600,
                                orphan_grace_sec=0)
    # with every supersession clock unknown, everything is protected
    assert out["applied"] is False and out["reason"] == "nothing_to_expire"
    assert len(table._versions()) == n_before


def test_expire_min_age_retains_recent_versions(spark, tmp_warehouse):
    table, _expected, _d0 = _build(spark, tmp_warehouse, n_segments=2)
    n_before = len(table._versions())
    out = table.expire_versions(keep_last=1, min_age_sec=1e6,
                                orphan_grace_sec=0)
    # every version was superseded less than min_age ago: nothing is
    # expirable (the in-flight-reader guard, clocked from the
    # SUCCESSOR's commit), and the call is a pure no-op — no horizon
    # manifest churn, no directory walk (round-5 review)
    assert out["applied"] is False and out["reason"] == "nothing_to_expire"
    assert out["expired_manifests"] == 0 and out["files_deleted"] == 0
    assert len(table._versions()) == n_before
    # every manifest-referenced file is untouched, every version readable
    for v in table._versions():
        m = table.manifest(v)
        for kind in ("buckets", "deltas"):
            for files in m.get(kind, {}).values():
                for f in files:
                    assert os.path.exists(os.path.join(table.path, f))


def test_expire_makes_stale_writer_conservatively_conflict(
    spark, tmp_warehouse
):
    table, _expected, _d0 = _build(spark, tmp_warehouse)
    out = table.expire_versions(keep_last=1, min_age_sec=0,
                                orphan_grace_sec=0)
    man = table.manifest()
    # a writer whose read_version predates the horizon cannot prove
    # its buckets were untouched (the touched-chain is gone): the
    # overlap check must return EVERYTHING, forcing re-read + re-merge
    stale_read_version = out["horizon"] - 2
    assert stale_read_version >= 1
    overlap = table._conflicting_buckets(stale_read_version, man, [0, 1])
    assert overlap == {0, 1}


def test_keep_last_validation(spark, tmp_warehouse):
    table, _expected, _d0 = _build(spark, tmp_warehouse, n_segments=2)
    with pytest.raises(ValueError, match="keep_last"):
        table.expire_versions(keep_last=0)


def test_runner_integrated_expiration_bounds_storage(spark, tmp_warehouse):
    """The ingest loop itself reclaims storage when configured
    (cfg.expire_keep_last): replay many epochs, manifests and data stay
    bounded, final state still matches the oracle, and the epoch-resume
    + exactly-once machinery is unaffected."""
    from debezium_partial_snapshotter_spark.config import PipelineConfig
    from debezium_partial_snapshotter_spark.sources.readers import (
        ParquetWalSource,
    )
    from debezium_partial_snapshotter_spark.streaming.runner import (
        PartialIngestRunner,
    )
    from tests.test_tracker import write_state

    spec = EventLogSpec(
        n_docs=60, n_events=600, n_segments=6, seed=41, num_buckets=NB,
    )
    state = generate_initial_state(spec)
    sp = os.path.join(tmp_warehouse, "s.parquet")
    write_state(sp, state)
    log_dir = os.path.join(tmp_warehouse, "wal")
    os.makedirs(log_dir)
    cfg = PipelineConfig(
        pipeline_id="pexp",
        warehouse=os.path.join(tmp_warehouse, "wh"),
        num_buckets=NB,
        expire_keep_last=2,
        expire_min_age_sec=0.0,
        expire_orphan_grace_sec=0.0,
        expire_every_applies=2,
    )
    src = ParquetWalSource(spark, sp, log_dir, num_buckets=NB)
    runner = PartialIngestRunner(spark, cfg, src)
    runner.start()
    wal = generate_change_log(spec)
    expired_any = False
    for i, seg in enumerate(wal):
        import pyarrow.parquet as _pq

        _pq.write_table(seg, os.path.join(log_dir, f"seg-{i:05d}.parquet"))
        stats = runner.tail_batch()
        if "expiration" in stats:
            expired_any = True
            assert stats["expiration"]["applied"]
    assert expired_any
    table = runner.table
    # manifests bounded: keep_last + the horizon commits between sweeps
    assert len(table._versions()) <= cfg.expire_keep_last + 2 * cfg.expire_every_applies
    # correctness survives the reclamation
    snap = snapshot_read_events(state, spec.start_lsn, spec)
    assert_state_matches(spark, table, oracle_apply([snap] + wal))


def _set_manifest_ts(table, version, ts):
    import json

    p = os.path.join(table.manifest_dir, f"v{version:08d}.json")
    with open(p) as fh:
        man = json.load(fh)
    man["ts"] = ts
    with open(p, "w") as fh:
        json.dump(man, fh)


def test_expire_min_age_clock_starts_at_supersession(spark, tmp_warehouse):
    """Round-5 review finding: the reader guard must clock from when a
    version was SUPERSEDED, not from its own commit. A version that
    stayed current for hours is still protected for min_age after its
    successor lands; conversely an old version superseded long ago is
    reclaimable even if some successor is recent."""
    table, expected, _d0 = _build(spark, tmp_warehouse, n_segments=3)
    versions = table._versions()
    now = time.time()
    # all commits look ancient...
    for v in versions:
        _set_manifest_ts(table, v, now - 100_000)
    # ...but the LAST commit is fresh: the previous current version
    # (versions[-2]) was superseded only just now
    _set_manifest_ts(table, versions[-1], now)

    out = table.expire_versions(keep_last=1, min_age_sec=3600,
                                orphan_grace_sec=0)
    kept = table._versions()
    # versions[-2] survived (superseded < min_age ago, a reader may
    # still be pinned to it); everything older was reclaimed
    assert versions[-2] in kept
    assert all(v not in kept for v in versions[:-2])
    assert out["expired_manifests"] == len(versions) - 2
    assert_state_matches(spark, table, expected)


def test_expire_noop_skips_cas_and_walk_unless_sweeping(
    spark, tmp_warehouse
):
    """On a quiet table expire is a pure no-op (no manifest churn);
    sweep_orphans=True forces the orphan pass without a horizon CAS."""
    table, expected, _d0 = _build(spark, tmp_warehouse, n_segments=2)
    table.expire_versions(keep_last=1, min_age_sec=0, orphan_grace_sec=0)
    n = len(table._versions())

    # plant an aged orphan from a crashed commit
    d = os.path.join(table.data_dir, "c-0ddba11", "_bucket=0")
    os.makedirs(d)
    orphan = os.path.join(d, "part-0.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"z" * 64)
    os.utime(orphan, (time.time() - 7200, time.time() - 7200))

    # keep_last large enough that nothing is expirable -> pure no-op:
    # no CAS, no walk, the orphan survives
    out = table.expire_versions(keep_last=50, min_age_sec=0,
                                orphan_grace_sec=0)
    assert out["applied"] is False and out["reason"] == "nothing_to_expire"
    assert len(table._versions()) == n
    assert os.path.exists(orphan)

    # forced orphan sweep: still no CAS (no horizon change), but the
    # walk runs and reclaims the crashed commit
    out = table.expire_versions(keep_last=50, min_age_sec=0,
                                orphan_grace_sec=0, sweep_orphans=True)
    assert out["applied"] is True and out["expired_manifests"] == 0
    assert len(table._versions()) == n
    assert not os.path.exists(orphan)
    assert_state_matches(spark, table, expected)


def test_expire_success_marker_of_live_commit_dir_survives(
    spark, tmp_warehouse
):
    """Round-5 review finding: data files live under c-<id>/_bucket=N/
    while _SUCCESS sits at the c-<id>/ root — marker liveness must be
    judged on the commit-dir SUBTREE, so a live commit's _SUCCESS is
    never reaped."""
    table, expected, _d0 = _build(spark, tmp_warehouse, n_segments=2)
    # locate a commit dir that holds CURRENT (live) data
    man = table.manifest()
    some_live = next(iter(man["buckets"].values()))[0]
    commit_dir = os.path.join(
        table.path, some_live.split(os.sep + "_bucket=")[0]
    )
    success = os.path.join(commit_dir, "_SUCCESS")
    assert os.path.exists(success)
    # age the marker well past any grace
    os.utime(success, (time.time() - 7200, time.time() - 7200))
    table.expire_versions(keep_last=1, min_age_sec=0, orphan_grace_sec=0)
    assert os.path.exists(success)  # its subtree holds live files
    assert_state_matches(spark, table, expected)
