"""ChangefeedReader — the cursor-persisted incremental consumer over a
LakeTable (VERDICT r5 next-3): poll/commit cursor protocol, the O(batch)
delta-file fast path (pinned: no resolve, reads ONLY the new delta
files), the net fallback when the range holds a non-delta commit, MERGE
re-application via apply_feed reproducing the upstream state exactly,
and re-bootstrap after the cursor falls below the expiration horizon.

Reference analog: the connector's whole purpose is feeding incremental
consumers that resume from a persisted position (reference README.md:9-13,
the resume loop in PartialSnapshotter.java)."""

import os
from urllib.parse import unquote, urlparse

import pyarrow.parquet as pq
import pytest

from debezium_partial_snapshotter_spark.operators.upsert import (
    apply_batch,
    empty_table_for,
)
from debezium_partial_snapshotter_spark.plans.changefeed import (
    ChangefeedReader,
    ConcurrentConsumerError,
    IneligibleRangeError,
    apply_feed,
)
from debezium_partial_snapshotter_spark.plans.lake import (
    LakeTable,
    VersionExpiredError,
)
from debezium_partial_snapshotter_spark.schemas import TOKENS_SCHEMA
from debezium_partial_snapshotter_spark.sources.eventlog import (
    EventLogSpec,
    generate_change_log,
    generate_initial_state,
    snapshot_read_events,
)
from tests.test_replay import load_events

NB = 4


def _local_path(uri: str) -> str:
    p = urlparse(uri)
    return unquote(p.path) if p.scheme else uri


def _build(spark, tmp_warehouse, write_mode="mor", n_events=700, seed=47):
    """snapshot + 4 WAL segments applied one commit each; returns
    (table, [versions after each apply])."""
    spec = EventLogSpec(
        n_docs=80, n_events=n_events, n_segments=4, seed=seed,
        num_buckets=NB, delete_frac=0.2,
    )
    state = generate_initial_state(spec)
    snap = snapshot_read_events(state, spec.start_lsn, spec)
    wal = generate_change_log(spec)
    table = empty_table_for(
        os.path.join(tmp_warehouse, "tokens"), TOKENS_SCHEMA, num_buckets=NB
    )
    versions = []
    for i, seg in enumerate([snap] + wal):
        d = os.path.join(tmp_warehouse, f"e{i}")
        os.makedirs(d)
        pq.write_table(seg, os.path.join(d, "s.parquet"))
        apply_batch(
            table, load_events(spark, d), commit_key=f"p:{i}",
            write_mode=write_mode,
        )
        versions.append(table.current_version())
    return table, versions


def _image(spark, table, version=None):
    return {
        r["doc_id"]: (r["_lsn"], r["_op_rank"], r["n_tok"])
        for r in table.read(spark, version=version).collect()
    }


def test_cursor_persists_and_poll_commit_advances(spark, tmp_warehouse):
    table, vs = _build(spark, tmp_warehouse)
    cdir = os.path.join(tmp_warehouse, "cursor")
    r = ChangefeedReader(table, cdir)
    assert r.cursor() is None
    with pytest.raises(RuntimeError, match="cursor"):
        r.poll(spark)
    r.start(from_version=vs[1])
    assert r.cursor() == vs[1]
    # start() is idempotent — a second start does not move the cursor
    assert r.start(from_version=vs[3]) == vs[1]

    b = r.poll(spark, mode="net")
    assert (b.from_version, b.to_version) == (vs[1], vs[-1])
    # poll does NOT advance: a crash before commit re-polls the same range
    b2 = r.poll(spark, mode="net")
    assert (b2.from_version, b2.to_version) == (vs[1], vs[-1])
    r.commit(b)
    # a NEW reader instance on the same dir resumes from the committed spot
    assert ChangefeedReader(table, cdir).cursor() == vs[-1]
    empty = r.poll(spark)
    assert empty.df.count() == 0 and empty.epochs == 0
    assert "_change_type" in empty.df.columns
    r.commit(empty)  # committing an empty range is a no-op advance
    assert r.cursor() == vs[-1]


def test_net_mode_poll_equals_read_changes(spark, tmp_warehouse):
    table, vs = _build(spark, tmp_warehouse)
    r = ChangefeedReader(table, os.path.join(tmp_warehouse, "c"))
    r.start(from_version=vs[2])
    got = r.poll(spark, mode="net").df
    want = table.read_changes(spark, vs[2], vs[-1])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_delta_fast_path_reads_only_new_delta_files(
    spark, tmp_warehouse, monkeypatch
):
    """The headline 100-TB property: a pure-delta range is served
    STRAIGHT from the new delta files — LakeTable.read (the resolve)
    is never called and the scan inputs are a subset of the files the
    polled commits appended. O(rows changed), no base IO."""
    table, vs = _build(spark, tmp_warehouse, write_mode="mor")
    r = ChangefeedReader(table, os.path.join(tmp_warehouse, "c"))
    r.start(from_version=vs[1])

    old_man = table.manifest(vs[1])
    new_man = table.manifest(vs[-1])
    new_files = set()
    for b, files in new_man.get("deltas", {}).items():
        old = old_man.get("deltas", {}).get(b, [])
        new_files.update(
            os.path.realpath(os.path.join(table.path, f))
            for f in files[len(old):]
        )
    assert new_files  # the fixture genuinely appended deltas

    def _no_resolve(*a, **k):
        raise AssertionError("fast path must not resolve a version")

    monkeypatch.setattr(LakeTable, "read", _no_resolve)
    monkeypatch.setattr(LakeTable, "read_changes", _no_resolve)
    b = r.poll(spark, mode="delta")
    assert b.fast_path and b.epochs == len(vs) - 2
    rows = b.df.collect()  # executes with read()/read_changes() poisoned
    assert rows
    scanned = {
        os.path.realpath(_local_path(f)) for f in b.df.inputFiles()
    }
    assert scanned and scanned <= new_files


def test_delta_feed_content_matches_version_images(spark, tmp_warehouse):
    """Delta winners = per-key max over the range: upserts equal the
    to-version image for every surviving changed key; every net-deleted
    key surfaces a tombstone (at-least-delete allows extras for keys
    born AND deleted inside the range)."""
    table, vs = _build(spark, tmp_warehouse, write_mode="mor")
    r = ChangefeedReader(table, os.path.join(tmp_warehouse, "c"))
    r.start(from_version=vs[1])
    b = r.poll(spark, mode="delta")
    assert b.fast_path
    ups = {
        row["doc_id"]: (row["_lsn"], row["_op_rank"], row["n_tok"])
        for row in b.df.collect()
        if row["_change_type"] == "upsert"
    }
    dels = {
        row["doc_id"]
        for row in b.df.collect()
        if row["_change_type"] == "delete"
    }
    old_img, new_img = _image(spark, table, vs[1]), _image(spark, table)
    changed = {
        k: v
        for k, v in new_img.items()
        if k not in old_img or old_img[k] != v
    }
    assert ups == changed
    assert set(old_img) - set(new_img) <= dels
    assert dels.isdisjoint(ups)


def test_concurrent_consumers_detected(spark, tmp_warehouse):
    table, vs = _build(spark, tmp_warehouse)
    cdir = os.path.join(tmp_warehouse, "c")
    r1 = ChangefeedReader(table, cdir)
    r2 = ChangefeedReader(table, cdir)
    r1.start(from_version=vs[0])
    r2.start(from_version=vs[0])
    b1 = r1.poll(spark, mode="net")
    b2 = r2.poll(spark, mode="net")
    r1.commit(b1)
    with pytest.raises(ConcurrentConsumerError):
        r2.commit(b2)
    # the loser re-polls from the ADVANCED cursor and proceeds cleanly
    b3 = r2.poll(spark)
    assert b3.from_version == vs[-1]


def test_compaction_in_range_falls_back_to_net(spark, tmp_warehouse):
    table, vs = _build(spark, tmp_warehouse, write_mode="mor")
    r = ChangefeedReader(table, os.path.join(tmp_warehouse, "c"))
    r.start(from_version=vs[1])
    table.compact(spark)  # folds deltas into base: NOT a delta append
    with pytest.raises(IneligibleRangeError):
        r.poll(spark, mode="delta", on_ineligible="error")
    b = r.poll(spark, mode="delta")  # default fallback: derive from net
    assert not b.fast_path
    kinds = {row["_change_type"] for row in b.df.collect()}
    assert kinds <= {"upsert", "delete"}
    # fallback deletes carry tombstone shape: NULL payload
    for row in b.df.collect():
        if row["_change_type"] == "delete":
            assert row["n_tok"] is None


def test_apply_feed_reproduces_upstream_exactly(spark, tmp_warehouse):
    """The end-to-end consumer story: poll -> apply_feed -> commit,
    epoch by epoch, reproduces the upstream table state exactly —
    including across a mid-stream compaction (net fallback) whose
    deletes must still BEAT the pre-image rows the downstream already
    applied (the re-ordinal fix), and under redelivery (commit_key)."""
    table, vs = _build(spark, tmp_warehouse, write_mode="mor")
    down = empty_table_for(
        os.path.join(tmp_warehouse, "down"), TOKENS_SCHEMA, num_buckets=3
    )
    r = ChangefeedReader(table, os.path.join(tmp_warehouse, "c"))
    r.start(from_version=1)

    # step 1: everything up to vs[2] via the fast path
    b1 = r.poll(spark, mode="delta", to_version=vs[2])
    assert b1.fast_path
    assert apply_feed(down, b1.df, commit_key="feed:1") is True
    # redelivery of the same batch is a no-op
    assert apply_feed(down, b1.df, commit_key="feed:1") is False
    r.commit(b1)

    # a compaction lands upstream: the rest of the feed is net-fallback
    table.compact(spark)
    b2 = r.poll(spark, mode="delta")
    assert not b2.fast_path
    assert apply_feed(down, b2.df, commit_key="feed:2") is True
    r.commit(b2)

    up_img = _image(spark, table)
    down_img = {
        k: v[2] for k, v in _image(spark, down).items()
    }
    # payload equality per key; the fallback's re-ordinaled delete rows
    # mean downstream (_lsn, _op_rank) need not match upstream, but the
    # SET of live keys and their payloads must
    assert {k: v[2] for k, v in up_img.items()} == down_img


def test_bootstrap_after_horizon_expiration(spark, tmp_warehouse):
    table, vs = _build(spark, tmp_warehouse)
    r = ChangefeedReader(table, os.path.join(tmp_warehouse, "c"))
    r.start(from_version=vs[0])
    table.expire_versions(keep_last=1, min_age_sec=0, orphan_grace_sec=0)
    with pytest.raises(VersionExpiredError):
        r.poll(spark, mode="net").df.collect()
    boot = r.bootstrap(spark)
    assert {row["_change_type"] for row in boot.df.collect()} == {"upsert"}
    assert boot.df.count() == len(_image(spark, table))
    r.commit_bootstrap(boot)
    assert r.cursor() == table.current_version()
    nxt = r.poll(spark)
    assert nxt.df.count() == 0
