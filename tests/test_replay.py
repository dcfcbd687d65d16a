"""M1 — end-to-end batch replay vs the sequential oracle.

Mirrors the reference's golden-record verification style
(``PartialSnapshotterTest.java:410-442``): replay a deterministic event
log, then compare the final materialized table — sorted by doc_id, token
arrays byte-equal — to the one-row-at-a-time oracle.
"""

import os

import numpy as np
import pyarrow.parquet as pq

from debezium_partial_snapshotter_spark.operators.upsert import (
    apply_batch,
    empty_table_for,
    user_schema,
)
from debezium_partial_snapshotter_spark.schemas import TOKENS_SCHEMA
from debezium_partial_snapshotter_spark.sources.eventlog import (
    EventLogSpec,
    generate_change_log,
    generate_initial_state,
    oracle_apply,
    snapshot_read_events,
)


def assert_state_matches(spark, table, expected: dict, check_extra_cols=()):
    """Byte-equal comparison of the materialized table vs the oracle."""
    actual = {
        r["doc_id"]: r
        for r in table.read(spark).toPandas().to_dict("records")
    }
    assert set(actual) == set(expected), (
        f"key sets differ: extra={set(actual)-set(expected)} "
        f"missing={set(expected)-set(actual)}"
    )
    for k, exp in expected.items():
        act = actual[k]
        exp_tok = np.asarray(exp["tokens"], dtype=np.int32)
        act_tok = np.asarray(act["tokens"], dtype=np.int32)
        assert act_tok.dtype == np.int32
        assert np.array_equal(exp_tok, act_tok), f"tokens differ for {k}"
        assert int(act["n_tok"]) == int(exp["n_tok"]), k
        assert act["source"] == exp["source"], k
        for c in check_extra_cols:
            assert act.get(c) == exp.get(c), (k, c)


def read_log(spark, tables):
    import pyarrow as pa

    combined = pa.concat_tables(tables)
    return spark.createDataFrame(combined.to_pandas(), schema=None)


def load_events(spark, log_dir):
    from debezium_partial_snapshotter_spark.schemas import CHANGE_EVENT_SCHEMA

    return spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(log_dir)


def test_snapshot_then_wal_replay(spark, tmp_warehouse):
    spec = EventLogSpec(n_docs=300, n_events=2000, n_segments=3, seed=42)
    state = generate_initial_state(spec)

    # snapshot reads at watermark W, then the WAL tail after W
    watermark = spec.start_lsn
    snap = snapshot_read_events(state, watermark, spec)
    wal_dir = os.path.join(tmp_warehouse, "log")
    wal = generate_change_log(spec, out_dir=wal_dir)

    table = empty_table_for(
        os.path.join(tmp_warehouse, "tokens"), TOKENS_SCHEMA, num_buckets=8
    )

    # epoch 0: snapshot; epochs 1..n: one per WAL segment
    snap_path = os.path.join(tmp_warehouse, "snap")
    os.makedirs(snap_path)
    pq.write_table(snap, os.path.join(snap_path, "snap.parquet"))
    stats = apply_batch(table, load_events(spark, snap_path), commit_key="p1:0")
    assert stats["applied"]
    for i in range(spec.n_segments):
        df = load_events(
            spark, os.path.join(wal_dir, f"seg-{i:05d}.parquet")
        )
        stats = apply_batch(table, df, commit_key=f"p1:{i+1}")
        assert stats["applied"]

    expected = oracle_apply([snap] + wal)
    assert_state_matches(spark, table, expected)


def test_concurrent_snapshot_wal_conflict(spark, tmp_warehouse):
    """Snapshot reads and overlapping WAL events arrive in ONE batch,
    out of order — the engine must rank 'r' below any WAL event at
    lsn >= watermark (reference B4)."""
    spec = EventLogSpec(n_docs=200, n_events=1500, n_segments=1, seed=7)
    state = generate_initial_state(spec)
    watermark = spec.start_lsn
    snap = snapshot_read_events(state, watermark, spec)
    wal = generate_change_log(spec, out_dir=None)

    import pyarrow as pa

    mixed = pa.concat_tables([wal[0], snap])  # WAL first = worst ordering
    d = os.path.join(tmp_warehouse, "mixed")
    os.makedirs(d)
    pq.write_table(mixed, os.path.join(d, "m.parquet"))

    table = empty_table_for(
        os.path.join(tmp_warehouse, "tokens"), TOKENS_SCHEMA, num_buckets=8
    )
    apply_batch(table, load_events(spark, d), commit_key="p1:0")

    expected = oracle_apply([snap] + wal)
    assert_state_matches(spark, table, expected)


def test_idempotent_redelivery(spark, tmp_warehouse):
    """The same epoch delivered twice must be a no-op the second time
    (exactly-once under at-least-once delivery, FIXTURES.md §4)."""
    spec = EventLogSpec(n_docs=100, n_events=500, n_segments=1, seed=11)
    wal = generate_change_log(spec, out_dir=None)
    d = os.path.join(tmp_warehouse, "log")
    os.makedirs(d)
    pq.write_table(wal[0], os.path.join(d, "w.parquet"))

    table = empty_table_for(
        os.path.join(tmp_warehouse, "tokens"), TOKENS_SCHEMA, num_buckets=4
    )
    df = load_events(spark, d)
    s1 = apply_batch(table, df, commit_key="p1:0")
    v_after_first = table.current_version()
    s2 = apply_batch(table, df, commit_key="p1:0")
    assert s1["applied"] and not s2["applied"]
    assert table.current_version() == v_after_first

    expected = oracle_apply(wal)
    assert_state_matches(spark, table, expected)


def test_dedup_strategies_agree(spark, tmp_warehouse):
    from debezium_partial_snapshotter_spark.operators.dedup import latest_events

    spec = EventLogSpec(n_docs=50, n_events=800, n_segments=1, seed=3,
                        hot_frac=0.1, hot_weight=200.0)
    wal = generate_change_log(spec, out_dir=None)
    d = os.path.join(tmp_warehouse, "log")
    os.makedirs(d)
    pq.write_table(wal[0], os.path.join(d, "w.parquet"))
    df = load_events(spark, d)

    a = latest_events(df, strategy="max_by").select("doc_id", "lsn", "op")
    b = latest_events(df, strategy="window").select("doc_id", "lsn", "op")
    c = latest_events(df, strategy="max_by", salt_buckets=8).select(
        "doc_id", "lsn", "op"
    )
    d = latest_events(df, strategy="join").select("doc_id", "lsn", "op")
    e = latest_events(df, strategy="join", salt_buckets=8).select(
        "doc_id", "lsn", "op"
    )
    pa_ = a.orderBy("doc_id").toPandas()
    for other in (b, c, d, e):
        assert pa_.equals(other.orderBy("doc_id").toPandas())


def test_latest_events_join_dedups_exact_redelivery(spark):
    """The join strategy must keep exactly ONE copy of a
    duplicate-delivered event (same key, lsn, op, content). The plan is
    allowed a SortAggregate ONLY on the tied-keys branch (a narrow
    count isolates tied keys first; the wide bulk flows through an
    order-insensitive anti-join) — correctness must not depend on row
    order or per-row ids, which task retries can change."""
    from debezium_partial_snapshotter_spark.operators.dedup import latest_events

    rows = [
        ("r", "k1", 10, "true", "tokens/0000", ("k1", [1], 1, "s")),
        ("u", "k1", 12, "false", "tokens/0000", ("k1", [2], 1, "s")),
        ("u", "k1", 12, "false", "tokens/0000", ("k1", [2], 1, "s")),  # dup
        ("u", "k2", 11, "false", "tokens/0000", ("k2", [3], 1, "s")),
        ("u", "k2", 11, "false", "tokens/0000", ("k2", [3], 1, "s")),  # dup
    ]
    from debezium_partial_snapshotter_spark.schemas import CHANGE_EVENT_SCHEMA

    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    out = latest_events(df, strategy="join")
    got = {r["doc_id"]: (r["lsn"], r["op"]) for r in out.collect()}
    assert out.count() == 2
    assert got == {"k1": (12, "u"), "k2": (11, "u")}

    # tie-free input: exactly one row per key, nothing dropped
    clean = latest_events(
        df.dropDuplicates(["doc_id", "lsn"]), strategy="join"
    )
    assert clean.count() == 2
