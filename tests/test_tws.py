"""transformWithStateInPandas TTL latest-event filter (VERDICT r5
next-2): the runtime gate, equivalence with the applyInPandasWithState
operator when the runtime can execute TWS, and — always executed,
TWS or not — the proof that an evicted key's re-opened suppression
window is harmless at the lake (state wiped entirely = the worst-case
eviction, re-emissions re-applied through the REAL sink merge)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from debezium_partial_snapshotter_spark.streaming.tws import (
    TwsUnavailableError,
    latest_events_tws,
    tws_available,
)
from tests.test_stateful import FLAT, _run_stream, _write

TWS_OK, TWS_REASON = tws_available()


def test_gate_matches_runtime_reality(spark, tmp_warehouse):
    """Whatever the runtime, the gate must tell the truth: either TWS
    executes, or latest_events_tws raises the TYPED error up front
    (never a mid-query worker crash) with the measured reason."""
    feed = os.path.join(tmp_warehouse, "feed")
    os.makedirs(feed)
    stream = spark.readStream.schema(FLAT).parquet(feed)
    if TWS_OK:
        df = latest_events_tws(stream, ttl_ms=3600_000)
        assert df.isStreaming
    else:
        # this environment (measured): the API imports but the executor
        # wire protocol needs google.protobuf, which is absent
        assert "protobuf" in TWS_REASON or "google" in TWS_REASON
        with pytest.raises(TwsUnavailableError, match="wire protocol"):
            latest_events_tws(stream)
    with pytest.raises(ValueError, match="ttl_ms"):
        latest_events_tws(stream, ttl_ms=0)


def _run_stream_tws(spark, in_dir, chk, out_rows, ttl_ms):
    stream = spark.readStream.schema(FLAT).parquet(in_dir)
    deduped = latest_events_tws(stream, ttl_ms=ttl_ms)

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


@pytest.mark.skipif(
    not TWS_OK, reason=f"TWS runtime gate: {TWS_REASON}"
)
def test_tws_equivalence_with_apply_in_pandas_with_state(
    spark, tmp_warehouse
):
    """Same feed through both operators (TTL long enough that nothing
    evicts): identical emissions per batch, including cross-batch
    redelivery suppression."""
    batch1 = [("a", 10, "u", 1.0), ("a", 12, "u", 2.0), ("b", 11, "c", 5.0)]
    batch2 = batch1 + [("b", 13, "u", 6.0)]
    outs = {"aipws": [], "tws": []}
    dirs = {}
    for name in outs:
        d = os.path.join(tmp_warehouse, f"feed_{name}")
        os.makedirs(d)
        dirs[name] = d
        _write(batch1, os.path.join(d, "b1.parquet"))
    _run_stream(spark, dirs["aipws"], os.path.join(tmp_warehouse, "ck_a"),
                outs["aipws"])
    _run_stream_tws(spark, dirs["tws"], os.path.join(tmp_warehouse, "ck_t"),
                    outs["tws"], ttl_ms=24 * 3600 * 1000)
    assert sorted(outs["aipws"]) == sorted(outs["tws"])
    for name in outs:
        outs[name].clear()
        _write(batch2, os.path.join(dirs[name], "b2.parquet"))
    _run_stream(spark, dirs["aipws"], os.path.join(tmp_warehouse, "ck_a"),
                outs["aipws"])
    _run_stream_tws(spark, dirs["tws"], os.path.join(tmp_warehouse, "ck_t"),
                    outs["tws"], ttl_ms=24 * 3600 * 1000)
    assert sorted(outs["aipws"]) == sorted(outs["tws"]) == [
        ("b", 13, "u", 6.0)
    ]


def test_evicted_state_reopen_is_harmless_downstream(spark, tmp_warehouse):
    """EXECUTES the idempotent-sink argument the TTL story rests on
    (stateful.py:86-90 / tws.py docstring), previously only asserted:
    after total state loss (a fresh checkpoint — strictly worse than
    any TTL eviction), a full redelivery re-emits stale winners —
    including EQUAL-ordinal copies of rows already applied — and
    pushing those re-emissions through the REAL sink merge
    (operators/upsert.apply_batch, CoW) leaves the applied table
    byte-identical to the oracle, one row per key, no duplicate from
    the self-tie (the pre-commit tie validation + guarded retry)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    from debezium_partial_snapshotter_spark.operators.upsert import (
        apply_batch,
        empty_table_for,
    )

    payload = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("value", DoubleType(), True),
        ]
    )

    def to_envelope(emissions):
        flat = spark.createDataFrame(
            [(d, lsn, op, v) for d, lsn, op, v in emissions], FLAT
        )
        return flat.select(
            "op",
            "doc_id",
            "lsn",
            F.when(F.col("op") == "d", F.lit(None).cast(payload))
            .otherwise(F.struct("doc_id", "value"))
            .alias("after"),
        )

    table = empty_table_for(
        os.path.join(tmp_warehouse, "t"), payload, num_buckets=4
    )
    batch1 = [
        ("a", 10, "u", 1.0), ("a", 12, "u", 2.0),
        ("b", 11, "c", 5.0), ("c", 14, "d", 0.0), ("c", 9, "u", 3.0),
    ]
    feed1 = os.path.join(tmp_warehouse, "feed1")
    os.makedirs(feed1)
    out1 = []
    _write(batch1, os.path.join(feed1, "b1.parquet"))
    _run_stream(spark, feed1, os.path.join(tmp_warehouse, "ck1"), out1)
    assert apply_batch(table, to_envelope(out1), commit_key="s:1")["applied"]

    # worst-case eviction: state store gone entirely (fresh checkpoint
    # + fresh source dir). Redeliver EVERYTHING plus one real advance.
    batch2 = batch1 + [("b", 20, "u", 7.0)]
    feed2 = os.path.join(tmp_warehouse, "feed2")
    os.makedirs(feed2)
    out2 = []
    _write(batch2, os.path.join(feed2, "b1.parquet"))
    _run_stream(spark, feed2, os.path.join(tmp_warehouse, "ck2"), out2)
    # the suppression window genuinely re-opened: stale/equal-ordinal
    # winners re-emitted alongside the genuine advance
    assert ("a", 12, "u", 2.0) in out2  # equal-ord copy of an applied row
    assert ("b", 20, "u", 7.0) in out2

    st = apply_batch(table, to_envelope(out2), commit_key="s:2")
    assert st["applied"]

    rows = table.read(spark).collect()
    got = {r["doc_id"]: (r["value"], r["_lsn"]) for r in rows}
    # oracle: winner per key over ALL unique events; c's winner is the
    # delete -> absent
    assert got == {"a": (2.0, 12), "b": (7.0, 20)}
    assert len(rows) == len(got)  # no duplicate row from the self-tie
