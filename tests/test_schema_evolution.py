"""M4 — transactional schema evolution (add-column, type-widen) and
hot-key salting (north rule)."""

import os

import pytest

from debezium_partial_snapshotter_spark.config import PipelineConfig
from debezium_partial_snapshotter_spark.operators.schema_evolution import (
    conform,
    merge_schemas,
    schemas_equal,
)
from debezium_partial_snapshotter_spark.schemas import (
    CHANGE_EVENT_SCHEMA_V2,
    TOKENS_SCHEMA,
    TOKENS_SCHEMA_V2,
)
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


def test_merge_schemas_rules():
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    merged = merge_schemas(TOKENS_SCHEMA, TOKENS_SCHEMA_V2)
    names = [f.name for f in merged.fields]
    assert names == ["doc_id", "tokens", "n_tok", "source", "lang"]
    assert merged["n_tok"].dataType == LongType()  # widened

    # widening is idempotent/symmetric
    again = merge_schemas(merged, TOKENS_SCHEMA)
    assert schemas_equal(again, merged)

    # incompatible change raises
    bad = StructType([StructField("n_tok", StringType())])
    with pytest.raises(TypeError):
        merge_schemas(TOKENS_SCHEMA, bad)


def test_evolution_end_to_end(spark, tmp_warehouse):
    """v1 snapshot -> v1 WAL epoch -> v2 WAL epoch (adds lang, widens
    n_tok). The schema swap commits WITH the v2 batch; pre-evolution
    rows read back with lang=NULL; final state matches the oracle."""
    spec1 = EventLogSpec(n_docs=100, n_events=400, n_segments=1, seed=31, num_buckets=NB)
    state = generate_initial_state(spec1)
    state_path = os.path.join(tmp_warehouse, "source", "state.parquet")
    write_state(state_path, state)
    log_dir = os.path.join(tmp_warehouse, "source", "wal")
    os.makedirs(log_dir)
    cfg = PipelineConfig(
        pipeline_id="p1", warehouse=os.path.join(tmp_warehouse, "wh"), num_buckets=NB
    )
    src = ParquetWalSource(spark, state_path, log_dir, num_buckets=NB)
    runner = PartialIngestRunner(spark, cfg, src)
    runner.start()
    v_before = runner.table.current_version()

    wal1 = generate_change_log(spec1, out_dir=log_dir)
    runner.tail_batch()

    # v2 events continue AFTER the v1 log
    spec2 = EventLogSpec(
        n_docs=100, n_events=400, n_segments=1, seed=32, num_buckets=NB, schema_v2=True
    )
    wal2 = generate_change_log(
        spec2, out_dir=None, first_lsn=spec1.start_lsn + spec1.n_events + 1
    )
    import pyarrow.parquet as pq

    v2_dir = os.path.join(tmp_warehouse, "source", "wal2")
    os.makedirs(v2_dir)
    pq.write_table(wal2[0], os.path.join(v2_dir, "seg-00000.parquet"))
    src2 = ParquetWalSource(
        spark, state_path, v2_dir, num_buckets=NB, event_schema=CHANGE_EVENT_SCHEMA_V2
    )
    runner.source = src2
    stats = runner.tail_batch()
    assert stats["schema_evolved"]

    table_schema = runner.table.schema()
    assert table_schema["n_tok"].dataType.typeName() == "long"
    assert "lang" in [f.name for f in table_schema.fields]

    snap = snapshot_read_events(state, spec1.start_lsn, spec1)
    expected = oracle_apply([snap] + wal1 + wal2)
    assert_state_matches(spark, runner.table, expected, check_extra_cols=("lang",))

    # pre-evolution keys read back with lang NULL
    import pandas as pd

    actual = runner.table.read(spark).toPandas().set_index("doc_id")
    untouched = [
        k for k, v in expected.items() if "lang" not in v or v.get("lang") is None
    ]
    assert untouched, "test needs some pre-evolution survivors"
    assert actual.loc[untouched, "lang"].isna().all()


def test_salted_runner_matches_unsalted(spark, tmp_warehouse):
    """Hot-key skew: salted two-phase reduction must produce the exact
    state the unsalted plan produces."""
    spec = EventLogSpec(
        n_docs=80,
        n_events=2000,
        n_segments=1,
        seed=41,
        num_buckets=NB,
        hot_frac=0.05,
        hot_weight=500.0,  # ~4 keys absorb most updates
        delete_frac=0.1,
    )
    state = generate_initial_state(spec)
    state_path = os.path.join(tmp_warehouse, "source", "state.parquet")
    write_state(state_path, state)
    wal_dir = os.path.join(tmp_warehouse, "source", "wal")
    os.makedirs(wal_dir)

    results = {}
    for name, salt in (("plain", 0), ("salted", 16)):
        cfg = PipelineConfig(
            pipeline_id=f"p_{name}",
            warehouse=os.path.join(tmp_warehouse, "wh", name),
            num_buckets=NB,
            salt_buckets=salt,
        )
        src = ParquetWalSource(spark, state_path, wal_dir, num_buckets=NB)
        r = PartialIngestRunner(spark, cfg, src)
        r.start()  # snapshot first — WAL arrives after the window opens
        results[name] = r

    wal = generate_change_log(spec, out_dir=wal_dir)
    for r in results.values():
        r.tail_batch()

    snap = snapshot_read_events(state, spec.start_lsn, spec)
    expected = oracle_apply([snap] + wal)
    assert_state_matches(spark, results["plain"].table, expected)
    assert_state_matches(spark, results["salted"].table, expected)
