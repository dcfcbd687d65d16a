"""IcebergTable logic tests WITHOUT the Iceberg runtime: a recording
fake stands in for the SparkSession/DataFrame, so the adapter's DDL,
snapshot-property plumbing, idempotence short-circuit, and schema
evolution are pinned even though no catalog exists in this sandbox.
(The full behavioral contract runs in tests/test_sink_contract.py when
a runtime is present.)"""

import pytest
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from debezium_partial_snapshotter_spark.plans import iceberg as ice

SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("n_tok", IntegerType(), True),
        StructField("_lsn", LongType(), False),
    ]
)


class FakeRow(dict):
    def __getitem__(self, k):
        return dict.__getitem__(self, k)


class FakeResult:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class FakeCatalog:
    def tableExists(self, name):
        return True


class FakeReader:
    def __init__(self, spark):
        self._spark = spark

    def option(self, *a):
        return self

    def table(self, name):
        return self._spark.table_df


class FakeSchemaDF:
    def __init__(self, schema):
        self.schema = schema


class FakeWriter:
    def __init__(self, log):
        self.log = log

    def option(self, k, v):
        self.log["options"][k] = v
        return self

    def overwrite(self, cond):
        self.log["overwrite_condition"] = str(cond._jc) if hasattr(cond, "_jc") else str(cond)
        self.log["committed"] = True


class FakeDF:
    def __init__(self, log):
        self._log = log

    def writeTo(self, identifier):
        self._log["write_target"] = identifier
        return FakeWriter(self._log)


class FakeSpark:
    def __init__(self):
        self.sqls = []
        self.snapshot_rows = []
        self.props = {
            "dps.num-buckets": "4",
            "dps.bucket-key": "doc_id",
        }
        self.catalog = FakeCatalog()
        self.table_df = FakeSchemaDF(
            StructType(list(SCHEMA.fields) + [StructField("_bucket", IntegerType(), True)])
        )

    @property
    def read(self):
        return FakeReader(self)

    def sql(self, q):
        self.sqls.append(q)
        if "SHOW TBLPROPERTIES" in q:
            return FakeResult(
                [FakeRow(key=k, value=v) for k, v in self.props.items()]
            )
        if ".snapshots" in q and "summary[" in q:
            prop = q.split("summary['")[1].split("']")[0]
            return FakeResult(
                [FakeRow(v=r.get(prop)) for r in self.snapshot_rows]
            )
        if "snapshot_id FROM" in q:
            return FakeResult([FakeRow(snapshot_id=7)] if self.snapshot_rows else [])
        return FakeResult([])


@pytest.fixture()
def fake(monkeypatch, spark):
    # `spark` is only needed so F.col(...) expressions (the overwrite
    # condition) can build against a live JVM gateway; no jobs run.
    monkeypatch.setattr(ice, "is_available", lambda s: True)
    return FakeSpark()


def test_create_ddl_pins_identity_bucket_partitioning(fake):
    ice.IcebergTable.create(fake, "cat.db.t", SCHEMA, num_buckets=4)
    ddl = fake.sqls[0]
    assert "PARTITIONED BY (_bucket)" in ddl
    assert "bucket(" not in ddl  # murmur3 transform would disagree with md5
    assert "'format-version'='2'" in ddl
    assert "'dps.num-buckets'='4'" in ddl
    assert "_bucket INT" in ddl


def test_commit_key_written_and_read_from_same_property(fake):
    t = ice.IcebergTable(fake, "cat.db.t")
    fake.snapshot_rows = [
        {ice.COMMIT_KEY_PROP: "p1:tail:0", ice.WATERMARK_PROP: "55"},
        {ice.COMMIT_KEY_PROP: None, ice.SNAPSHOT_LSN_PROP: "9"},
    ]
    assert t.committed_keys() == {"p1:tail:0"}
    assert t.watermark_lsn() == 55
    assert t.snapshot_lsn() == 9

    log = {"options": {}}
    applied = t.replace_buckets(
        FakeDF(log), [0, 2], commit_key="p1:tail:1", watermark_lsn=60
    )
    assert applied is True and log["committed"]
    # the EXACT property committed_keys() reads back, set atomically
    # with the data via the write option channel
    assert log["options"][f"snapshot-property.{ice.COMMIT_KEY_PROP}"] == "p1:tail:1"
    assert log["options"][f"snapshot-property.{ice.WATERMARK_PROP}"] == "60"
    assert "_bucket" in log["overwrite_condition"]


def test_duplicate_commit_key_short_circuits_before_any_write(fake):
    t = ice.IcebergTable(fake, "cat.db.t")
    fake.snapshot_rows = [{ice.COMMIT_KEY_PROP: "p1:tail:1"}]
    log = {"options": {}}
    assert t.replace_buckets(FakeDF(log), [0], commit_key="p1:tail:1") is False
    assert "committed" not in log  # no write happened


def test_watermark_monotonic_under_stale_caller(fake):
    t = ice.IcebergTable(fake, "cat.db.t")
    fake.snapshot_rows = [{ice.WATERMARK_PROP: "100"}]
    log = {"options": {}}
    t.replace_buckets(FakeDF(log), [0], commit_key="k", watermark_lsn=40)
    # a stale/low caller value never regresses the recorded watermark
    assert log["options"][f"snapshot-property.{ice.WATERMARK_PROP}"] == "100"


def test_schema_evolution_emits_add_and_widen(fake):
    t = ice.IcebergTable(fake, "cat.db.t")
    evolved = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("n_tok", LongType(), True),  # widen int -> long
            StructField("_lsn", LongType(), False),
            StructField("lang", StringType(), True),  # added
        ]
    )
    t._evolve_schema(evolved)
    stmts = [q for q in fake.sqls if q.startswith("ALTER TABLE")]
    assert any("ADD COLUMN lang string" in q for q in stmts)
    assert any("ALTER COLUMN n_tok TYPE bigint" in q for q in stmts)


def test_append_deltas_refuses_with_guidance(fake):
    t = ice.IcebergTable(fake, "cat.db.t")
    with pytest.raises(NotImplementedError, match="merge-on-read"):
        t.append_deltas(None, [0])
