"""PySpark-native CDC / incremental-ingest engine.

A brand-new engine with the capabilities of
grantcooksey/debezium-partial-snapshotter (reference at /root/reference/,
see SURVEY.md): fine-grained, resumable, per-table-partition snapshotting
interleaved with WAL-tail streaming, re-expressed Spark-first —
DataFrame/Catalyst for the data plane, Structured Streaming +
``foreachBatch`` for the tail, a tiny keyed tracker table for snapshot
state (reference: ``PostgresJdbcFilterHandler.java:21-26``), and
MERGE-style exactly-once upserts into a bucketed lake table of
pre-tokenized training sequences.
"""

__version__ = "0.1.0"

from debezium_partial_snapshotter_spark.config import PipelineConfig  # noqa: F401
from debezium_partial_snapshotter_spark.session import get_spark  # noqa: F401
