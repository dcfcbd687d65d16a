from debezium_partial_snapshotter_spark.streaming.runner import PartialIngestRunner  # noqa: F401
