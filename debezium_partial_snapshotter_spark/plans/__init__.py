from debezium_partial_snapshotter_spark.plans.lake import LakeTable  # noqa: F401
from debezium_partial_snapshotter_spark.plans.tracker import SnapshotTracker  # noqa: F401
