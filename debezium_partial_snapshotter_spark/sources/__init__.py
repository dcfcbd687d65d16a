from debezium_partial_snapshotter_spark.sources.eventlog import (  # noqa: F401
    EventLogSpec,
    generate_change_log,
    generate_initial_state,
    oracle_apply,
    snapshot_read_events,
)
