"""As-of join (operators/asof.py): point-in-time lookup semantics.

Pins: inclusive at-or-before matching, NULL before the first build
row, per-key isolation, and the deterministic duplicate-ts tie-break
(largest seq wins).
"""

from debezium_partial_snapshotter_spark.operators.asof import asof_join


def test_asof_basic_semantics(spark):
    builds = spark.createDataFrame(
        [
            ("u1", 10, 100, 1.0),
            ("u1", 20, 101, 2.0),
            ("u2", 15, 102, 9.0),
        ],
        ["user_id", "ts", "event_id", "value"],
    )
    probes = spark.createDataFrame(
        [
            ("p1", "u1", 5),    # before any build -> NULL
            ("p2", "u1", 10),   # exactly at build ts -> inclusive (1.0)
            ("p3", "u1", 19),   # between -> 1.0
            ("p4", "u1", 25),   # after latest -> 2.0
            ("p5", "u2", 16),   # other key isolated -> 9.0
            ("p6", "u3", 50),   # key with no builds -> NULL
        ],
        ["probe_id", "user_id", "ts"],
    )
    out = {
        r["probe_id"]: r["asof_value"]
        for r in asof_join(
            probes, builds, key="user_id", ts="ts",
            value_col="value", seq_col="event_id",
        ).collect()
    }
    assert out == {
        "p1": None, "p2": 1.0, "p3": 1.0, "p4": 2.0, "p5": 9.0, "p6": None,
    }


def test_asof_duplicate_ts_tiebreak_largest_seq(spark):
    builds = spark.createDataFrame(
        [("u1", 10, 100, 1.0), ("u1", 10, 200, 5.0)],
        ["user_id", "ts", "event_id", "value"],
    )
    probes = spark.createDataFrame(
        [("p1", "u1", 10), ("p2", "u1", 99)], ["probe_id", "user_id", "ts"]
    )
    out = {
        r["probe_id"]: r["asof_value"]
        for r in asof_join(
            probes, builds, key="user_id", ts="ts",
            value_col="value", seq_col="event_id",
        ).collect()
    }
    # '200' > '100' lexicographically too — largest seq wins at the tie
    assert out == {"p1": 5.0, "p2": 5.0}
