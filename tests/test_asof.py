"""As-of join (operators/asof.py): point-in-time lookup semantics.

Pins: inclusive at-or-before matching, NULL before the first build
row, per-key isolation, and the deterministic duplicate-ts tie-break
(largest seq wins).
"""

import numpy as np
import pytest

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
    assert out == {"p1": 5.0, "p2": 5.0}


def test_asof_numeric_seq_orders_numerically_not_lexically(spark):
    """Regression: seq 11 must beat seq 9 at a tied ts (a string cast
    would pick 9 because '9' > '11')."""
    builds = spark.createDataFrame(
        [("u1", 10, 9, 1.0), ("u1", 10, 11, 2.0)],
        ["user_id", "ts", "event_id", "value"],
    )
    probes = spark.createDataFrame([("p1", "u1", 10)], ["probe_id", "user_id", "ts"])
    out = asof_join(
        probes, builds, key="user_id", ts="ts",
        value_col="value", seq_col="event_id",
    ).collect()
    assert out[0]["asof_value"] == 2.0


def test_asof_null_build_value_is_not_shadowed(spark):
    """Regression: the latest build row's value being NULL must yield
    NULL, not resurrect the previous non-null value."""
    builds = spark.createDataFrame(
        [("u1", 10, 1, 1.0), ("u1", 20, 2, None)],
        ["user_id", "ts", "event_id", "value"],
    )
    probes = spark.createDataFrame(
        [("p1", "u1", 15), ("p2", "u1", 25)], ["probe_id", "user_id", "ts"]
    )
    out = {
        r["probe_id"]: r["asof_value"]
        for r in asof_join(
            probes, builds, key="user_id", ts="ts",
            value_col="value", seq_col="event_id",
        ).collect()
    }
    assert out == {"p1": 1.0, "p2": None}


@pytest.mark.parametrize("seed,n_keys,n_build,n_probe,ts_range", [
    (7, 5, 60, 60, 40),      # dense ts collisions (range << rows)
    (23, 1, 50, 80, 25),     # single hot key, many duplicate ts
    (41, 20, 150, 150, 10_000),  # sparse
])
def test_asof_random_matches_brute_force(
    spark, seed, n_keys, n_build, n_probe, ts_range
):
    """Randomized scenarios (incl. heavy duplicate-ts collisions) vs a
    per-probe brute-force scan implementing the same contract: latest
    build at-or-before ts, ties on ts broken by largest seq string."""
    rng = np.random.default_rng(seed)
    builds = [
        (f"k{rng.integers(n_keys)}", int(rng.integers(ts_range)), i,
         float(i) + 0.5)
        for i in range(n_build)
    ]
    probes = [
        (f"p{j}", f"k{rng.integers(n_keys)}", int(rng.integers(ts_range)))
        for j in range(n_probe)
    ]

    def brute(key, ts):
        cands = [b for b in builds if b[0] == key and b[1] <= ts]
        if not cands:
            return None
        # order mirrors the operator: (ts, native seq), last wins
        cands.sort(key=lambda b: (b[1], b[2]))
        return cands[-1][3]

    want = {p[0]: brute(p[1], p[2]) for p in probes}

    bdf = spark.createDataFrame(builds, ["user_id", "ts", "event_id", "value"])
    pdf = spark.createDataFrame(probes, ["probe_id", "user_id", "ts"])
    got = {
        r["probe_id"]: r["asof_value"]
        for r in asof_join(
            pdf, bdf, key="user_id", ts="ts",
            value_col="value", seq_col="event_id",
        ).collect()
    }
    assert got == want


def test_asof_null_ts_build_rows_never_fill(spark):
    """Regression: a build row with NULL ts has no position on the time
    axis — it must not fill any probe (unfiltered it would sort
    nulls-first, i.e. 'before everything')."""
    builds = spark.createDataFrame(
        [("u1", None, 1, 9.0), ("u1", 10, 2, 1.0)],
        ["user_id", "ts", "event_id", "value"],
    )
    probes = spark.createDataFrame(
        [("p1", "u1", 5), ("p2", "u1", 15)], ["probe_id", "user_id", "ts"]
    )
    out = {
        r["probe_id"]: r["asof_value"]
        for r in asof_join(
            probes, builds, key="user_id", ts="ts",
            value_col="value", seq_col="event_id",
        ).collect()
    }
    assert out == {"p1": None, "p2": 1.0}


# ---------------------------------------------------------------------------
# chunked (skew-safe) mode: identical output to the unchunked plan
# ---------------------------------------------------------------------------
def test_asof_chunked_matches_unchunked_hot_key(spark):
    """VERDICT r3 next-2: one hot key holding ~1e5 build rows — the
    chunked plan (partition by (key, chunk), carry-in from per-chunk
    tails) must produce output identical to the single-task-per-key
    unchunked plan, including probes whose chunk has no builds and
    probes before the first build."""
    import numpy as np

    rng = np.random.default_rng(11)
    n_hot = 100_000
    builds = [("hot", int(t), i, float(i)) for i, t in
              enumerate(rng.integers(0, 500_000, n_hot))]
    # a couple of cold keys so per-key isolation is exercised too
    builds += [("cold", 10, n_hot + 1, -1.0), ("cold", 400_000, n_hot + 2, -2.0)]
    probes = [(f"p{j}", "hot", int(t)) for j, t in
              enumerate(rng.integers(-1000, 510_000, 2_000))]
    probes += [("pc1", "cold", 5), ("pc2", "cold", 399_999),
               ("pc3", "cold", 400_000), ("pc4", "nokey", 100)]

    bdf = spark.createDataFrame(builds, ["user_id", "ts", "event_id", "value"])
    pdf = spark.createDataFrame(probes, ["probe_id", "user_id", "ts"])
    kw = dict(key="user_id", ts="ts", value_col="value", seq_col="event_id")
    base = {r["probe_id"]: r["asof_value"]
            for r in asof_join(pdf, bdf, **kw).collect()}
    # chunk small enough that many chunks are empty and many boundaries
    # are crossed; numeric ts -> chunk in ts units
    chunked = {r["probe_id"]: r["asof_value"]
               for r in asof_join(pdf, bdf, chunk=1000, **kw).collect()}
    assert chunked == base


def test_asof_chunked_edge_semantics(spark):
    """Chunk-boundary + NULL edge cases: build exactly at a boundary,
    probe at the same boundary (inclusive), NULL-ts probe stays NULL,
    NULL build value carried across chunks stays a genuine NULL fill,
    duplicate-ts tie-break preserved across the chunked plan."""
    builds = spark.createDataFrame(
        [
            ("u", 1000, 1, 1.0),    # exactly at a chunk=1000 boundary
            ("u", 1000, 2, 2.0),    # duplicate ts: larger seq wins
            ("u", 2999, 3, None),   # NULL value just before boundary
            ("u2", 500, 4, 7.0),
        ],
        "user_id string, ts long, event_id long, value double",
    )
    probes = spark.createDataFrame(
        [
            ("a", "u", 999),    # chunk before the build chunk -> NULL
            ("b", "u", 1000),   # same ts, inclusive -> 2.0 (seq tie-break)
            ("c", "u", 2500),   # later chunk, carry-in -> 2.0
            ("d", "u", 3005),   # carry-in of a NULL-valued build -> None
            ("e", "u", None),   # NULL ts probe -> None
            ("f", "u2", 99999), # far-future probe, many empty chunks
        ],
        "probe_id string, user_id string, ts long",
    )
    kw = dict(key="user_id", ts="ts", value_col="value", seq_col="event_id")
    want = {"a": None, "b": 2.0, "c": 2.0, "d": None, "e": None, "f": 7.0}
    base = {r["probe_id"]: r["asof_value"]
            for r in asof_join(probes, builds, **kw).collect()}
    assert base == want  # sanity: unchunked agrees with hand-computed
    got = {r["probe_id"]: r["asof_value"]
           for r in asof_join(probes, builds, chunk=1000, **kw).collect()}
    assert got == want


@pytest.mark.parametrize("seed", [3, 17])
def test_asof_chunked_random_matches_unchunked(spark, seed):
    """Randomized equivalence incl. duplicate ts, NULL probe ts, and a
    chunk size that is NOT a divisor of the ts range."""
    import numpy as np

    rng = np.random.default_rng(seed)
    builds = [
        (f"k{rng.integers(4)}", int(rng.integers(1000)), i, float(i) + 0.5)
        for i in range(300)
    ]
    probes = [
        (f"p{j}", f"k{rng.integers(5)}",
         None if rng.random() < 0.05 else int(rng.integers(1000)))
        for j in range(300)
    ]
    bdf = spark.createDataFrame(builds, "user_id string, ts long, event_id long, value double")
    pdf = spark.createDataFrame(probes, "probe_id string, user_id string, ts long")
    kw = dict(key="user_id", ts="ts", value_col="value", seq_col="event_id")
    base = {r["probe_id"]: r["asof_value"]
            for r in asof_join(pdf, bdf, **kw).collect()}
    got = {r["probe_id"]: r["asof_value"]
           for r in asof_join(pdf, bdf, chunk=37, **kw).collect()}
    assert got == base


def test_asof_chunked_timestamp_ts(spark):
    """chunk= is in seconds for timestamp ts columns."""
    from datetime import datetime

    T = datetime
    builds = spark.createDataFrame(
        [("u", T(2024, 1, 1, 10, 0, 0), 1, 1.0),
         ("u", T(2024, 1, 1, 13, 30, 0), 2, 2.0)],
        ["user_id", "ts", "event_id", "value"],
    )
    probes = spark.createDataFrame(
        [("a", "u", T(2024, 1, 1, 9, 0, 0)),
         ("b", "u", T(2024, 1, 1, 12, 0, 0)),
         ("c", "u", T(2024, 1, 1, 23, 0, 0))],
        ["probe_id", "user_id", "ts"],
    )
    kw = dict(key="user_id", ts="ts", value_col="value", seq_col="event_id")
    want = {"a": None, "b": 1.0, "c": 2.0}
    got = {r["probe_id"]: r["asof_value"]
           for r in asof_join(probes, builds, chunk=3600, **kw).collect()}
    assert got == want


def test_asof_chunk_must_be_positive(spark):
    builds = spark.createDataFrame([("u", 1, 1, 1.0)],
                                   ["user_id", "ts", "event_id", "value"])
    probes = spark.createDataFrame([("p", "u", 2)],
                                   ["probe_id", "user_id", "ts"])
    with pytest.raises(ValueError, match="positive"):
        asof_join(probes, builds, key="user_id", ts="ts",
                  value_col="value", chunk=0)
