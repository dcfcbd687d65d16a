"""Event-time window rollups (operators/windows.py) and the
watermarked streaming variant (streaming/windows.py).

Pins: tumbling/session batch semantics vs hand-computed expectations,
and the two late-data behaviors of the streaming rollup — a row later
than the watermark is DROPPED from its (already finalized) window; a
late row within the watermark still lands in its open window.
"""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from debezium_partial_snapshotter_spark.operators.windows import (
    session_rollup,
    tumbling_rollup,
)
from debezium_partial_snapshotter_spark.streaming.windows import (
    windowed_rollup_stream,
)

EV_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def T(h, m, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def epoch(h, m, s=0):
    return int(T(h, m, s).replace(tzinfo=dt.timezone.utc).timestamp())


def test_tumbling_rollup_batch(spark):
    rows = [
        (T(10, 0, 10), "A", 1.0),
        (T(10, 0, 20), "A", 2.0),
        (T(10, 0, 40), "B", 4.0),
        (T(10, 5, 0), "B", 5.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_rollup(df, window="1 minute").collect()
    }
    assert out == {
        (epoch(10, 0), "A"): (2, 3.0),
        (epoch(10, 0), "B"): (1, 4.0),
        (epoch(10, 5), "B"): (1, 5.0),
    }


def test_session_rollup_batch(spark):
    # u1: two events 10 min apart (one session with 30-min gap), then a
    # 40-min silence -> second session. u2: single event.
    rows = [
        (T(10, 0), "u1", 1.0),
        (T(10, 10), "u1", 2.0),
        (T(10, 50), "u1", 4.0),
        (T(12, 0), "u2", 8.0),
    ]
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = sorted(
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in session_rollup(df, gap="30 minutes").collect()
    )
    # session end = last event + gap (Spark session_window semantics)
    assert out == [
        ("u1", epoch(10, 0), epoch(10, 40), 2, 3.0),
        ("u1", epoch(10, 50), epoch(11, 20), 1, 4.0),
        ("u2", epoch(12, 0), epoch(12, 30), 1, 8.0),
    ]


def _feed(path, i, rows):
    t = pa.table(
        {
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(path, f"b{i:03d}.parquet"))


def _run_stream(spark, tmp_warehouse, watermark, batches, sink_name):
    src = os.path.join(tmp_warehouse, f"feed_{sink_name}")
    os.makedirs(src)
    ckpt = os.path.join(tmp_warehouse, f"ckpt_{sink_name}")
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    rolled = windowed_rollup_stream(
        stream, window="1 minute", watermark=watermark
    )
    q = (
        rolled.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        for i, rows in enumerate(batches):
            _feed(src, i, rows)
            q.processAllAvailable()
    finally:
        q.stop()
    return {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql(f"SELECT * FROM {sink_name}").collect()
    }


BATCHES = [
    # b1: two A rows in the 10:00 window; a 10:05 row pushes event time
    [(T(10, 0, 10), "A", 1.0), (T(10, 0, 20), "A", 2.0), (T(10, 5, 0), "B", 5.0)],
    # b2: a LATE A row for the 10:00 window + fresh 10:10 row
    [(T(10, 0, 30), "A", 100.0), (T(10, 10, 0), "B", 7.0)],
    # b3: far-future row finalizes everything through 10:10
    [(T(11, 0, 0), "C", 1.0)],
]


def test_stream_drops_rows_later_than_watermark(spark, tmp_warehouse):
    out = _run_stream(spark, tmp_warehouse, "1 minute", BATCHES, "wm_strict")
    # watermark after b1 = 10:04 -> the b2 late row (10:00:30) is dropped
    assert out[(epoch(10, 0), "A")] == (2, 3.0)
    assert out[(epoch(10, 5), "B")] == (1, 5.0)
    assert out[(epoch(10, 10), "B")] == (1, 7.0)
    # the 11:00 window is still open (nothing advanced the watermark past it)
    assert (epoch(11, 0), "C") not in out


def test_stream_keeps_late_rows_within_watermark(spark, tmp_warehouse):
    out = _run_stream(spark, tmp_warehouse, "20 minutes", BATCHES, "wm_loose")
    # watermark after b1 = 09:45 -> the late 10:00:30 row still lands
    assert out[(epoch(10, 0), "A")] == (3, 103.0)


def test_interval_join_semantics(spark):
    """Bucketized range join: inclusive start, exclusive end, empty
    intervals dropped, intervals spanning multiple buckets still match
    (the interval explodes into every covered bucket)."""
    from debezium_partial_snapshotter_spark.operators.windows import (
        interval_join,
    )

    intervals = spark.createDataFrame(
        [
            ("i1", T(10, 0), T(10, 30)),
            ("i2", T(10, 20), T(12, 20)),  # spans several 1h buckets
            ("i3", T(11, 0), T(11, 0)),    # empty -> dropped
        ],
        ["ivl_id", "s", "e"],
    )
    points = spark.createDataFrame(
        [
            ("p1", T(10, 0)),    # == i1.start -> inclusive
            ("p2", T(10, 25)),   # in i1 and i2
            ("p3", T(10, 30)),   # == i1.end -> exclusive; still in i2
            ("p4", T(12, 10)),   # deep into i2's later bucket
            ("p5", T(11, 0)),    # empty i3 must not match
            ("p6", T(13, 0)),    # matches nothing
        ],
        ["pid", "ts"],
    )
    got = {
        (r["pid"], r["ivl_id"])
        for r in interval_join(
            points, intervals, point_ts="ts", start_col="s", end_col="e",
            bucket_width_sec=3600,
        ).collect()
    }
    assert got == {
        ("p1", "i1"), ("p2", "i1"), ("p2", "i2"),
        ("p3", "i2"), ("p4", "i2"), ("p5", "i2"),
    }


def test_interval_join_subsecond_exactness(spark):
    """Regression (round-3 review): containment must compare the
    ORIGINAL timestamps, not second-truncated epochs — and an interval
    whose sub-second end spills past a bucket boundary must still
    cover its tail bucket."""
    from debezium_partial_snapshotter_spark.operators.windows import (
        interval_join,
    )

    us = dt.timedelta(microseconds=1)
    intervals = spark.createDataFrame(
        [
            # [10:00:00.900, 11:00:00.500): end spills into the 11:00 bucket
            ("i1", T(10, 0, 0) + 900_000 * us, T(11, 0, 0) + 500_000 * us),
            # sub-second non-empty interval on one truncated second
            ("i2", T(12, 0, 0) + 200_000 * us, T(12, 0, 0) + 800_000 * us),
        ],
        ["ivl_id", "s", "e"],
    )
    points = spark.createDataFrame(
        [
            ("p1", T(10, 0, 0) + 700_000 * us),   # before i1.start -> NO
            ("p2", T(10, 0, 0) + 900_000 * us),   # == i1.start -> yes
            ("p3", T(11, 0, 0) + 200_000 * us),   # in i1's tail bucket -> yes
            ("p4", T(11, 0, 0) + 500_000 * us),   # == i1.end -> NO
            ("p5", T(12, 0, 0) + 500_000 * us),   # inside sub-second i2 -> yes
            ("p6", T(12, 0, 0)),                  # before i2.start -> NO
        ],
        ["pid", "ts"],
    )
    got = {
        (r["pid"], r["ivl_id"])
        for r in interval_join(
            points, intervals, point_ts="ts", start_col="s", end_col="e",
            bucket_width_sec=3600,
        ).collect()
    }
    assert got == {("p2", "i1"), ("p3", "i1"), ("p5", "i2")}


def test_interval_join_rejects_shared_column_names(spark):
    from debezium_partial_snapshotter_spark.operators.windows import (
        interval_join,
    )
    import pytest

    a = spark.createDataFrame([("p", T(10, 0))], ["name", "ts"])
    b = spark.createDataFrame([("i", T(9, 0), T(11, 0))], ["name", "s", "e"])
    with pytest.raises(ValueError, match="share column names"):
        interval_join(a, b, "ts", "s", "e", 3600)


def test_local_dir_sweep_pid_liveness(tmp_path):
    """pid-* entries are swept iff their owning process is DEAD —
    never by mtime, so a live-but-shuffle-idle session keeps its
    shuffle dirs no matter how long its last write was."""
    import os
    import time

    from debezium_partial_snapshotter_spark.session import (
        _sweep_stale_local_dirs,
    )

    root = str(tmp_path)
    old = time.time() - 1_000_000  # way past any mtime cutoff

    def mk(name, mtime):
        d = os.path.join(root, name)
        os.makedirs(d)
        os.utime(d, (mtime, mtime))

    # Our own pid, ancient mtime: must survive (idle-but-alive case).
    mk(f"pid-{os.getpid()}", old)
    # pid 1 (init) is alive but not ours: must survive.
    mk("pid-1", old)
    # A pid that cannot exist on Linux (> pid_max ceiling 2^22): dead.
    mk("pid-99999999", time.time())  # fresh mtime must NOT save it
    mk("pid-garbage", old)  # unparseable: left alone
    _sweep_stale_local_dirs(root, max_age_sec=5400)
    left = sorted(os.listdir(root))
    assert left == sorted(["pid-1", "pid-garbage", f"pid-{os.getpid()}"])


def test_local_dir_sweep_legacy_mtime(tmp_path):
    """Legacy pre-pid-layout entries (blockmgr-*/spark-* directly under
    the shared root) still sweep by newest depth-2 mtime; foreign
    entries are never touched."""
    import os
    import time

    from debezium_partial_snapshotter_spark.session import (
        _sweep_stale_local_dirs,
    )

    root = str(tmp_path)
    old = time.time() - 10_000

    def mkdir(name, top_mtime, child_mtime=None):
        d = os.path.join(root, name)
        os.makedirs(os.path.join(d, "0a"))
        if child_mtime is not None:
            os.utime(os.path.join(d, "0a"), (child_mtime, child_mtime))
        os.utime(d, (top_mtime, top_mtime))

    mkdir("blockmgr-dead", old, old)          # stale everywhere -> swept
    mkdir("blockmgr-live", old, time.time())  # fresh child -> kept
    mkdir("spark-dead", old, old)             # stale driver dir -> swept
    os.makedirs(os.path.join(root, "not-spark-thing"))
    os.utime(os.path.join(root, "not-spark-thing"), (old, old))  # foreign -> kept

    _sweep_stale_local_dirs(root, max_age_sec=5400)
    left = sorted(os.listdir(root))
    assert left == ["blockmgr-live", "not-spark-thing"]


# ----------------------------------------------------------------------
# chunked (skew-safe) session rollup: identical output to native plan
# ----------------------------------------------------------------------
def _sess_set(df):
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         round(r["sum_value"], 6))
        for r in df.collect()
    }


def test_session_rollup_chunked_matches_native_random(spark):
    """Randomized equivalence: many keys, bursts and silences, chunk
    width NOT a divisor of the gap, sessions spanning several chunks,
    and chunks narrower than the gap (empty-chunk bridging)."""
    import numpy as np
    from datetime import datetime, timedelta

    from debezium_partial_snapshotter_spark.operators.windows import (
        session_rollup,
    )

    rng = np.random.default_rng(5)
    rows = []
    base = datetime(2024, 3, 1)
    for k in range(6):
        t = 0.0
        for _ in range(300):
            # mixture: mostly small gaps (inside sessions), sometimes
            # long silences (session breaks), occasionally EXACTLY the
            # gap (the >= boundary)
            r = rng.random()
            if r < 0.7:
                t += float(rng.integers(1, 900))
            elif r < 0.9:
                t += float(rng.integers(1800, 7200))
            else:
                t += 1800.0  # exactly the 30-minute gap: must MERGE
                # (Spark session windows touch at t+gap and coalesce)
            rows.append((f"u{k}", base + timedelta(seconds=t),
                         float(rng.random())))
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    native = session_rollup(df, gap="30 minutes")
    for chunk in (3600, 777, 60):  # incl. chunks << gap
        chunked = session_rollup(df, gap="30 minutes", chunk=chunk)
        assert _sess_set(chunked) == _sess_set(native), f"chunk={chunk}"


def test_session_rollup_chunked_hot_key(spark):
    """One key with 50k events (the single-task case the chunked plan
    exists for) plus cold keys: identical sessions."""
    import numpy as np
    from datetime import datetime, timedelta

    from debezium_partial_snapshotter_spark.operators.windows import (
        session_rollup,
    )

    rng = np.random.default_rng(9)
    base = datetime(2024, 3, 1)
    t = 0.0
    rows = []
    for _ in range(50_000):
        t += float(rng.integers(1, 120)) if rng.random() < 0.98 else 7200.0
        rows.append(("hot", base + timedelta(seconds=t), 1.0))
    rows += [("cold", base + timedelta(seconds=10), 2.0),
             ("cold", base + timedelta(seconds=100_000), 3.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    native = session_rollup(df, gap="30 minutes")
    chunked = session_rollup(df, gap="30 minutes", chunk=3600)
    assert _sess_set(chunked) == _sess_set(native)


def test_session_rollup_chunk_validation(spark):
    import pytest

    from debezium_partial_snapshotter_spark.operators.windows import (
        session_rollup,
    )

    df = spark.createDataFrame([("u", T(10, 0), 1.0)],
                               ["user_id", "ts", "value"])
    with pytest.raises(ValueError, match="positive"):
        session_rollup(df, chunk=0)


def test_session_rollup_chunked_multiunit_gap_and_fractional_chunk(spark):
    """Round-4 review findings: multi-unit gap strings (valid for the
    native path) must not crash the chunked path, and fractional chunk
    widths must not truncate to a zero-width chunk (which would
    silently collapse the partitioning back to per-key)."""
    from debezium_partial_snapshotter_spark.operators.windows import (
        _interval_us,
        session_rollup,
    )

    assert _interval_us("1 hour 30 minutes") == 5_400_000_000
    assert _interval_us("90 minutes") == 5_400_000_000

    rows = [("u", T(10, 0), 1.0), ("u", T(11, 29), 2.0),  # 89min < 90min gap
            ("u", T(13, 30), 4.0)]                         # 121min > gap
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    native = session_rollup(df, gap="1 hour 30 minutes")
    chunked = session_rollup(df, gap="1 hour 30 minutes", chunk=3600)
    assert _sess_set(chunked) == _sess_set(native)
    assert len(_sess_set(native)) == 2

    # fractional chunk: 0.5s chunks with a 1-second gap still partition
    # by real chunks (chunk_us=500000, never 0) and stay equivalent
    import datetime as _dt
    ms = _dt.timedelta(milliseconds=1)
    rows2 = [("u", T(10, 0, 0) + i * 300 * ms, 1.0) for i in range(10)]
    rows2.append(("u", T(10, 0, 30), 9.0))
    df2 = spark.createDataFrame(rows2, ["user_id", "ts", "value"])
    nat2 = session_rollup(df2, gap="1 seconds")
    ch2 = session_rollup(df2, gap="1 seconds", chunk=0.5)
    assert _sess_set(ch2) == _sess_set(nat2)


# ----------------------------------------------------------------------
# streaming session rollup (round 4): append-mode finalization + late data
# ----------------------------------------------------------------------
def _run_session_stream(spark, tmp_warehouse, watermark, batches, sink_name):
    from debezium_partial_snapshotter_spark.streaming.windows import (
        session_rollup_stream,
    )

    SESS_SCHEMA = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    src = os.path.join(tmp_warehouse, f"feed_{sink_name}")
    os.makedirs(src)
    ckpt = os.path.join(tmp_warehouse, f"ckpt_{sink_name}")
    stream = spark.readStream.schema(SESS_SCHEMA).parquet(src)
    rolled = session_rollup_stream(
        stream, gap="10 minutes", watermark=watermark
    )
    q = (
        rolled.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        for i, rows in enumerate(batches):
            t = pa.table(
                {
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[1] for r in rows], pa.string()),
                    "value": pa.array([r[2] for r in rows], pa.float64()),
                }
            )
            pq.write_table(t, os.path.join(src, f"b{i:03d}.parquet"))
            q.processAllAvailable()
    finally:
        q.stop()
    return {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["sum_value"]
        )
        for r in spark.sql(f"SELECT * FROM {sink_name}").collect()
    }


def test_session_stream_finalizes_and_merges_late_within_watermark(
    spark, tmp_warehouse
):
    out = _run_session_stream(
        spark, tmp_warehouse, "5 minutes",
        [
            # u1 session forming; u2 single-event session
            [(T(10, 0), "u1", 1.0), (T(10, 5), "u1", 2.0),
             (T(10, 2), "u2", 8.0)],
            # watermark after b1 = 10:00 -> the 10:07 u1 row is late but
            # WITHIN the watermark: it must extend the open session
            [(T(10, 7), "u1", 4.0)],
            # far-future row finalizes everything
            [(T(12, 0), "u3", 0.5)],
        ],
        "sess_merge",
    )
    # u1's session ends at last event + gap = 10:17 with ALL 3 events
    assert out[("u1", epoch(10, 0))] == (epoch(10, 17), 3, 7.0)
    assert out[("u2", epoch(10, 2))] == (epoch(10, 12), 1, 8.0)
    # u3's session is still open (nothing advanced the watermark past it)
    assert ("u3", epoch(12, 0)) not in out


def test_session_stream_drops_rows_later_than_watermark(
    spark, tmp_warehouse
):
    out = _run_session_stream(
        spark, tmp_warehouse, "1 minute",
        [
            [(T(10, 0), "u1", 1.0)],
            [(T(12, 0), "u3", 0.5)],   # watermark -> 11:59; u1 finalized
            [(T(10, 30), "u1", 9.0)],  # later than watermark: DROPPED
            [(T(14, 0), "u4", 0.1)],   # would finalize a 10:30 session
        ],
        "sess_drop",
    )
    assert out[("u1", epoch(10, 0))] == (epoch(10, 10), 1, 1.0)
    # the dropped row never formed a session
    assert ("u1", epoch(10, 30)) not in out


# ----------------------------------------------------------------------
# hypothesis property: chunked == native for ADVERSARIAL event layouts
# ----------------------------------------------------------------------
try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    # per-key gap sequences drawn to cluster AROUND the session gap
    # (60s) and the chunk width (100s): exact-boundary ties, empty
    # chunks, single-event sessions, runs crossing many chunks
    _gaps = st.lists(
        st.one_of(
            st.integers(1, 30),        # intra-session bursts
            st.just(60),               # EXACTLY the gap (must merge)
            st.integers(61, 400),      # session breaks / empty chunks
            st.just(100),              # exactly the chunk width
        ),
        min_size=1,
        max_size=40,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(_gaps, min_size=1, max_size=3), st.integers(0, 3))
    def test_session_chunked_equivalence_property(spark, key_gaps, shift):
        """For arbitrary per-key gap sequences (incl. exact-gap and
        exact-chunk-boundary layouts shifted against the chunk grid),
        the chunked plan's sessions equal the native plan's."""
        from datetime import datetime, timedelta

        from debezium_partial_snapshotter_spark.operators.windows import (
            session_rollup,
        )

        base = datetime(2024, 6, 1)
        rows = []
        for k, gaps in enumerate(key_gaps):
            t = float(shift * 25)  # shift layouts against the grid
            for i, g in enumerate(gaps):
                t += g
                rows.append((f"k{k}", base + timedelta(seconds=t),
                             float(i)))
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        native = _sess_set(session_rollup(df, gap="1 minutes"))
        chunked = _sess_set(
            session_rollup(df, gap="1 minutes", chunk=100)
        )
        assert chunked == native


# ----------------------------------------------------------------------
# round-5 ADVICE fixes: interval-keyword gap strings; exact_sum mode
# ----------------------------------------------------------------------
def test_interval_us_keyword_accepted_quoted_rejected():
    import pytest

    from debezium_partial_snapshotter_spark.operators.windows import (
        _interval_us,
    )

    base = _interval_us("30 minutes")
    assert _interval_us("interval 30 minutes") == base
    assert _interval_us("INTERVAL 30 minutes") == base
    assert _interval_us("interval 1 hour 30 minutes") == base + 3_600_000_000
    # a unit TYPO starting with 'interval' must still error, as must
    # the bare keyword
    with pytest.raises(ValueError):
        _interval_us("intervals")
    with pytest.raises(ValueError):
        _interval_us("interval")
    # quoted forms are rejected IN BOTH MODES (Spark's stringToInterval
    # rejects embedded quotes, so accepting them only here would be the
    # same mode divergence the keyword fix removed, mirrored)
    with pytest.raises(ValueError):
        _interval_us("'30 minutes'")
    with pytest.raises(ValueError):
        _interval_us("interval '30 minutes'")


def test_session_rollup_interval_keyword_gap_both_modes(spark):
    """The native path accepts Spark CalendarInterval spellings with
    the leading keyword; the chunked path must accept the same string
    (ADVICE r4: a mode-dependent crash breaks the identical-output
    contract)."""
    rows = [
        ("u", T(10, 0), 1.0),
        ("u", T(10, 10), 2.0),
        ("u", T(12, 0), 3.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    native = session_rollup(df, gap="interval 30 minutes")
    chunked = session_rollup(df, gap="interval 30 minutes", chunk=600)
    assert _sess_set(native) == _sess_set(chunked)
    assert native.count() == 2


def test_session_rollup_exact_sum_bit_identical(spark):
    """exact_sum=True: decimal addition is order-independent, so the
    chunked and native sums are EXACTLY equal (==, no rounding) even
    on adversarial float values whose double-sum depends on order."""
    import numpy as np
    from datetime import datetime, timedelta

    rng = np.random.default_rng(17)
    base = datetime(2024, 3, 1)
    rows = []
    t = 0.0
    for i in range(5_000):
        t += float(rng.integers(1, 300)) if rng.random() < 0.95 else 7200.0
        # wide magnitude spread maximizes order-dependence of float sums
        rows.append(("hot", base + timedelta(seconds=t),
                     float(rng.random()) * (10.0 ** float(rng.integers(-6, 7)))))
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    native = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["sum_value"])
        for r in session_rollup(df, gap="30 minutes", exact_sum=True).collect()
    }
    chunked = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["sum_value"])
        for r in session_rollup(
            df, gap="30 minutes", chunk=3600, exact_sum=True
        ).collect()
    }
    assert native == chunked  # bit-exact, including sum_value
    # and the schema still reports sum_value as double
    sdf = session_rollup(df, gap="30 minutes", exact_sum=True)
    assert dict(sdf.dtypes)["sum_value"] == "double"


def test_session_stream_checkpoint_restart_emit_once(spark, tmp_warehouse):
    """VERDICT r4 next-9: kill the streaming session rollup mid-stream
    (open session state in the store), restart from the SAME
    checkpoint, keep feeding. Emit-once must hold across the restart:
    sessions finalized before the kill are not re-emitted, and a
    session OPEN at the kill survives in state, absorbs post-restart
    events, and is emitted exactly once."""
    from debezium_partial_snapshotter_spark.streaming.windows import (
        session_rollup_stream,
    )

    SESS_SCHEMA = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    src = os.path.join(tmp_warehouse, "feed_restart")
    os.makedirs(src)
    ckpt = os.path.join(tmp_warehouse, "ckpt_restart")
    emissions = []

    def write(i, rows):
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[1] for r in rows], pa.string()),
                    "value": pa.array([r[2] for r in rows], pa.float64()),
                }
            ),
            os.path.join(src, f"b{i:03d}.parquet"),
        )

    def start():
        stream = spark.readStream.schema(SESS_SCHEMA).parquet(src)
        rolled = session_rollup_stream(
            stream, gap="10 minutes", watermark="1 minute"
        )

        def sink(df, batch_id):
            emissions.extend(
                (r["user_id"], r["session_start"], r["session_end"],
                 r["n_events"], r["sum_value"])
                for r in df.collect()
            )

        return (
            rolled.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    # ---- run 1: finalize u1+u2, leave u9's session OPEN, then kill
    q = start()
    try:
        write(0, [(T(10, 0), "u1", 1.0), (T(10, 5), "u1", 2.0),
                  (T(10, 2), "u2", 8.0)])
        q.processAllAvailable()
        write(1, [(T(11, 0), "u9", 3.0)])  # watermark 10:59: u1,u2 emit
        q.processAllAvailable()
    finally:
        q.stop()  # the kill: u9's session is open in the state store

    run1 = sorted(emissions)
    assert {e[0] for e in run1} == {"u1", "u2"}
    assert ("u1", epoch(10, 0), epoch(10, 15), 2, 3.0) in run1

    # ---- run 2: same checkpoint; u9 extends, then finalizes
    q = start()
    try:
        write(2, [(T(11, 5), "u9", 4.0)])  # within gap: merges into state
        q.processAllAvailable()
        write(3, [(T(13, 0), "u8", 0.1)])  # watermark 12:59: u9 emits
        q.processAllAvailable()
    finally:
        q.stop()

    run2 = [e for e in emissions if e not in run1]
    # the open session crossed the restart intact: both events, once
    assert run2 == [("u9", epoch(11, 0), epoch(11, 15), 2, 7.0)]
    # and nothing finalized before the kill was re-emitted
    from collections import Counter
    dupes = [k for k, c in Counter(emissions).items() if c > 1]
    assert dupes == []
