"""Event-time window rollups: tumbling windows and session windows.

Batch twins of the watermarked Structured Streaming rollup in
``streaming/windows.py`` (brief: "watermarks + windowed aggs for late
data"). Both are single partial-aggregating shuffles:

- ``tumbling_rollup`` groups by ``F.window(ts)`` + keys — the window
  assignment is a pure projection, so the only shuffle is the groupBy,
  and min/max/sum/count all combine map-side. At 100 TB this is the
  same shape as any partial agg: each map task ships <= (windows x
  keys) rows, never the events.
- ``session_rollup`` uses Spark's native ``F.session_window`` (gap-based
  merging inside the aggregation operator): one shuffle on the session
  key, sessions merged per key without materializing per-event rows
  post-shuffle. Session end = last event + gap (Spark semantics; the
  DuckDB oracle reproduces it with a gaps-and-islands window query).

Window bounds are emitted as epoch seconds (BIGINT) so results are
engine-portable byte-for-byte (the session timezone is pinned to UTC in
``session.get_spark``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch(col):
    """Window bound -> epoch seconds. The intermediate cast to
    (tz-aware) timestamp makes this valid for TIMESTAMP_NTZ inputs too
    — parquet event-time columns commonly read back as NTZ, which
    Spark refuses to cast to BIGINT directly. Session tz is UTC, so
    the NTZ reinterpretation is the identity."""
    return col.cast("timestamp").cast("long")


def tumbling_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    window: str = "1 hour",
    agg_col: str = "value",
) -> DataFrame:
    """Fixed-size aligned windows: (window_start, *keys) -> count/sum.

    The window struct is projected then immediately flattened to an
    epoch-second BIGINT so the shuffle key is primitive (same reasoning
    as the 60-bit minhash move: primitive keys stay in whole-stage
    codegen and halve the shuffle key bytes vs a struct).
    """
    w = F.window(F.col(ts_col), window)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(agg_col).alias("sum_value"),
        )
        .select(
            _epoch(F.col("w.start")).alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def session_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    agg_col: str = "value",
) -> DataFrame:
    """Gap-based sessions per key: a new session starts when the key is
    silent for longer than ``gap``. Output one row per session with
    Spark's session bounds (start = first event, end = last event +
    gap, both as epoch seconds)."""
    sw = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(sw.alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(agg_col).alias("sum_value"),
        )
        .select(
            key,
            _epoch(F.col("w.start")).alias("session_start"),
            _epoch(F.col("w.end")).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_sec: int,
) -> DataFrame:
    """Scale-safe range-containment join: every point row pairs with
    every interval row whose ``[start, end)`` contains its timestamp.

    Spark plans a naive ``p.ts >= i.start AND p.ts < i.end`` join as
    BroadcastNestedLoop (a cross product) — quadratic and
    broadcast-bound. This re-expression makes it an EQUI-join:

    1. each interval explodes into the time buckets it covers
       (``floor(start/w) .. floor((end-1)/w)`` — end-exclusive);
    2. points compute their single bucket with one projection;
    3. equi-join on the bucket id, then the exact containment filter.

    Work is O(points + sum(interval_length)/w + output): pick
    ``bucket_width_sec`` near the typical interval length so each
    interval covers ~1-2 buckets. Both inputs shuffle once on the
    bucket id; skewed buckets split under AQE. Intervals with
    ``end <= start`` are empty ranges and are dropped (documented,
    mirrored in oracles).

    Bucketing uses second-truncated epochs but the CONTAINMENT filter
    compares the original columns, so sub-second timestamps resolve
    exactly; the covered-bucket range extends through ``floor(end/w)``
    (one possibly-superfluous bucket when the end lies exactly on a
    boundary — the exact filter rejects it) so a sub-second end's tail
    bucket is never missed.

    Output: all point columns + all interval columns — the two inputs
    must not share column names (raises ValueError; ambiguous post-join
    references would otherwise corrupt the containment filter).
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"points and intervals share column names {sorted(overlap)}; "
            "rename one side before interval_join"
        )
    rb = "_rb"
    while rb in points.columns or rb in intervals.columns:
        rb += "_"
    w = int(bucket_width_sec)
    ps = _epoch(F.col(point_ts))
    se = _epoch(F.col(start_col))
    ee = _epoch(F.col(end_col))
    p = points.withColumn(rb, F.floor(ps / w))
    iv = (
        intervals.where(F.col(end_col) > F.col(start_col))
        .withColumn(
            rb,
            F.explode(F.sequence(F.floor(se / w), F.floor(ee / w))),
        )
    )
    joined = p.join(iv, rb).where(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop(rb)
