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


_GAP_UNITS = {
    "microsecond": 1e-6,
    "microseconds": 1e-6,
    "millisecond": 1e-3,
    "milliseconds": 1e-3,
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
    "week": 604800,
    "weeks": 604800,
}


def _interval_us(gap: str) -> int:
    """'90 seconds', '1 hour 30 minutes', ... -> exact microseconds.
    Multi-unit strings are valid Spark interval syntax accepted by the
    native session_window path, so the chunked path must parse them
    too (mode-dependent crashes would break the identical-output
    contract). Accepts the optional leading ``interval`` keyword
    (``interval 30 minutes``) — the CalendarInterval spelling the
    native path takes (ADVICE r4: rejecting it here reintroduced the
    mode-dependent crash this helper exists to prevent). Quoted forms
    (``'30 minutes'``) are deliberately NOT stripped: Spark's
    stringToInterval rejects embedded quotes, so accepting them here
    would create the same mode divergence in the opposite direction
    (chunk= works, native crashes)."""
    body = gap.strip()
    if body.lower().startswith("interval"):
        rest = body[len("interval"):]
        # only a KEYWORD use of 'interval' (followed by whitespace) is
        # stripped — a unit typo like 'intervals' still errors
        if rest[:1] in ("", " ", "\t"):
            body = rest.strip()
    toks = body.split()
    if not toks or len(toks) % 2:
        raise ValueError(f"cannot parse interval {gap!r}")
    total = 0
    for i in range(0, len(toks), 2):
        unit = toks[i + 1].lower()
        if unit not in _GAP_UNITS:
            raise ValueError(f"unknown interval unit {unit!r} in {gap!r}")
        # round, don't truncate: float unit multipliers (1e-6, 1e-3)
        # make e.g. 33 microseconds compute as 32.999... — int() would
        # shave 1 us and diverge from the native plan at exact-gap
        # boundaries (round-4 review, reproduced numerically)
        total += round(float(toks[i]) * _GAP_UNITS[unit] * 1_000_000)
    return total


def session_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    agg_col: str = "value",
    chunk: int | float | None = None,
    exact_sum: bool = False,
) -> DataFrame:
    """Gap-based sessions per key: a new session starts when the key is
    silent for STRICTLY LONGER than ``gap`` (two events exactly
    ``gap`` apart still merge — their [t, t+gap] windows touch; pinned
    by test_session_rollup_chunked_matches_native_random and the
    round-4 boundary probe). Output one row per session with Spark's
    session bounds (start = first event, end = last event + gap, both
    as epoch seconds).

    ``chunk`` (seconds): skew-safe mode. The native ``session_window``
    merge shuffles by KEY alone, so one hot key's session merging is a
    single task regardless of cluster size (same window-skew class as
    the as-of join — SCALING.md §7). With ``chunk`` set, events
    sessionize locally per (key, time-chunk) — the hot key becomes
    #chunks tasks — and only each chunk's FIRST and LAST partial
    sessions (the only ones that can cross a boundary: any interior
    session is already fenced by > gap breaks on both sides inside
    its chunk) go through a per-key merge pass whose input is at most
    2 rows per (key, chunk), never per-event. Output matches the
    native plan: session bounds and counts exactly; ``sum_value`` up
    to floating-point summation order (partial sums re-associate —
    same caveat as any two Spark runs with different partitioning),
    or bit-identically when ``exact_sum=True``.
    Pinned by tests/test_windows.py equivalence tests. Works for any chunk width, including chunks narrower than
    the gap — the boundary merge compares real event times, so empty
    intermediate chunks never split a session.

    ``exact_sum``: aggregate ``agg_col`` as DECIMAL(38,9), cast back to
    double on output. Decimal addition is exact and therefore
    ORDER-INDEPENDENT, so chunked and native plans become bit-identical
    on ``sum_value`` too — plain double summation re-associates under
    different partitionings and can differ in the last ulps (ADVICE r4:
    a sum landing near a rounding boundary can flip a normalized
    comparison). Off by default: the double sum is cheaper and is what
    every other aggregation here reports. DOMAIN: finite values with
    |v| < 10^29 — the non-ANSI double->decimal cast turns NaN/Infinity
    and out-of-range values into NULL (sum skips them), identically in
    native and chunked modes and in the DuckDB oracle, so the modes
    stay equivalent but the sum silently omits such values; keep the
    default double sum for data that can carry them."""
    if chunk is not None:
        return _session_rollup_chunked(
            df, ts_col, key, gap, agg_col, chunk, exact_sum
        )
    sw = F.session_window(F.col(ts_col), gap)
    sum_in = F.col(agg_col).cast("decimal(38,9)") if exact_sum else F.col(agg_col)
    sum_expr = F.sum(sum_in).cast("double") if exact_sum else F.sum(sum_in)
    return (
        df.groupBy(sw.alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_expr.alias("sum_value"),
        )
        .select(
            key,
            _epoch(F.col("w.start")).alias("session_start"),
            _epoch(F.col("w.end")).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def _session_rollup_chunked(
    df: DataFrame,
    ts_col: str,
    key: str,
    gap: str,
    agg_col: str,
    chunk: int | float,
    exact_sum: bool = False,
) -> DataFrame:
    """See session_rollup(chunk=...). All event-time arithmetic is in
    exact integer MICROSECONDS (unix_micros) — double epoch seconds
    could misround a diff exactly at the gap boundary, diverging from
    the native plan's microsecond-interval comparison. Break rule
    matches Spark's session_window (and the DuckDB oracle): a new
    session when ts - prev_ts > gap (STRICT: Spark merges sessions
    whose windows touch, so events exactly gap apart stay in one
    session — verified against F.session_window directly)."""
    from pyspark.sql import Window

    gap_us = _interval_us(gap)
    # fractional chunk widths are legal (sub-second gaps are); the
    # floor must happen in MICROSECONDS — int(chunk) would turn
    # chunk=0.5 into chunk_us=0, and _us/0 is NULL in Spark, silently
    # collapsing the partitioning back to per-key (the exact
    # single-task plan this mode exists to avoid)
    chunk_us = int(float(chunk) * 1_000_000)
    if chunk_us <= 0:
        raise ValueError(f"chunk must be positive (>= 1 microsecond), got {chunk}")
    vcol = F.col(agg_col).cast("decimal(38,9)") if exact_sum else F.col(agg_col)
    ev = df.select(
        F.col(key).alias("_k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        vcol.alias("_v"),
    ).where(F.col("_us").isNotNull())
    ev = ev.withColumn("_chunk", F.floor(F.col("_us") / F.lit(chunk_us)))

    # phase 1: local sessionize per (key, chunk) — the heavy pass, on
    # a partitioning the hot key cannot skew
    w1 = Window.partitionBy("_k", "_chunk").orderBy("_us")
    brk = F.when(
        F.lag("_us").over(w1).isNull()
        | ((F.col("_us") - F.lag("_us").over(w1)) > gap_us),
        1,
    ).otherwise(0)
    loc = (
        ev.withColumn(
            "_sid",
            F.sum(brk).over(
                w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("_k", "_chunk", "_sid")
        .agg(
            F.min("_us").alias("_s0"),
            F.max("_us").alias("_s1"),
            F.count(F.lit(1)).alias("_n"),
            F.sum("_v").alias("_sum"),
        )
    )
    # the groupBy key (_k,_chunk,_sid) is a superset of the window
    # partitioning (_k,_chunk), so no second exchange is planned here

    # phase 2: only each chunk's first/last partial session can cross
    # a boundary; everything else is final
    w2 = Window.partitionBy("_k", "_chunk")
    loc = loc.withColumn(
        "_edge",
        (F.col("_sid") == F.min("_sid").over(w2))
        | (F.col("_sid") == F.max("_sid").over(w2)),
    )
    # interior and cand are two branches over the SAME subtree, and
    # Catalyst does not reuse exchanges across separately optimized
    # subtrees (the round-3 jaccard lesson) — without truncation the
    # whole scan -> (k, chunk) shuffle -> sessionize pipeline runs
    # twice. loc is O(sessions), narrow, and safe to pin.
    loc = loc.localCheckpoint(eager=False)
    interior = loc.where(~F.col("_edge")).select(
        "_k", "_s0", "_s1", "_n", "_sum"
    )
    cand = loc.where(F.col("_edge"))
    w3 = Window.partitionBy("_k").orderBy("_s0")
    brk2 = F.when(
        F.lag("_s1").over(w3).isNull()
        | ((F.col("_s0") - F.lag("_s1").over(w3)) > gap_us),
        1,
    ).otherwise(0)
    merged = (
        cand.withColumn(
            "_isl",
            F.sum(brk2).over(
                w3.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("_k", "_isl")
        .agg(
            F.min("_s0").alias("_s0"),
            F.max("_s1").alias("_s1"),
            F.sum("_n").alias("_n"),
            F.sum("_sum").alias("_sum"),
        )
        .select("_k", "_s0", "_s1", "_n", "_sum")
    )
    out = interior.unionByName(merged)
    return out.select(
        F.col("_k").alias(key),
        F.floor(F.col("_s0") / F.lit(1_000_000.0)).cast("long").alias(
            "session_start"
        ),
        F.floor((F.col("_s1") + gap_us) / F.lit(1_000_000.0)).cast(
            "long"
        ).alias("session_end"),
        F.col("_n").alias("n_events"),
        (F.col("_sum").cast("double") if exact_sum else F.col("_sum")).alias(
            "sum_value"
        ),
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
