"""Distributed as-of join: point-in-time lookups over a keyed,
timestamped build side.

The CDC/feature-store staple: for each probe row (key, ts), the value
of the latest build row with build.ts <= probe.ts for the same key.
Spark has no native ASOF JOIN; the classic scale-safe re-expression is
union-then-window:

1. union build rows (carrying value) and probe rows (carrying NULL);
2. one shuffle on key, one sort on (ts, side, seq) per partition;
3. ``last(value, ignorenulls=True)`` over ROWS UNBOUNDED PRECEDING
   fills each probe with the most recent build value at or before it.

Cost: ONE shuffle of |build| + |probe| rows and one per-partition sort
— same shape as any windowed dedup, no range-explosion, no per-row
Python. A naive range join (probe.ts >= build.ts) would be quadratic
per key; the window formulation is O(n log n) per key.

Skew caveat (corrected round 4 — the earlier "AQE-skew-splittable"
claim here was wrong): AQE's skew optimization splits oversized
partitions of sort-merge/shuffled-hash JOINS only; a
``Window.partitionBy(key)`` exchange requires every row of a key in
one partition, so a hot key (one entity with 10^8 events) is a single
task no matter the cluster size. For skewed corpora pass
``chunk=<seconds>``: rows are windowed per (key, time-chunk) — the hot
key's work spreads over #chunks tasks — and each chunk's carry-in (the
latest build value from any EARLIER chunk) is computed by a second
as-of pass over the tiny per-(key, chunk) tail table (one row per
chunk that contains builds), then injected as a synthetic
sorts-first fill row. Output is bit-identical to the unchunked plan
(pinned by tests/test_asof.py equivalence tests).

Determinism: rows are ordered by (ts, side, seq) where build sorts
before probe at equal ts (inclusive "at or before" semantics) and
``seq`` — kept in its NATIVE type, so numeric sequence columns order
numerically — breaks build-build ties at identical ts (largest seq
wins; a pinned choice, unlike native ASOF JOIN implementations that
leave duplicate-ts resolution undefined). A NULL-valued build row
genuinely yields NULL (the window fills a build-tagged STRUCT, not the
raw value, so "latest value is NULL" is distinguishable from "no build
row yet"). The DuckDB oracle uses the IDENTICAL window formulation,
so results are hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def _chunk_of(col: "F.Column", dtype, chunk: int | float) -> "F.Column":
    """Monotone ts -> chunk-id mapping (any monotone function is
    correct here: equal ts always land in the same chunk, and
    chunk(b) < chunk(p) implies b.ts < p.ts, which is all the carry-in
    pass relies on). Numeric ts chunks in its own units; timestamps in
    seconds."""
    if isinstance(dtype, NumericType):
        return F.floor(col / F.lit(chunk)).cast("long")
    # TIMESTAMP_NTZ won't cast straight to a number; go via timestamp
    # (session tz pinned UTC) -> double epoch seconds
    return F.floor(col.cast("timestamp").cast("double") / F.lit(float(chunk))).cast(
        "long"
    )


def asof_join(
    probes: DataFrame,
    builds: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    seq_col: str | None = None,
    out_col: str = "asof_value",
    chunk: int | float | None = None,
) -> DataFrame:
    """For every probe row, attach the build ``value_col`` as of
    (<=) the probe's ``ts`` per ``key``; NULL when no build row
    precedes it (or the latest preceding build row's value is NULL).
    Output = probe columns + ``out_col``.

    ``seq_col`` (default: ``ts``) orders build rows that tie on
    (key, ts) — the row with the largest ``seq_col`` (native-type
    ordering; NULL seq sorts first and so loses ties) wins.

    ``chunk`` (seconds for timestamp ``ts``, own units for numeric):
    skew-safe mode for hot keys. The window partitions by
    (key, time-chunk) instead of key — a key with 10^8 events becomes
    #chunks tasks, not one — and chunk boundaries are bridged by a
    carry-in pass over the per-(key, chunk) build tails (one row per
    chunk containing builds, so the key-partitioned second window sees
    #chunks rows per key, never #events). Output is identical to the
    unchunked plan.
    """
    seq_col = seq_col or ts
    probe_cols = probes.columns
    seq_type = builds.schema[seq_col].dataType
    # the window fills a struct so a build row whose VALUE is null is
    # still a non-null fill marker — last(ignorenulls) must skip only
    # the probe rows, never null-valued builds
    # a build row with NULL ts has no position on the time axis — it
    # must not fill anything (unfiltered it would sort NULLS-FIRST in
    # Spark, i.e. "before everything", while SQL engines default
    # NULLS LAST: semantically wrong AND engine-divergent)
    b = builds.where(F.col(ts).isNotNull()).select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(seq_col).alias("_seq"),
        F.struct(F.col(value_col).alias("v")).alias("_fill"),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(f"_p_{c}") for c in probe_cols],
    )
    p = probes.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(seq_type).alias("_seq"),
        F.lit(None).cast(b.schema["_fill"].dataType).alias("_fill"),
        *[F.col(c).alias(f"_p_{c}") for c in probe_cols],
    )
    if chunk is None:
        part_cols = ["_k"]
        rows = b.unionByName(p)
    else:
        if chunk <= 0:
            raise ValueError(f"chunk must be positive, got {chunk}")
        b_ck = _chunk_of(F.col("_ts"), builds.schema[ts].dataType, chunk)
        p_ck = _chunk_of(F.col("_ts"), probes.schema[ts].dataType, chunk)
        b = b.withColumn("_chunk", b_ck)
        p = p.withColumn("_chunk", p_ck)
        carry = _chunk_carry(b, p, probes, probe_cols, seq_type)
        part_cols = ["_k", "_chunk"]
        rows = b.unionByName(p).unionByName(carry)
    # explicit nulls-first on every ordering column (Spark's asc
    # default, but pinned so the oracle can state the same): a probe
    # with NULL ts sorts before every build row and fills NULL; in
    # chunked mode the carry-in row (_ts NULL, _side -1) sorts before
    # everything in its (key, chunk) partition
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(
            F.asc_nulls_first("_ts"),
            F.asc_nulls_first("_side"),
            F.asc_nulls_first("_seq"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = rows.withColumn(
        "_last_fill", F.last("_fill", ignorenulls=True).over(w)
    )
    return filled.where(F.col("_side") == 1).select(
        *[F.col(f"_p_{c}").alias(c) for c in probe_cols],
        F.col("_last_fill.v").alias(out_col),
    )


def _chunk_carry(
    b: DataFrame,
    p: DataFrame,
    probes: DataFrame,
    probe_cols: list[str],
    seq_type,
) -> DataFrame:
    """Carry-in rows for chunked as-of: for each distinct probe
    (key, chunk), the latest build fill from any STRICTLY EARLIER
    chunk, shaped as a union-compatible synthetic row that sorts first
    in its partition (_ts NULL, _side -1).

    Two key-partitioned but TINY stages: (1) per-(key, chunk) build
    tails via row_number (at most one row per chunk with builds — the
    hot key contributes #chunks rows here, not #events); (2) a
    recursive unchunked as-of on the chunk axis, with build chunks
    shifted +1 so the inclusive <= becomes strictly-earlier <."""
    tail_w = Window.partitionBy("_k", "_chunk").orderBy(
        F.desc_nulls_last("_ts"), F.desc_nulls_last("_seq")
    )
    tails = (
        b.withColumn("_rn", F.row_number().over(tail_w))
        .where(F.col("_rn") == 1)
        .select("_k", "_chunk", "_fill")
    )
    probe_chunks = p.select("_k", "_chunk").distinct()
    shifted = tails.select(
        "_k",
        (F.col("_chunk") + F.lit(1)).alias("_chunk"),
        F.col("_fill").alias("_tfill"),
    )
    carried = asof_join(
        probe_chunks,
        shifted,
        key="_k",
        ts="_chunk",
        value_col="_tfill",
        out_col="_carry",
    )
    return carried.select(
        F.col("_k"),
        F.col("_chunk"),
        F.lit(None).cast(b.schema["_ts"].dataType).alias("_ts"),
        F.lit(-1).alias("_side"),
        F.lit(None).cast(seq_type).alias("_seq"),
        F.col("_carry").alias("_fill"),
        *[
            F.lit(None).cast(probes.schema[c].dataType).alias(f"_p_{c}")
            for c in probe_cols
        ],
    )
