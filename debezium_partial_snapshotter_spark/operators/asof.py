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
per key; the window formulation is O(n log n) per key and AQE-skew-
splittable.

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


def asof_join(
    probes: DataFrame,
    builds: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    seq_col: str | None = None,
    out_col: str = "asof_value",
) -> DataFrame:
    """For every probe row, attach the build ``value_col`` as of
    (<=) the probe's ``ts`` per ``key``; NULL when no build row
    precedes it (or the latest preceding build row's value is NULL).
    Output = probe columns + ``out_col``.

    ``seq_col`` (default: ``ts``) orders build rows that tie on
    (key, ts) — the row with the largest ``seq_col`` (native-type
    ordering; NULL seq sorts first and so loses ties) wins.
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
    # explicit nulls-first on every ordering column (Spark's asc
    # default, but pinned so the oracle can state the same): a probe
    # with NULL ts sorts before every build row and fills NULL
    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.asc_nulls_first("_ts"),
            F.asc_nulls_first("_side"),
            F.asc_nulls_first("_seq"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = b.unionByName(p).withColumn(
        "_last_fill", F.last("_fill", ignorenulls=True).over(w)
    )
    return filled.where(F.col("_side") == 1).select(
        *[F.col(f"_p_{c}").alias(c) for c in probe_cols],
        F.col("_last_fill.v").alias(out_col),
    )
