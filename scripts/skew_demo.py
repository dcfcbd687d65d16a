"""Measured evidence for the round-4 skew-safe chunked rewrites.

Generates a deliberately skewed corpus — ONE hot key holding ~95% of
all events (the '10^8-events-for-one-user' shape scaled to the
sandbox) plus uniform cold keys — and times the native per-key window
plans against the chunked (key, time-chunk) plans on identical input.
The native plans put the hot key in ONE task regardless of
parallelism; the chunked plans spread it over #chunks tasks, which is
the property that matters at 1000 executors. Equivalence of OUTPUT is
already driver-verified (same oracle SQL); this script measures the
WALL-CLOCK effect of the rewrite under skew.

Usage: python scripts/skew_demo.py [hot_events] [chunks]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import numpy as np
    import pyarrow as pa

    from debezium_partial_snapshotter_spark import get_spark
    from debezium_partial_snapshotter_spark.operators.asof import asof_join
    from debezium_partial_snapshotter_spark.operators.windows import (
        session_rollup,
    )

    hot_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    gap = os.environ.get("DPS_SKEW_GAP", "5 minutes")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("skew-demo", parallelism=cpus, shuffle_partitions=cpus)

    rng = np.random.default_rng(7)
    span = 10_000_000  # seconds of event time
    chunk = span // n_chunks

    # hot key: ~95% of rows; 31 cold keys share the rest
    hot_ts = np.sort(rng.integers(0, span, hot_n)).astype("int64")
    cold_n = hot_n // 20
    cold_ts = rng.integers(0, span, cold_n).astype("int64")
    cold_keys = np.array([f"cold{i}" for i in rng.integers(0, 31, cold_n)])
    keys = np.concatenate([np.full(hot_n, "hot"), cold_keys])
    ts = np.concatenate([hot_ts, cold_ts])
    vals = rng.random(hot_n + cold_n)
    seq = np.arange(hot_n + cold_n, dtype="int64")
    tbl = pa.table(
        {"user_id": keys, "ts": ts, "value": vals, "event_id": seq}
    )
    src = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"skew_demo_{hot_n}.parquet"
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, src, row_group_size=131_072)
    df = spark.read.parquet(src)
    # builds = even event_ids, probes = odd — both carry the hot key
    builds = df.where("event_id % 2 = 0")
    probes = df.where("event_id % 2 = 1").select("event_id", "user_id", "ts")

    import gc

    def t(run, repeats=2):
        """Best-of-N with a JVM GC between runs: localCheckpoint blocks
        from a previous measurement otherwise squat in the block
        manager and tax the next one (same hygiene as bench.py), and
        best-of absorbs shared-host noise (25-50% run-to-run,
        BENCH ledger item 3)."""
        best = None
        for _ in range(repeats):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            run().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 2)
            best = dt if best is None else min(best, dt)
        return best

    # discarded warmup job: the first Spark job of a session pays JIT/
    # codegen/first-touch costs (~3x, BENCH ledger item 13) — timing
    # the native plan first on a cold JVM would charge all of that to
    # the native side and overstate the rewrite's win
    df.groupBy("user_id").count().write.format("noop").mode(
        "overwrite"
    ).save()

    out = {"hot_events": hot_n, "chunks": n_chunks, "parallelism": cpus, "gap": gap}
    try:
        _measure(out, t, asof_join, session_rollup, probes, builds, df, gap, chunk)
    finally:
        os.unlink(src)
    spark.stop()
    print(json.dumps(out))


def _measure(out, t, asof_join, session_rollup, probes, builds, df, gap, chunk):
    out["asof_native_sec"] = t(
        lambda: asof_join(
            probes, builds, key="user_id", ts="ts", value_col="value",
            seq_col="event_id",
        )
    )
    out["asof_chunked_sec"] = t(
        lambda: asof_join(
            probes, builds, key="user_id", ts="ts", value_col="value",
            seq_col="event_id", chunk=chunk,
        )
    )
    out["session_native_sec"] = t(
        lambda: session_rollup(
            df.withColumn(
                "ts", (df["ts"].cast("long")).cast("timestamp")
            ),
            gap=gap,
        )
    )
    out["session_chunked_sec"] = t(
        lambda: session_rollup(
            df.withColumn(
                "ts", (df["ts"].cast("long")).cast("timestamp")
            ),
            gap=gap, chunk=chunk,
        )
    )
    out["asof_speedup"] = round(
        out["asof_native_sec"] / out["asof_chunked_sec"], 2
    )
    out["session_speedup"] = round(
        out["session_native_sec"] / out["session_chunked_sec"], 2
    )


if __name__ == "__main__":
    main()
