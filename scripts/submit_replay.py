"""spark-submit entrypoint for the CDC replay job (north rule: runs via
``spark-submit --py-files`` on multi-executor clusters).

Cluster usage:

    cd /root/repo && zip -r /tmp/dps.zip debezium_partial_snapshotter_spark
    spark-submit \
      --master <cluster-master> \
      --py-files /tmp/dps.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.join.preferSortMergeJoin=false \
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \
      scripts/submit_replay.py \
      --state <source state parquet> --wal <wal dir> \
      --warehouse <target warehouse> --pipeline-id prod1 \
      --num-buckets 65536 --write-mode mor

Local smoke: ``python scripts/submit_replay.py --demo`` generates a
small log and replays it end-to-end.

Note the session here comes from ``SparkSession.builder`` WITHOUT a
hard-coded master — spark-submit owns deployment; the repo's
``get_spark`` helper is only for local tooling.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--state", help="source state parquet (bounded snapshot source)")
    p.add_argument("--wal", help="change-event log directory")
    p.add_argument("--warehouse", help="target warehouse root")
    p.add_argument("--pipeline-id", default="pipeline1")
    p.add_argument("--num-buckets", type=int, default=32)
    p.add_argument("--write-mode", choices=["cow", "mor"], default="cow")
    p.add_argument("--salt-buckets", type=int, default=0)
    p.add_argument("--stream", action="store_true", help="tail via Structured Streaming")
    p.add_argument("--demo", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from debezium_partial_snapshotter_spark.config import PipelineConfig
    from debezium_partial_snapshotter_spark.sources.readers import ParquetWalSource
    from debezium_partial_snapshotter_spark.streaming.runner import (
        PartialIngestRunner,
    )

    spark = (
        SparkSession.builder.appName("dps-replay")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    if args.demo:
        from debezium_partial_snapshotter_spark.sources.eventlog import (
            EventLogSpec,
            generate_change_log,
            initial_state_table,
        )
        import pyarrow.parquet as pq

        wh = tempfile.mkdtemp(prefix="dps_demo_")
        spec = EventLogSpec(n_docs=2000, n_events=20000, n_segments=4, seed=42)
        os.makedirs(f"{wh}/src")
        pq.write_table(initial_state_table(spec), f"{wh}/src/state.parquet")
        args.state = f"{wh}/src/state.parquet"
        args.wal = f"{wh}/src/wal"
        os.makedirs(args.wal)
        args.warehouse = f"{wh}/wh"
        demo_wal = generate_change_log(spec, out_dir=f"{wh}/pending")

    cfg = PipelineConfig(
        pipeline_id=args.pipeline_id,
        warehouse=args.warehouse,
        num_buckets=args.num_buckets,
        write_mode=args.write_mode,
        salt_buckets=args.salt_buckets,
    )
    src = ParquetWalSource(
        spark, args.state, args.wal, num_buckets=args.num_buckets
    )
    runner = PartialIngestRunner(spark, cfg, src)
    out = runner.start()

    if args.demo:
        import shutil

        for f in sorted(os.listdir(f"{wh}/pending")):
            shutil.move(f"{wh}/pending/{f}", os.path.join(args.wal, f))
        runner.tail_batch()
    elif args.stream:
        runner.stream(process_all_available=True)
    else:
        runner.tail_batch()

    summary = {
        "snapshot": {
            k: out["snapshot"].get(k)
            for k in ("applied", "claimed", "batch_keys", "watermark_lsn")
        },
        "table_version": runner.table.current_version(),
        "watermark_lsn": runner.table.watermark_lsn(),
        "rows": runner.table.read(spark).count(),
    }
    print(json.dumps(summary, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
