"""Profiling companion to bench.py (bench.py is FROZEN — guide §1.4).

Runs selected declared queries against $SPARK_GRAFT_SF_DIR with the
noop sink, labels each query's jobs, and reports per-JOB wall times and
per-stage task metrics (shuffle read/write bytes, task count) from the
live UI REST API, so the cost of a query can be attributed to its
stages without touching the frozen harness.

Usage:
  python bench_extra.py [query ...]            # profile queries
  python bench_extra.py --plans [query ...]    # only write explain() files

Explain output goes to plans/r07/<query>_<suffix>.txt
(suffix from --suffix, default "before").
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("DPS_OFFHEAP", "20g")


def _api(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def profile(queries: list[str], suffix: str, plans_only: bool) -> None:
    from debezium_partial_snapshotter_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        "dps-bench-extra",
        parallelism=CPUS,
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1]) if sc.uiWebUrl else 4040
    app_id = sc.applicationId
    qs = entry_mod.queries()
    os.makedirs("plans/r07", exist_ok=True)

    import gc

    out: dict[str, dict] = {}
    for name in queries:
        fn = qs[name]
        df = fn(spark, SF_DIR)
        with open(f"plans/r07/{name}_{suffix}.txt", "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        if plans_only:
            del df
            continue
        del df
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        jobs_before = {j["jobId"] for j in _api(port, f"applications/{app_id}/jobs")}
        sc.setJobDescription(f"q:{name}")
        t0 = time.time()
        df = fn(spark, SF_DIR)  # construction may run eager actions (CC loop)
        t_build = time.time() - t0
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        sc.setJobDescription(None)
        jobs = [
            j
            for j in _api(port, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        stages = {
            s["stageId"]: s
            for s in _api(port, f"applications/{app_id}/stages?status=complete")
        }
        jinfo = []
        for j in jobs:
            sinfo = []
            for sid in sorted(j.get("stageIds", [])):
                s = stages.get(sid)
                if not s:
                    continue
                sinfo.append(
                    {
                        "stage": sid,
                        "name": s["name"].split("\n")[0][:90],
                        "tasks": s["numCompleteTasks"],
                        "ms": s.get("executorRunTime", 0),
                        "shuf_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                        "shuf_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                        "in_rows": s.get("inputRecords", 0),
                        "out_rows": s.get("outputRecords", 0),
                    }
                )
            t_sub = j.get("submissionTime", "")
            t_done = j.get("completionTime", "")
            jinfo.append(
                {
                    "job": j["jobId"],
                    "desc": (j.get("description") or j.get("name", ""))[:80],
                    "submitted": t_sub,
                    "completed": t_done,
                    "stages": sinfo,
                }
            )
        out[name] = {
            "wall_sec": round(wall, 3),
            "build_sec": round(t_build, 3),
            "n_jobs": len(jobs),
            "jobs": jinfo,
        }
        print(
            f"== {name}: {wall:.3f}s (build {t_build:.3f}s), {len(jobs)} jobs",
            flush=True,
        )
        del df
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    if not plans_only:
        with open(f"/tmp/profile_{suffix}.json", "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps({k: v["wall_sec"] for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    plans_only = "--plans" in args
    suffix = "before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    args = [a for a in args if not a.startswith("--")]
    if not args:
        args = [
            "jaccard_pairs",
            "near_dup_clusters",
            "minhash_signatures",
            "minhash_lsh_pairs",
            "simhash_clusters",
            "embedding_near_dup_clusters",
        ]
    profile(args, suffix, plans_only)
