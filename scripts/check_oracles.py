"""Replicates the driver's correctness gate locally: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at sf0.01,
compare row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified)."""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from debezium_partial_snapshotter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        "|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main(only: list[str] | None = None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark("oracle-check", parallelism=8, shuffle_partitions=8)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"{name:28s} SPARK-ERROR {str(e).splitlines()[0][:110]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only   rows={len(sdf)} cols={sorted(sdf.columns)}")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:28s} DUCK-ERROR  {str(e).splitlines()[0][:110]}")
            failures.append(name)
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_cols and value_hash(sdf) == value_hash(odf)
        # The driver's canonicalization stringifies float64 and int64
        # differently (1.26e7 vs 12602444) — norm_cell above hides that,
        # so an int/float dtype divergence must fail HERE too
        # (CORRECTNESS_r01 simhash: DuckDB HUGEINT -> float64).
        bad_dtypes = (
            [
                (c, sdf[c].dtype.kind, odf[c].dtype.kind)
                for c in sdf.columns
                if sdf[c].dtype.kind != odf[c].dtype.kind
                and {sdf[c].dtype.kind, odf[c].dtype.kind} & {"f", "i", "u"}
            ]
            if ok_cols
            else []
        )
        status = (
            "OK" if (ok_rows and ok_cols and ok_hash and not bad_dtypes) else "MISMATCH"
        )
        if bad_dtypes:
            print(f"{name:28s} DTYPE-MISMATCH {bad_dtypes}")
        print(
            f"{name:28s} {status:9s} rows {len(sdf)}/{len(odf)} cols_ok={ok_cols} hash_ok={ok_hash}"
        )
        if status != "OK":
            failures.append(name)
            if not ok_cols:
                print(f"    spark cols: {sorted(sdf.columns)}")
                print(f"    duck  cols: {sorted(odf.columns)}")
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
