"""Driver-style end-to-end verification: run every registry query on a
PLAIN SparkSession (no engine conf — exactly how the driver calls us) and
compare oracle-backed ones against DuckDB on the same parquet.

Usage: python -m demo_apache_beam_spark.tools.verify_driver [name ...]
Env:   SPARK_GRAFT_VERIFY_SF   (default /root/testdata/sf0.01)
       SPARK_GRAFT_VERIFY_JSON (optional: also write a machine-readable
                                per-query result map to this path)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.round(6).to_csv(index=False).encode()).hexdigest()


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
    from demo_apache_beam_spark import queries as reg

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-driver")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    names = sys.argv[1:] or list(reg.REGISTRY)
    fails: list[str] = []
    results: dict[str, dict] = {}
    for name in names:
        spec = reg.REGISTRY[name]
        try:
            sdf = spec.fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001 - report and continue
            fails.append(name)
            results[name] = {"status": "spark_err", "err": str(e)[:200]}
            print(f"{name}: SPARK ERR {str(e)[:200]}")
            continue
        if spec.oracle is None:
            results[name] = {"status": "rows_only", "spark_rows": len(sdf)}
            print(f"{name}: rows-only {len(sdf)}")
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            results[name] = {"status": "oracle_err", "err": str(e)[:200]}
            print(f"{name}: ORACLE ERR {str(e)[:200]}")
            continue
        ok = (
            len(sdf) == len(odf)
            and sorted(sdf.columns) == sorted(odf.columns)
            and canon(sdf) == canon(odf)
        )
        if not ok:
            fails.append(name)
        results[name] = {
            "status": "ok" if ok else "mismatch",
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
        }
        print(f"{name}: {'OK' if ok else f'MISMATCH rows={len(sdf)}/{len(odf)}'}")
    print("FAILS:", fails)
    out_path = os.environ.get("SPARK_GRAFT_VERIFY_JSON")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(
                {"sf_dir": sf, "fails": fails, "queries": results}, fh, indent=1
            )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
