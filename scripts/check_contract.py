"""Local replica of the driver's correctness gate: run every queries() entry
next to its oracle_sql() on the same parquet tables and compare row count,
column names, and the full sorted value multiset.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def rows_key(df_rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in order) for r in df_rows
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import __spark_entry__ as S

    qs = S.queries()
    oracles = S.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if name not in oracles:
            try:
                n = fn(spark, sf).count()
                print(f"  {name:34s} rows-only: {n} rows  "
                      f"({time.time()-t0:.1f}s)")
            except Exception as e:
                failures += 1
                print(f"! {name:34s} ERROR: {e}")
            continue
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            ores = con.sql(oracles[name])
            ocols = list(ores.columns)
            # int128 guard: DuckDB sum(INT) yields HUGEINT, which the
            # driver's hasher stringifies differently from Spark BIGINT even
            # when values match (r3 verdict: 3 value-correct queries scored
            # red).  Fail loudly here so local green predicts driver green.
            otypes = [str(t).upper() for t in ores.types]
            int128 = [c for c, t in zip(ocols, otypes) if "HUGEINT" in t]
            if int128:
                failures += 1
                print(f"! {name:34s} HUGEINT oracle column(s) {int128} — "
                      f"add CAST(... AS BIGINT) in oracle_sql()")
                continue
            orows = ores.fetchall()
            ok_cols = sorted(scols) == sorted(ocols)
            ok_rows = len(srows) == len(orows)
            ok_vals = ok_cols and rows_key(srows, scols) == rows_key(orows, ocols)
            status = "OK " if (ok_cols and ok_rows and ok_vals) else "FAIL"
            print(
                f"{'!' if status=='FAIL' else ' '} {name:34s} {status} "
                f"rows {len(srows)}/{len(orows)} cols={ok_cols} "
                f"vals={ok_vals} ({time.time()-t0:.1f}s)"
            )
            if status == "FAIL":
                failures += 1
                if not ok_cols:
                    print(f"    spark cols:  {sorted(scols)}")
                    print(f"    oracle cols: {sorted(ocols)}")
                elif not ok_vals:
                    a = rows_key(srows, scols)
                    b = rows_key(orows, ocols)
                    sa, sb = set(a), set(b)
                    for d in list(sa - sb)[:3]:
                        print(f"    spark-only:  {d}")
                    for d in list(sb - sa)[:3]:
                        print(f"    oracle-only: {d}")
        except Exception as e:
            failures += 1
            print(f"! {name:34s} ERROR: {str(e)[:400]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
