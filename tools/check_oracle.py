"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin side-by-side on the same parquet tables, compare
row count + columns + values (order-insensitive).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].astype("float64").round(4)
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from boilerplate_buster_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"[ERR ] {name}: spark raised {e}")
            continue
        if name not in oracles:
            print(f"[ROWS] {name}: {len(sdf)} rows (no oracle - rows-only check)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"[ERR ] {name}: duckdb raised {e}")
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            failures.append(name)
            print(f"[FAIL] {name}: columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
            continue
        if len(sdf) != len(ddf):
            failures.append(name)
            print(f"[FAIL] {name}: rows {len(sdf)} vs {len(ddf)}")
            continue
        a, b = canon(sdf), canon(ddf)
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            failures.append(name)
            print(f"[FAIL] {name}: {int(neq.sum())}/{len(a)} rows differ; first diffs:")
            print(pd.concat([a[neq].head(3), b[neq].head(3)], keys=["spark", "duck"]))
            continue
        print(f"[ OK ] {name}: {len(sdf)} rows match")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
