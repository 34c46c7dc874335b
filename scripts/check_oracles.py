"""Self-check: run every __spark_entry__ query against its DuckDB oracle at
sf0.01 the same way the driver does (row count + schema + order-insensitive
value comparison, columns sorted by name). Usage: python scripts/check_oracles.py [sf_dir]"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from goribot_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if len(a) != len(b):
        return [f"rowcount spark={len(a)} oracle={len(b)}"]
    a, b = norm_df(a), norm_df(b)
    if list(a.columns) != list(b.columns):
        return [f"columns spark={list(a.columns)} oracle={list(b.columns)}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            bad = [
                i
                for i, (x, y) in enumerate(zip(av, bv))
                if not (
                    (pd.isna(x) and pd.isna(y))
                    or (not pd.isna(x) and not pd.isna(y) and math.isclose(float(x), float(y), rel_tol=0, abs_tol=0))
                )
            ]
        else:
            bad = [i for i, (x, y) in enumerate(zip(av.astype(str), bv.astype(str))) if x != y]
        if bad:
            i = bad[0]
            problems.append(f"col {c}: {len(bad)} mismatches, first at {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
    return problems


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    ok = fail = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            ok += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {str(e)[:200]}")
            fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            fail += 1
        else:
            print(f"match {name}: {len(sdf)} rows")
            ok += 1
    # entry smoke
    n = entry_mod.entry(spark).count()
    print(f"entry(): {n} rows")
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
