#!/usr/bin/env python3
"""Local dry run of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <verifyOutDir> <sfDir>

For every query dumped by graft.Verify into <verifyOutDir> that has an
entry in oracle_sql.json, run the oracle SQL in DuckDB against the
<sfDir> parquet tables and compare row count, column set, and values
(columns sorted by name, rows sorted by all columns, floats rounded to
9 places — the driver's hash ordering without the hash). Queries with
no oracle entry are reported as no_oracle with their row count.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns/rows and widen numerics — Spark parquet dumps carry
    int32/float32 where DuckDB answers int64/float64; the driver's
    typed-hash comparator widens the same way before hashing."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(9)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_no = n_fail = 0
    for name in names:
        mine = duckdb.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracles:
            status = "no_oracle" if len(mine) > 0 else "NO_ORACLE_EMPTY"
            n_no += 1
            print(f"{status:18s} {name} rows={len(mine)}")
            if status != "no_oracle":
                n_fail += 1
            continue
        want = con.sql(oracles[name]).df()
        if sorted(want.columns) != sorted(mine.columns):
            n_fail += 1
            print(f"SCHEMA_MISMATCH    {name}: {sorted(mine.columns)} "
                  f"vs oracle {sorted(want.columns)}")
            continue
        a, b = norm(mine), norm(want)
        if len(a) != len(b):
            n_fail += 1
            print(f"ROWS_MISMATCH      {name}: {len(a)} vs oracle {len(b)}")
        elif not a.equals(b):
            n_fail += 1
            diff = (a != b).any(axis=1)
            print(f"VALUE_MISMATCH     {name}: first diff row\n"
                  f"  mine:   {a[diff].head(1).to_dict('records')}\n"
                  f"  oracle: {b[diff].head(1).to_dict('records')}")
        else:
            n_pass += 1
    print(f"\nSUMMARY pass={n_pass} no_oracle={n_no} fail={n_fail} "
          f"total={len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
