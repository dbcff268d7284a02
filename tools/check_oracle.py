#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sfDir parquet tables registered as views, and compares against the
Spark parquet dump <verifyOutDir>/<name>/ — columns sorted by name,
row order ignored (sorted by all columns), values stringified.
Dev tool only; the shipped Scala library has no Python dependency.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failed = []
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir, name)
        files = sorted(spark_dir.glob("*.parquet")) if spark_dir.exists() else []
        if not files:
            print(f"FAIL {name}: no spark output")
            failed.append(name)
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failed.append(name)
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failed.append(name)
        elif not got.equals(want):
            diff = (got != want).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(got)} rows differ; first:")
            i = diff.idxmax()
            print("  spark:", got.loc[i].to_dict())
            print("  duck :", want.loc[i].to_dict())
            failed.append(name)
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
