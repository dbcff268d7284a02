#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--iter]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sfDir parquet tables registered as views, and compares against the
Spark parquet dump <verifyOutDir>/<name>/ — columns sorted by name,
row order ignored (sorted by all columns), values stringified.
Dev tool only; the shipped Scala library has no Python dependency.

--iter (or GRAFT_ORACLE_ITER=1): for entries listed in
<verifyOutDir>/oracle_iter.json, replace the single-statement
recursive-CTE replay with the ITERATIVE plan — materialize the edge
set, run min-label propagation WITH path compression to fixpoint
(polynomial; ~the engine's pointer-jumping round count), and execute
the final query over the computed labels. Same fixpoint, hence the
same result — this is what makes the connected-components oracles
feasible at sf1+ (the r15 sweep's d14 recursive replay ran 95 min).
The driver's gate never uses this path.
"""
import json
import os
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_cc_fixpoint(con, edges: str, labels: str) -> None:
    """Min-label connected components over (id_a, id_b) rows of
    `edges`, into `labels`(node, label): per round, take the min of
    each node's neighborhood labels, then path-compress
    (label <- label[label]); stop when nothing changes. Labels are
    always nodes, so the compression join is total by construction.
    """
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE {labels} AS "
        f"SELECT node, node AS label FROM "
        f"(SELECT id_a AS node FROM {edges} UNION SELECT id_b FROM {edges})"
    )
    while True:
        con.execute(
            f"""CREATE OR REPLACE TEMP TABLE {labels}__n AS
            SELECT n.node, LEAST(n.label, coalesce(m.minl, n.label)) AS label
            FROM {labels} n LEFT JOIN (
              SELECT e.dst AS node, min(r.label) AS minl
              FROM (SELECT id_a AS src, id_b AS dst FROM {edges}
                    UNION ALL SELECT id_b, id_a FROM {edges}) e
              JOIN {labels} r ON e.src = r.node
              GROUP BY e.dst) m USING (node)"""
        )
        con.execute(
            f"""CREATE OR REPLACE TEMP TABLE {labels}__c AS
            SELECT a.node, coalesce(b.label, a.label) AS label
            FROM {labels}__n a LEFT JOIN {labels}__n b ON a.label = b.node"""
        )
        changed = con.execute(
            f"SELECT count(*) FROM {labels} a JOIN {labels}__c b USING (node) "
            f"WHERE a.label <> b.label"
        ).fetchone()[0]
        con.execute(
            f"CREATE OR REPLACE TEMP TABLE {labels} AS SELECT * FROM {labels}__c"
        )
        if changed == 0:
            return


_done_setups: set = set()


def run_iter(con, plan) -> pd.DataFrame:
    # d9/d14/d16 share one edge materialization (identical statement
    # text) — run each setup once per process, not once per entry
    for stmt in plan["setup"]:
        if stmt not in _done_setups:
            con.execute(stmt)
            _done_setups.add(stmt)
    for edges, labels in plan["cc"]:
        run_cc_fixpoint(con, edges, labels)
    return con.execute(plan["final"]).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str, use_iter: bool = False) -> int:
    sys.stdout.reconfigure(line_buffering=True)  # progress visible when piped
    con = duckdb.connect()
    n_views = 0
    for t in TABLES:
        # driver testdata ships single-file tables; MakeScale-derived
        # scales are Spark parquet DIRECTORIES — glob those. A
        # table-subset scale (MakeScale's r17 `tables` arg) simply
        # lacks some files — skip them; only entries reading a
        # missing table would fail, and a subset sweep never runs those.
        p = Path(sf_dir, f"{t}.parquet")
        if not p.exists():
            continue
        pat = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
        )
        n_views += 1
    if n_views == 0:
        # a mistyped sf_dir otherwise surfaces as N per-query
        # missing-table failures instead of one clear setup error
        print(f"FAIL setup: no table files found under {sf_dir}")
        return 1
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    iter_path = Path(out_dir, "oracle_iter.json")
    iter_plans = (
        json.loads(iter_path.read_text()) if use_iter and iter_path.exists() else {}
    )
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
            if name in iter_plans:
                want = canon(run_iter(con, iter_plans[name]))
            else:
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
    sys.exit(main(
        sys.argv[1], sys.argv[2],
        use_iter="--iter" in sys.argv[3:]
        or os.environ.get("GRAFT_ORACLE_ITER") == "1",
    ))
