#!/usr/bin/env python3
"""Dev tool: time each oracle SQL in DuckDB (native, multithreaded)
as a single-node baseline for the graft bench.

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir> [graftBenchJson]

Caveat: oracle SQL is the SEMANTIC spec, not graft's plan — e.g. the
d4/d7 oracles are deliberately naive quadratic joins that DuckDB then
optimizes its own way. The comparison shows engine-level throughput
on identical results, not plan-for-plan parity.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir, bench_json=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    graft = {}
    if bench_json:
        graft = json.loads(Path(bench_json).read_text())["queries"]
        # r6+ detail format: {"median": s, "min": s, "runs": [...]}
        graft = {k: (v["median"] if isinstance(v, dict) else v)
                 for k, v in graft.items()}
    rows = []
    for name in sorted(oracle):
        times = []
        for _ in range(3):
            t0 = time.time()
            con.execute(oracle[name]).fetchall()
            times.append(time.time() - t0)
            # one run is verdict enough for a very slow oracle (the
            # recursive-CTE d9 runs minutes at sf0.1) — don't triple it
            if times[-1] > 15:
                break
        # lower median: with an even count (the >15s early break leaving
        # 2 samples) this picks the FASTER run instead of the slower one,
        # so slow-oracle timings aren't overstated
        med = sorted(times)[(len(times) - 1) // 2]
        rows.append((name, med, graft.get(name)))
    print(f"{'query':24s} {'duckdb_s':>9s} {'graft_s':>9s}")
    # totals cover only queries BOTH engines timed successfully — a
    # graft -1.0 error sentinel or a missing bench entry must not
    # read as "graft was faster"
    td = tg = 0.0
    skipped = []
    for name, d, g in rows:
        ok = g is not None and g >= 0
        if ok:
            td += d
            tg += g
        else:
            skipped.append(name)
        gs = f"{g:9.3f}" if ok else "        -"
        print(f"{name:24s} {d:9.3f} {gs}")
    print(f"{'TOTAL (both engines)':24s} {td:9.3f} {tg:9.3f}")
    if skipped:
        print(f"excluded from totals (no/err graft time): {', '.join(skipped)}")


if __name__ == "__main__":
    main(*sys.argv[1:])
