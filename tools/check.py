#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB (with views named after
the fixture tables) and compares against the parquet files Verify wrote.
Comparison: sort columns by name, compare row-by-row values (row order as
emitted — every query ends in a total ORDER BY).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            rel = con.sql(sql)
            raw_cols = list(rel.columns)
            exp_cols = sorted(raw_cols)
            perm = [raw_cols.index(c) for c in exp_cols]
            exp_rows = [tuple(r[i] for i in perm) for r in rel.fetchall()]
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            continue
        try:
            grel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            g_cols = list(grel.columns)
            got_all_cols = sorted(g_cols)
            gperm = [g_cols.index(c) for c in got_all_cols]
            got_rows = [tuple(r[i] for i in gperm) for r in grel.fetchall()]
        except Exception as e:
            failures.append((name, f"spark output error: {e}"))
            print(f"FAIL {name}: spark output error: {str(e).splitlines()[0]}")
            continue
        if got_all_cols != exp_cols:
            failures.append((name, f"columns differ: spark={got_all_cols} oracle={exp_cols}"))
            print(f"FAIL {name}: columns spark={got_all_cols} vs oracle={exp_cols}")
            continue
        if len(got_rows) != len(exp_rows):
            failures.append((name, f"row count {len(got_rows)} vs {len(exp_rows)}"))
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            if tuple(map(canon, g)) != tuple(map(canon, e)):
                bad = (i, g, e)
                break
        if bad:
            failures.append((name, f"first diff at row {bad[0]}"))
            print(f"FAIL {name}: row {bad[0]}\n  spark : {bad[1]}\n  oracle: {bad[2]}\n  cols  : {exp_cols}")
        else:
            print(f"OK   {name} ({len(got_rows)} rows)")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} oracle queries match")
    # rows-only keys (no oracle): report row counts
    import os
    no_oracle = [d for d in sorted(os.listdir(out_dir))
                 if os.path.isdir(f"{out_dir}/{d}") and d not in oracle]
    for d in no_oracle:
        try:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{out_dir}/{d}/*.parquet')").fetchone()[0]
            print(f"rows-only {d}: {n} rows")
        except Exception as e:
            print(f"rows-only {d}: unreadable: {e}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
