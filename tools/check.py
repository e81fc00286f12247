#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB (with views named after
the fixture tables) and compares against the parquet files Verify wrote.

Comparison is TYPED, via Arrow on both sides — this mirrors the driver's
hash, which distinguishes e.g. a DuckDB HUGEINT (arrow decimal128(38,0),
fetched as Decimal) from a Spark BIGINT (arrow int64, fetched as int) even
when the numeric values are equal.  Round 4 shipped three hash failures
precisely because the old fetchall()-based compare erased that distinction.

Rules:
  - columns sorted by name on both sides (the driver does the same);
  - arrow types must match EXACTLY — r7 shipped agg_benford_audit red on a
    decimal128(16,6)-vs-(7,6) skew with bit-identical values, so the old
    same-scale decimal tolerance is gone (make the engines agree instead:
    CAST to DOUBLE or to one explicit DECIMAL(p,s) on BOTH sides);
  - list/map/struct-typed output columns are REJECTED outright for
    oracle-declared queries — the driver's pandas sorter crashes on them
    (r7: embedding_pq). Flatten: array_join on the Spark side, string_agg
    in the DuckDB twin (SURVEY §7.4);
  - cell values compared by repr() of the arrow->python objects, so
    Decimal('3') != 3 and the HUGEINT class can never ship green again.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, re, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

_NESTED = re.compile(r"^(list|large_list|fixed_size_list|map|struct)\b")

def types_compatible(a, b):
    """Exact arrow-type match — bit-faithful to the driver's hash."""
    return a == b

def nested_cols(types):
    """Columns the driver's pandas sorter cannot hash (list/map/struct)."""
    return [c for c, t in sorted(types.items()) if _NESTED.match(t)]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ", ".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {canon(x)}" for k, x in sorted(v.items())) + "}"
    return repr(v)

def fetch(rel):
    """-> (sorted col names, {col: arrow type str}, rows as python tuples)."""
    tbl = rel.arrow()
    cols = sorted(tbl.column_names)
    types = {c: str(tbl.schema.field(c).type) for c in cols}
    pylists = [tbl.column(c).to_pylist() for c in cols]
    rows = list(zip(*pylists)) if cols and tbl.num_rows else []
    return cols, types, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp_cols, exp_types, exp_rows = fetch(con.sql(sql))
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            continue
        try:
            got_cols, got_types, got_rows = fetch(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            failures.append((name, f"spark output error: {e}"))
            print(f"FAIL {name}: spark output error: {str(e).splitlines()[0]}")
            continue
        nested = sorted(set(nested_cols(got_types)) | set(nested_cols(exp_types)))
        if nested:
            failures.append((name, f"nested output columns: {nested}"))
            print(f"FAIL {name}: list/map/struct output column(s) {nested} — "
                  f"the driver's sorter crashes on these; flatten "
                  f"(array_join / string_agg) on both sides")
            continue
        if got_cols != exp_cols:
            failures.append((name, f"columns differ: spark={got_cols} oracle={exp_cols}"))
            print(f"FAIL {name}: columns spark={got_cols} vs oracle={exp_cols}")
            continue
        bad_types = [(c, got_types[c], exp_types[c]) for c in exp_cols
                     if not types_compatible(got_types[c], exp_types[c])]
        if bad_types:
            failures.append((name, f"type drift: {bad_types}"))
            for c, g, e in bad_types:
                print(f"FAIL {name}: type drift on `{c}`: spark={g} oracle={e}"
                      f" (cast the oracle column to match)")
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
