#!/usr/bin/env python3
"""Prototype: FNV-1a 64 in DuckDB SQL (recursive CTE, HUGEINT mod-2^64
arithmetic) vs the Python reference — validates the sim_pairs_lsh oracle's
hash stage before it ships."""
import duckdb

def fnv(s):
    h = 0xcbf29ce484222325
    for b in s.encode():
        h ^= b
        h = (h * 0x100000001b3) % (1 << 64)
    return h

con = duckdb.connect()
rows = con.sql(r"""
WITH RECURSIVE toks(s) AS (
  SELECT * FROM (VALUES ('alpha beta gamma'), ('x'), ('the quick brown'),
                        ('zz top'), ('')) t(s)),
fnv AS (
  SELECT s, 1 AS i, CAST(14695981039346656037 AS UBIGINT) AS h FROM toks
  UNION ALL
  SELECT s, i + 1,
    CAST(CAST((CAST(xor(h, CAST(ord(substr(s, i, 1)) AS UBIGINT))
      AS HUGEINT) * 1099511628211) % 18446744073709551616 AS HUGEINT)
      AS UBIGINT)
  FROM fnv WHERE i <= len(s))
SELECT s, h, CAST(h >> 55 AS BIGINT) AS idx,
  CASE WHEN (h >> 54) & 1 = 1 THEN 1.0 ELSE -1.0 END AS sign
FROM fnv WHERE i = len(s) + 1
""").fetchall()
ok = True
for s, h, idx, sign in rows:
    exp = fnv(s)
    eidx = (exp >> 55) & 511
    esign = 1.0 if ((exp >> 54) & 1) == 1 else -1.0
    mark = "OK " if (h, idx, sign) == (exp, eidx, esign) else "BAD"
    if mark == "BAD":
        ok = False
    print(f"{mark} {s!r}: duck={h} py={exp} idx={idx}/{eidx} sign={sign}/{esign}")
print("ALL OK" if ok else "MISMATCH")
