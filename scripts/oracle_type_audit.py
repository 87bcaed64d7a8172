#!/usr/bin/env python3
"""Oracle result-type audit (the HUGEINT guard).

DuckDB widens un-cast integer SUMs to HUGEINT (int128) while Spark emits
BIGINT, so the driver's value-hash compare fails even when every value is
identical. This class produced driver-red rows in rounds 8 AND 11. This
script makes it impossible to ship: it DESCRIBEs every SparkEntry.oracleSql
under DuckDB (no execution — plan-only) and FAILS if any result column's
type is outside the agreed surface.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/audit --sql-only"
  python3 scripts/oracle_type_audit.py /tmp/audit [sfdir]
"""
import json, re, sys
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/audit"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

# the agreed oracle type surface: anything Spark parquet round-trips and the
# driver hashes identically. HUGEINT / DECIMAL / unsigned ints are banned.
ALLOWED = re.compile(
    r"^(BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT|VARCHAR|BOOLEAN"
    r"|TIMESTAMP|TIMESTAMP WITH TIME ZONE|DATE"
    r"|VARCHAR\[\]|BIGINT\[\]|DOUBLE\[\])$")

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    try:
        rows = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
    except Exception as e:
        print(f"FAIL {name}: cannot type-check: {e}")
        fails += 1
        continue
    bad = [(r[0], r[1]) for r in rows if not ALLOWED.match(r[1])]
    if bad:
        fails += 1
        print(f"FAIL {name}: banned oracle result types {bad}")
if fails:
    print(f"\n{fails} oracle(s) with out-of-surface result types "
          f"(HUGEINT/DECIMAL class) — CAST them to BIGINT/DOUBLE.")
    sys.exit(1)
print(f"PASS: all {len(oracle)} oracle result schemas inside the agreed "
      f"type surface")
