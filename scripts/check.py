#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: reads Verify output
parquet + oracle_sql.json, runs each oracle in DuckDB over the same
testdata tables, and compares row sets (columns sorted by name, rows
sorted, values normalized)."""
import glob, json, math, os, sys
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{v:.10g}"
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v

def normrows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)

fails = 0
for name in sorted(oracle):
    path = f"{outdir}/{name}"
    if not glob.glob(f"{path}/*.parquet"):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        sq = con.execute(f"SELECT * FROM '{path}/*.parquet'")
        scols = [d[0] for d in sq.description]; srows = sq.fetchall()
        oq = con.execute(oracle[name])
        ocols = [d[0] for d in oq.description]; orows = oq.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if sorted(scols) != sorted(ocols):
        print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(ocols)}"); fails += 1; continue
    s, o = normrows(scols, srows), normrows(ocols, orows)
    if s != o:
        print(f"FAIL {name}: {len(s)} vs {len(o)} rows")
        for i, (a, b) in enumerate(zip(s, o)):
            if a != b:
                print(f"  first diff at {i}: spark={a} oracle={b}"); break
        if len(s) != len(o) and s and o:
            only_s = set(s) - set(o); only_o = set(o) - set(s)
            if only_s: print(f"  spark-only e.g.: {list(only_s)[:2]}")
            if only_o: print(f"  oracle-only e.g.: {list(only_o)[:2]}")
        fails += 1
    else:
        print(f"PASS {name} ({len(s)} rows)")
missing = [k for k in glob.glob(f"{outdir}/*/") if os.path.basename(k.rstrip('/')) not in oracle]
if missing: print("rows-only (no oracle):", [os.path.basename(m.rstrip('/')) for m in missing])
sys.exit(1 if fails else 0)
