#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run DuckDB on each
oracle_sql.json entry over the sf tables, compare against the Verify parquet
dumps (columns sorted by name, rows sorted, values hashed)."""
import sys, json, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return repr(v)

for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"; continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        exp = con.sql(sql).df()
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            results[name] = f"SCHEMA got={gcols} exp={ecols}"; continue
        if len(got) != len(exp):
            results[name] = f"ROWS got={len(got)} exp={len(exp)}"; continue
        g = [list(r) for r in got[gcols].itertuples(index=False, name=None)]
        e = [list(r) for r in exp[ecols].itertuples(index=False, name=None)]
        g = sorted([tuple(norm(v) for v in r) for r in g])
        e = sorted([tuple(norm(v) for v in r) for r in e])
        if g == e:
            results[name] = "OK"
        else:
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            results[name] = f"VALUES {diff}"
    except Exception as ex:
        results[name] = f"ORACLE_ERROR {type(ex).__name__}: {str(ex)[:300]}"

ok = sum(1 for v in results.values() if v == "OK")
for k, v in sorted(results.items()):
    print(("PASS " if v == "OK" else "FAIL ") + k + ("" if v == "OK" else "  " + str(v)[:500]))
print(f"\n{ok}/{len(results)} oracle-checked queries pass")
sys.exit(0 if ok == len(results) else 1)
