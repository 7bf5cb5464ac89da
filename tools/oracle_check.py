#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare: run each
oracle_sql.json query against the sf parquet tables, load the Spark
result parquet, normalize types, sort rows, compare."""
import duckdb, json, sys, glob, math

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify-out"

con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders",
            "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    # everything becomes a string so rows sort even with NULLs mixed in
    if v is None: return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return repr(round(v, 9))
    return str(v)

fails = []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    try:
        orc = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}")); continue
    spk = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
    ocols = sorted(orc.column_names); scols = sorted(spk.column_names)
    if ocols != scols:
        fails.append((name, f"schema: oracle={ocols} spark={scols}")); continue
    orows = sorted(tuple(norm(r[c]) for c in ocols) for r in orc.to_pylist())
    srows = sorted(tuple(norm(r[c]) for c in ocols) for r in spk.to_pylist())
    if orows != srows:
        diff = [(a, b) for a, b in zip(orows, srows) if a != b][:3]
        fails.append((name, f"rows: oracle={len(orows)} spark={len(srows)} first_diffs={diff}"))
    else:
        print(f"OK   {name}: {len(orows)} rows")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
