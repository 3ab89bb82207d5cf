#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the sf parquet tables — the
denominator of the judge's Spark/duck ratio. Usage:
  python3 tools/duck_bench.py <sfdir> <oracle_sql.json> [out.json]
DuckDB gets the same 32 threads Spark gets."""
import duckdb, json, os, sys, time

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_path))
times = {}
for name in sorted(oracle):
    t0 = time.time()
    try:
        con.execute(oracle[name]).fetchall()
        times[name] = round(time.time() - t0, 3)
    except Exception as e:
        times[name] = None
        print(f"ERR {name}: {e}", file=sys.stderr)
total = round(sum(v for v in times.values() if v is not None), 3)
res = {"total": total, "queries": times, "sf": sfdir}
if out_path:
    json.dump(res, open(out_path, "w"), indent=1)
print(json.dumps({"total": total, "sf": sfdir}))
for name, v in sorted(times.items(), key=lambda kv: -(kv[1] or 0))[:15]:
    print(f"  {name}: {v}")
