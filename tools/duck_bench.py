#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the sf parquet tables — the
denominator of the judge's Spark/duck ratio. Usage:
  python3 tools/duck_bench.py <sfdir> <oracle_sql.json> [out.json]
DuckDB gets the same 32 threads Spark gets, and the SAME measurement
protocol as graft.Bench: DUCK_BENCH_REPS (default 2) FULL PASSES over
the query list, keeping each query's MINIMUM across passes — pass-level
reps so a co-tenant contention burst (minutes long) can't sit inside
both of a query's reps. A min-statistic numerator over a one-shot
denominator would systematically favor the engine; both legs now use
min-of-N and both artifacts record reps/agg."""
import duckdb, json, os, sys, time

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else None
reps = max(1, int(os.environ.get("DUCK_BENCH_REPS", "2")))

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_path))
rep_times = {}   # name -> [sec per pass]
errs = set()
for p in range(reps):
    for name in sorted(oracle):
        if name in errs:
            continue
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            rep_times.setdefault(name, []).append(round(time.time() - t0, 3))
        except Exception as e:
            errs.add(name)
            rep_times[name] = None
            print(f"ERR {name}: {e}", file=sys.stderr)
times = {name: (min(v) if v else None) for name, v in rep_times.items()}
total = round(sum(v for v in times.values() if v is not None), 3)
res = {"total": total, "reps": reps, "agg": "min", "queries": times,
       "rep_queries": {k: v for k, v in rep_times.items() if v},
       "sf": sfdir}
if out_path:
    json.dump(res, open(out_path, "w"), indent=1)
print(json.dumps({"total": total, "reps": reps, "agg": "min", "sf": sfdir}))
for name, v in sorted(times.items(), key=lambda kv: -(kv[1] or 0))[:15]:
    print(f"  {name}: {v}")
