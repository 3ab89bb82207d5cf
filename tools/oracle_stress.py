#!/usr/bin/env python3
"""Stress-test oracle SQL under the driver's harshest conditions: each
query in a FRESH subprocess (no allocator poisoning), threads=32, and a
hard DuckDB memory_limit (default 2GB — the round-12 verdict's bar for
"the driver's 32-thread harness can run this"). Reports pass/OOM/timeout
per query so the heavy chains can be put on a memory diet.

Usage: oracle_stress.py <sfdir> <oracle_sql.json> [names,comma,sep]
Env: STRESS_THREADS (32), STRESS_MEM (2GB), STRESS_TIMEOUT_SEC (180)
"""
import json, os, subprocess, sys, time

sfdir = sys.argv[1]
oracle_path = sys.argv[2]
oracle = json.load(open(oracle_path))
names = sys.argv[3].split(",") if len(sys.argv) > 3 else sorted(oracle)
threads = os.environ.get("STRESS_THREADS", "32")
mem = os.environ.get("STRESS_MEM", "2GB")
timeout = float(os.environ.get("STRESS_TIMEOUT_SEC", "180"))

WORKER = r'''
import duckdb, json, os, sys, time
sfdir, sql, threads, mem = sys.argv[1], sys.stdin.read(), sys.argv[2], sys.argv[3]
con = duckdb.connect()
con.execute(f"SET threads TO {threads}")
con.execute(f"SET memory_limit='{mem}'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
t0 = time.time()
rows = con.execute(sql).fetchall()
print(json.dumps({"rows": len(rows), "sec": round(time.time() - t0, 2)}))
'''

results = {}
for name in names:
    if name not in oracle:
        results[name] = {"status": "no_oracle"}
        continue
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-c", WORKER, sfdir, threads, mem],
            input=oracle[name], capture_output=True, text=True, timeout=timeout)
        if p.returncode == 0:
            r = json.loads(p.stdout.strip().splitlines()[-1])
            results[name] = {"status": "ok", **r}
        else:
            err = (p.stderr or "").strip().splitlines()
            tail = err[-1] if err else "unknown"
            st = "oom" if "OutOfMemory" in tail or "bad allocation" in tail else "err"
            results[name] = {"status": st, "detail": tail[:200],
                             "sec": round(time.time() - t0, 2)}
    except subprocess.TimeoutExpired:
        results[name] = {"status": "timeout", "sec": timeout}
    r = results[name]
    print(f"{r['status']:>8} {r.get('sec','-'):>8} {name} {r.get('detail','')[:100]}",
          flush=True)

bad = {k: v for k, v in results.items() if v["status"] not in ("ok",)}
print(f"\n{len(results) - len(bad)}/{len(results)} ok; offenders: {sorted(bad)}")
if os.environ.get("STRESS_JSON"):
    json.dump(results, open(os.environ["STRESS_JSON"], "w"), indent=1)
