#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the sf parquet tables — the
denominator of the judge's Spark/duck ratio. Usage:
  python3 tools/duck_bench.py <sfdir> <oracle_sql.json> [out.json]

Protocol (matched to graft.Bench so the crossover ratio compares like
with like): DUCK_BENCH_REPS (default 2) FULL PASSES over the query
list, keeping each query's MINIMUM across passes — pass-level reps so a
co-tenant contention burst (minutes long) can't sit inside both of a
query's reps. reps/agg are recorded in the artifact, as
BENCH_DETAIL.json records them for the engine leg.

Resilience: DuckDB 1.0.0 can throw a spurious tiny-block OOM on
thread-hungry chains at 32 threads, and the failure poisons
PROCESS-GLOBAL allocator state — observed cascades where every later
query (and even CREATE VIEW on a fresh connection) failed with
"Failed to allocate block of 8 bytes" while the host had 121 GB free,
plus one segfault. Queries therefore run in a WORKER SUBPROCESS that
streams per-query timings to the parent; when the worker dies or a
query errors, the parent retries that one query in its own process
with degrading threads (32 → 16 → 8 — verify_local.py's standing
DUCK_THREADS=8 guard), then resumes a fresh worker AFTER it. Timing
stays honest: all queries are views over parquet (no cross-query
DuckDB state to lose — warmth lives in the OS page cache, which
subprocesses share), and each cell is still timed around execute()
only."""
import json, os, subprocess, sys

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else None
reps = max(1, int(os.environ.get("DUCK_BENCH_REPS", "2")))

WORKER = r"""
import duckdb, json, os, sys, time
sfdir, oracle_path, start, threads = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
names = sys.argv[5].split(",")
oracle = json.load(open(oracle_path))
con = duckdb.connect()
con.execute(f"SET threads TO {threads}")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
for name in names[start:]:
    t0 = time.time()
    try:
        con.execute(oracle[name]).fetchall()
        print(json.dumps({"name": name, "sec": round(time.time() - t0, 3)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"name": name, "err": str(e)[:200]}), flush=True)
        sys.exit(1)
sys.exit(0)
"""

oracle = json.load(open(oracle_path))
names = sorted(oracle)
rep_times = {}   # name -> [sec per pass]
hard_errs = set()
fallbacks = {}


def run_worker(sub, start, threads):
    """Stream (name, sec|err) from a worker running sub[start:];
    returns (index after last success, failed_name | None)."""
    proc = subprocess.Popen(
        [sys.executable, "-c", WORKER, sfdir, oracle_path, str(start),
         str(threads), ",".join(sub)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    idx = start
    failed = None
    for line in proc.stdout:
        line = line.strip()
        if not line.startswith("{"):  # interpreter-startup noise
            continue
        got = json.loads(line)
        if "err" in got:
            failed = got["name"]
            print(f"ERR {got['name']}: {got['err']}", file=sys.stderr)
            break
        rep_times.setdefault(got["name"], []).append(got["sec"])
        idx += 1
    rc = proc.wait()
    if failed is None and idx < len(sub) and rc != 0:
        # worker died (segfault) before printing the error line
        failed = sub[idx]
        print(f"ERR {failed}: worker exited rc={rc}", file=sys.stderr)
    return idx, failed


for p in range(reps):
    # hard-erred queries are excluded from the worker's list ENTIRELY:
    # the old index-skip only applied between worker segments, so a
    # hard-err query still re-ran inside later bulk workers — a success
    # there would .append onto the None sentinel (AttributeError, run
    # lost), and a later-pass failure clobbered a valid pass-1 timing.
    active = [n for n in names if n not in hard_errs]
    i = 0
    while i < len(active):
        i, failed = run_worker(active, i, 32)
        if failed is None:
            break
        # isolated retry of the one failing query, degrading threads
        ok = False
        for threads in (32, 16, 8):
            j, f2 = run_worker(active[:i + 1], i, threads)
            if f2 is None and j == i + 1:
                if threads != 32:
                    fallbacks[failed] = f"threads{threads}"
                ok = True
                break
        if not ok:
            hard_errs.add(failed)
        i += 1

# a query that hard-errs on every attempt of every pass reports None;
# one that timed in any pass keeps its valid minimum
times = {name: (min(v) if v else None) for name, v in rep_times.items()}
for n in hard_errs:
    times.setdefault(n, None)
total = round(sum(v for v in times.values() if v is not None), 3)
res = {"total": total, "reps": reps, "agg": "min", "queries": times,
       "rep_queries": {k: v for k, v in rep_times.items() if v},
       "fallbacks": fallbacks,
       "sf": sfdir}
if out_path:
    json.dump(res, open(out_path, "w"), indent=1)
print(json.dumps({"total": total, "reps": reps, "agg": "min", "sf": sfdir,
                  "fallbacks": fallbacks}))
for name, v in sorted(times.items(), key=lambda kv: -(kv[1] or 0))[:15]:
    print(f"  {name}: {v}")
