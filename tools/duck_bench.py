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
only.

Decade-corpus support: DUCK_TIMEOUT_SEC=N caps each query (a
threading.Timer fires con.interrupt(); the cell is recorded in a
separate `timeouts` map as a LOWER BOUND, excluded from later passes,
and never enters `total`). At a 100x corpus a handful of oracle texts
run for hours — a cell bounded below at N seconds while the engine
finishes in single digits is already a decided comparison, so the cap
loses nothing analytically. The artifact is also rewritten after every
worker segment, so a killed run leaves valid partial results."""
import json, os, subprocess, sys

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else None
reps = max(1, int(os.environ.get("DUCK_BENCH_REPS", "2")))
cap = float(os.environ.get("DUCK_TIMEOUT_SEC", "0"))

WORKER = r"""
import duckdb, json, os, sys, threading, time
sfdir, oracle_path, start, threads, cap = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
    float(sys.argv[5]))
names = sys.argv[6].split(",")
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
    # TIMEOUT is classified by an explicit per-query flag, not by
    # elapsed-time inference: the old >= cap-0.5 heuristic both
    # mislabeled genuine late errors as timeouts and let a timer firing
    # in the finish/cancel window poison the NEXT query's execute().
    # The lock + done flag make fire-after-finish impossible.
    state = {"done": False, "fired": False}
    lock = threading.Lock()
    def _fire():
        with lock:
            if not state["done"]:
                state["fired"] = True
                con.interrupt()
    timer = threading.Timer(cap, _fire) if cap > 0 else None
    if timer:
        timer.start()
    try:
        cur = con.execute(oracle[name])
        with lock:
            state["done"] = True
        if timer:
            timer.cancel()
        cur.fetchall()
        print(json.dumps({"name": name, "sec": round(time.time() - t0, 3)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"name": name,
                          "err": "TIMEOUT" if state["fired"] else str(e)[:200]}),
              flush=True)
        sys.exit(1)
    finally:
        if timer:
            timer.cancel()
sys.exit(0)
"""

oracle = json.load(open(oracle_path))
names = sorted(oracle)
rep_times = {}   # name -> [sec per pass]
hard_errs = set()
timeouts = {}    # name -> cap (lower bound; never enters total)
fallbacks = {}


def write_artifact():
    """(Re)write the artifact from current state — called after every
    worker segment so a killed run leaves valid partial results."""
    times = {name: (min(v) if v else None) for name, v in rep_times.items()}
    for n in hard_errs:
        times.setdefault(n, None)
    total = round(sum(v for v in times.values() if v is not None), 3)
    # a name can never be both measured and a timeout lower bound
    # (total + sum(timeouts) consumers would double-count it)
    t_out = {k: v for k, v in timeouts.items() if not rep_times.get(k)}
    res = {"total": total, "reps": reps, "agg": "min", "queries": times,
           "rep_queries": {k: v for k, v in rep_times.items() if v},
           "fallbacks": fallbacks, "timeouts": t_out,
           "timeout_cap_sec": cap or None, "sf": sfdir}
    if out_path:
        json.dump(res, open(out_path, "w"), indent=1)
    return total, times


def run_worker(sub, start, threads):
    """Stream (name, sec|err) from a worker running sub[start:];
    returns (index after last success, failed_name | None, err | None)."""
    proc = subprocess.Popen(
        [sys.executable, "-c", WORKER, sfdir, oracle_path, str(start),
         str(threads), str(cap), ",".join(sub)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    idx = start
    failed = err = None
    for line in proc.stdout:
        line = line.strip()
        if not line.startswith("{"):  # interpreter-startup noise
            continue
        got = json.loads(line)
        if "err" in got:
            failed, err = got["name"], got["err"]
            print(f"ERR {got['name']}: {got['err']}", file=sys.stderr)
            break
        rep_times.setdefault(got["name"], []).append(got["sec"])
        idx += 1
    rc = proc.wait()
    if failed is None and idx < len(sub) and rc != 0:
        # worker died (segfault) before printing the error line
        failed, err = sub[idx], f"worker exited rc={rc}"
        print(f"ERR {failed}: {err}", file=sys.stderr)
    write_artifact()
    return idx, failed, err


for p in range(reps):
    # hard-erred AND timed-out queries are excluded from the worker's
    # list ENTIRELY: the old index-skip only applied between worker
    # segments, so a hard-err query still re-ran inside later bulk
    # workers — a success there would .append onto the None sentinel
    # (AttributeError, run lost), and a later-pass failure clobbered a
    # valid pass-1 timing. A timed-out query would burn the cap again
    # every pass for no information.
    active = [n for n in names if n not in hard_errs and n not in timeouts]
    i = 0
    while i < len(active):
        i, failed, err = run_worker(active, i, 32)
        if failed is None:
            break
        if err == "TIMEOUT":
            # a bounded-below cell, not an error: no degrading-threads
            # retry (it would burn 3 more caps), no effect on total.
            # But a query that already has a successful timing from an
            # earlier pass is NOT a timeout cell — recording both would
            # double-count it in any total+sum(timeouts) consumer
            # (SCALE.md's ">= N s" recipe); keep the measured min.
            if not rep_times.get(failed):
                timeouts[failed] = cap
            i += 1
            continue
        # isolated retry of the one failing query, degrading threads
        ok = False
        for threads in (32, 16, 8):
            j, f2, e2 = run_worker(active[:i + 1], i, threads)
            if f2 is None and j == i + 1:
                if threads != 32:
                    fallbacks[failed] = f"threads{threads}"
                ok = True
                break
            if e2 == "TIMEOUT":
                break  # slower threads won't beat the cap either
        if not ok:
            if e2 == "TIMEOUT" or err == "TIMEOUT":
                if not rep_times.get(failed):
                    timeouts[failed] = cap
            else:
                hard_errs.add(failed)
        i += 1

# a query that hard-errs on every attempt of every pass reports None;
# one that timed in any pass keeps its valid minimum
total, times = write_artifact()
print(json.dumps({"total": total, "reps": reps, "agg": "min", "sf": sfdir,
                  "fallbacks": fallbacks, "timeouts": timeouts}))
for name, v in sorted(times.items(), key=lambda kv: -(kv[1] or 0))[:15]:
    print(f"  {name}: {v}")
