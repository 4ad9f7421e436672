"""Benchmark harness: runs every registered query of __spark_entry__ at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query seconds.

Each query is fully materialized via a noop-format write (forces the whole
plan, including the final projection, without collecting to the driver).

Per-query time is the MIN OF 2 reps (VERDICT r8 §wrong#1): a single rep
conflates plan cost with whatever JVM/page-cache state the process
happens to be in — r7 vs r8 read as a 43% "regression" that was pure
cold-vs-warm variance (judge-reproduced both numbers from identical
plans).  Rep 1 pays codegen/JIT/page-cache for the plan shape; rep 2 is
the plan.  min(r1, r2) tracks plan changes and is immune to one-sided
cold starts.  $SPARK_GRAFT_BENCH_REPS overrides (1 restores the old
behavior; the per-query cold rep is still reported in `cold_total_sec`).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from domanda_etl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="domanda-etl-spark-bench")

    qs = entrymod.queries()

    # untimed warmup: first join/agg pays JVM JIT + codegen compilation
    # (~3 s) that would otherwise be billed to whichever query runs first
    try:
        entrymod.entry(spark).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    try:
        reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    except ValueError:
        # a malformed override must not kill the run before the one
        # parseable JSON line the contract promises even on failure
        print("BENCH WARN: bad SPARK_GRAFT_BENCH_REPS, using 2", file=sys.stderr)
        reps = 2
    timings: dict[str, float] = {}
    first_rep: dict[str, float] = {}
    for name in sorted(qs):
        best = None
        for r in range(reps):
            t0 = time.perf_counter()
            try:
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
            except Exception as e:  # keep the bench line parseable even on failure
                best = -1.0
                # a rep-1 success followed by a rep-2 failure must not leave
                # the query in cold_total_sec while total_sec excludes it —
                # both totals cover the same (successful) query set
                first_rep.pop(name, None)
                print(f"BENCH ERROR {name}: {e}", file=sys.stderr)
                break
            if r == 0:
                first_rep[name] = round(dt, 2)
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 2) if best >= 0 else -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    cold_total = round(sum(t for t in first_rep.values() if t >= 0), 3)
    failed = sorted(n for n, t in timings.items() if t < 0)
    slowest = dict(
        sorted(
            ((n, t) for n, t in timings.items() if t >= 0),
            key=lambda kv: -kv[1],
        )[:8]
    )
    def _payload(qmap: dict[str, float], truncated: bool) -> str:
        d = {
            "metric": "declared_query_suite_wall",
            "value": total,
            "unit": "sec",
            "queries": qmap,
            # summary keys LAST: downstream captures that keep only the
            # tail of this line still see the headline numbers
            "n_queries": len(timings),
            "n_failed": len(failed),
            "failed": failed,
            "slowest": slowest,
            "total_sec": total,
            "reps": reps,
            "cold_total_sec": cold_total,
            "sf": sf,
        }
        if truncated:
            d["queries_truncated"] = True
            d["full_map"] = os.path.basename(out_path)
        return json.dumps(d, separators=(",", ":"))

    # redundant on-disk copy: a fixed-width stdout capture downstream can
    # truncate the line; the file preserves the full structured payload.
    # SPARK_GRAFT_BENCH_OUT redirects it (the contract test uses a temp
    # file so smoke runs stop clobbering the committed sf0.1 artifact).
    # BENCH_LOCAL.json is GENERATED OUTPUT (gitignored as of r14, VERDICT
    # r13 §next#7): the driver overwrites it after every per-round bench,
    # so committing it guaranteed working-tree churn. Builder quiet runs
    # that should persist are committed under BENCH_QUIET_r{N}.json and
    # referenced from PERF.md instead.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
    )
    full_payload = _payload(timings, False)
    # the one-parseable-stdout-line contract must survive an unwritable
    # redirect path: warn on stderr, keep going
    try:
        with open(out_path, "w") as f:
            f.write(full_payload + "\n")
    except OSError as exc:
        print(f"bench: WARN could not write {out_path}: {exc}", file=sys.stderr)
    # The driver records only the LAST 2000 bytes of stdout and JSON-parses
    # that capture — a line longer than the capture window arrives truncated
    # and parses to null (observed in BENCH_r04/r05). If the full per-query
    # map does not fit, emit a parseable line that keeps every FAILED query
    # (always at -1.0) plus the slowest timings, dropping the cheapest
    # entries first; the full map lives in BENCH_LOCAL.json either way.
    payload = full_payload
    if len(payload) + 1 > 2000:
        keep = sorted(timings, key=lambda n: (timings[n] >= 0, -timings[n]))
        qmap = dict(sorted(timings.items()))
        for name in reversed(keep):  # cheapest successful queries first
            if len(_payload(qmap, True)) + 1 <= 1900 or len(qmap) == 0:
                break
            del qmap[name]
        payload = _payload(qmap, True)
    # stop Spark BEFORE printing: JVM shutdown can emit trailing output, and
    # the contract is that the JSON line is the LAST thing on stdout
    spark.stop()
    print(payload, flush=True)


if __name__ == "__main__":
    main()
