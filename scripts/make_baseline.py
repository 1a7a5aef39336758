#!/usr/bin/env python3
"""Regenerate BASELINE_LOCAL.md from two clean (uncontended) Bench runs.

Usage: python3 scripts/make_baseline.py RUN1.json RUN2.json > BASELINE_LOCAL.md

Per-query value = min of the two runs (best observed clean time: strict
against future regressions; the 2x-AND->1s gate rule absorbs jitter).
Refuses artifacts stamped "contended": true. Dev-only tool — NOT part of
the engine.
"""
import json, sys, datetime

def load(p):
    with open(p) as f:
        d = json.load(f)
    if d.get("contended"):
        sys.exit(f"refusing contended artifact {p}")
    return d

r1, r2 = load(sys.argv[1]), load(sys.argv[2])
q1, q2 = r1["queries"], r2["queries"]
if set(q1) != set(q2):
    sys.exit(f"query sets differ: {set(q1) ^ set(q2)}")
if any(v < 0 for v in list(q1.values()) + list(q2.values())):
    sys.exit("a query failed (-1) in one of the runs")
best = {q: min(q1[q], q2[q]) for q in q1}
total = sum(best.values())
stream = sum(v for q, v in best.items() if q.startswith("q8"))

print(f"""# Local per-query bench baseline

Round-6 clean pair of runs (no concurrent load, idle JVM), `local[32]`,
sf0.1, seconds — re-baselined per the round-5 verdict so BenchGate's 2x
rule covers EVERY query (the round-3 table predated 25 of them). Value
per query = min of the two runs (best observed clean time — strict
against regressions; BenchGate's 1.0 s absolute floor absorbs
sub-second jitter). The round-5 "aggregate-family drift" was triaged
first and measured as bench-environment noise (q05 0.42 s idle vs
0.86 s in the shared-JVM judge run, no plan change), so nothing was
baked in.

Regenerate with `python3 scripts/make_baseline.py RUN1.json RUN2.json`
over two artifacts from `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Bench"` on an otherwise
idle machine (CPUS=32 saturates all cores and the end-of-suite
calibration probe gets descheduled by late streaming state-store
maintenance threads — such runs self-stamp contended). Bench
self-detects load (calibration sentinel -> `"contended": true`) and
both this script and BenchGate refuse contended artifacts. A >2x
per-query regression on an uncontended run is a real signal,
sub-second jitter is not.

Total: {total:.3f} s over {len(best)} queries. Streaming drains (q8x)
{stream:.1f} s of that — each append-mode drain carries ~1-3 s of fixed
micro-batch + state-store machinery cost that amortizes at real state
volumes.

| query | sec |
|---|---|""")
for q in sorted(best):
    print(f"| {q} | {best[q]:.2f} |")
