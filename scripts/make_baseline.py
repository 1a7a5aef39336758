#!/usr/bin/env python3
"""Regenerate BASELINE_LOCAL.md from two or more clean (uncontended)
Bench runs.

Usage: python3 scripts/make_baseline.py RUN1.json RUN2.json [RUN3.json ...] > BASELINE_LOCAL.md

Per-query value = min across every run that measured it (best observed
clean time: strict against future regressions; the 2x-AND->1s gate rule
absorbs jitter). The LAST run must contain every query (it defines the
current suite — queries added mid-round appear only in later runs);
earlier runs may be older subsets. Refuses artifacts stamped
"contended": true. Dev-only tool — NOT part of the engine.
"""
import json, sys

def load(p):
    with open(p) as f:
        d = json.load(f)
    if d.get("contended"):
        sys.exit(f"refusing contended artifact {p}")
    if any(v < 0 for v in d["queries"].values()):
        sys.exit(f"a query failed (-1) in {p}")
    return d["queries"]

runs = [load(p) for p in sys.argv[1:]]
if len(runs) < 2:
    sys.exit("need at least two runs")
suite = runs[-1]
for q in set().union(*runs):
    if q not in suite:
        sys.exit(f"{q} measured in an earlier run but absent from the last "
                 "(current-suite) artifact — was it removed?")
best = {q: min(r[q] for r in runs if q in r) for q in suite}
total = sum(best.values())
stream = sum(v for q, v in best.items() if q.startswith("q8"))

print(f"""# Local per-query bench baseline

Clean runs (no concurrent load, idle JVM), `local[8]`, sf0.1, seconds,
covering EVERY query in the current suite. Value per query = min across
{len(runs)} uncontended runs (best observed clean time — strict against
regressions; BenchGate's 1.0 s absolute floor absorbs sub-second
jitter).

Regenerate with `python3 scripts/make_baseline.py RUN1.json RUN2.json ...`
over artifacts from `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Bench"` on an otherwise
idle machine (CPUS=32 saturates all cores and the end-of-suite
calibration probe gets descheduled by late streaming state-store
maintenance threads — such runs self-stamp contended; runs right after
a full `sbt test` in the same JVM-warm window inflate ~10% uniformly,
which the min-across-runs rule absorbs). Bench self-detects load
(calibration sentinel -> `"contended": true`) and both this script and
BenchGate refuse contended artifacts. A >2x per-query regression on an
uncontended run is a real signal, sub-second jitter is not.

Total: {total:.3f} s over {len(best)} queries. Streaming drains (q8x)
{stream:.1f} s of that — each append-mode drain carries ~1-3 s of fixed
micro-batch + state-store machinery cost that amortizes at real state
volumes.

| query | sec |
|---|---|""")
for q in sorted(best):
    print(f"| {q} | {best[q]:.2f} |")
