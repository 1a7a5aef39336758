#!/usr/bin/env python3
"""Regenerate BASELINE_LOCAL.md from two or more clean (uncontended)
Bench runs, grouped by the environment (cpus) that produced them.

Usage: python3 scripts/make_baseline.py RUN1.json RUN2.json [RUN3.json ...] > BASELINE_LOCAL.md

Timings are NOT comparable across core counts (round 7: an 8-core
baseline graded against the driver's 32-core run produced 7 phantom
">2x regressions"), so runs are grouped by their "cpus" stamp and one
baseline table is emitted per environment under a `## Baseline,
cpus=N` heading; BenchGate selects the table matching the artifact's
own cpus stamp. Per environment: need >= 2 runs; per-query value =
UPPER MEDIAN across every run that measured it (for two runs, the
slower). Cross-run min was the round-10 lesson: queries with per-JVM
bimodal fixed costs (streaming drains most of all) let the min pick
the fast mode, after which any graded run landing in the slow mode
flags as a >2x "regression" — the exact false-positive class that
failed the round-8 gate and the round-9 driver run. The upper median
is the same pessimistic-robust statistic steady() applies within a
run, applied across runs; real regressions are multiples of the SLOW
mode, so sensitivity survives.
The LAST run per environment must contain every query (it defines the
current suite — queries added mid-round appear only in later runs);
earlier runs may be older subsets. Refuses artifacts stamped
"contended": true or lacking a cpus stamp. Per-query value per run is
the STEADY estimate over that run's attempt sample (the statistic
BenchGate judges — see steady() below), then upper median across runs. Dev-only
tool — NOT part of the engine.
"""
import json, sys

def steady(attempts):
    """Same statistic BenchGate judges (BenchGate.steadyEstimate): drop
    the first attempt (planning/codegen/JIT cost), upper median of the
    warmed rest; a single sample is its own estimate. Minting baselines
    from the SAME statistic the gate judges keeps the 2x line coherent —
    a min-of-N baseline graded against a warmed-median measurement made
    the line systematically stricter for variance-prone queries (round-9
    advice)."""
    if len(attempts) <= 1:
        return attempts[0] if attempts else -1.0
    def upper_median(xs):
        s = sorted(xs)
        return s[len(s) // 2]
    warm = attempts[1:]
    # recovery window (BenchGate round-12): a transient contended
    # stretch early in the sample must not decide the estimate once
    # re-measures have come back clean — min with the upper median of
    # the last 3 warmed attempts (can only lower the estimate)
    return min(upper_median(warm), upper_median(warm[-3:]))

def load(p):
    with open(p) as f:
        d = json.load(f)
    if d.get("contended"):
        sys.exit(f"refusing contended artifact {p}")
    if any(v < 0 for v in d["queries"].values()):
        sys.exit(f"a query failed (-1) in {p}")
    if "cpus" not in d:
        sys.exit(f"{p} lacks a \"cpus\" stamp (pre-round-8 Bench?) — "
                 "baselines are per-environment; re-run graft.Bench")
    att = d.get("attempts", {})
    qs = {q: steady(att.get(q, [v])) for q, v in d["queries"].items()}
    return int(d["cpus"]), qs, d.get("speed_index")

runs = [load(p) for p in sys.argv[1:]]
if len(runs) < 2:
    sys.exit("need at least two runs")
envs, speeds = {}, {}
for cpus, qs, spd in runs:
    envs.setdefault(cpus, []).append(qs)
    if spd is not None:
        speeds.setdefault(cpus, []).append(spd)

print("""# Local per-query bench baseline

Clean runs (no concurrent load, idle JVM), sf0.1, seconds, covering
EVERY query in the current suite, one table per environment (core
count). Value per query = UPPER MEDIAN across that environment's
uncontended runs of each run's STEADY estimate (itself the upper
median of that run's warmed attempts — the exact statistic BenchGate
judges, so the 2x line compares like-for-like; BenchGate's 1.0 s
absolute floor absorbs sub-second jitter; the cross-run upper median
keeps per-JVM bimodal fixed costs from minting a fast-mode baseline
that the slow mode then "regresses" against). BenchGate grades an
artifact ONLY against the table matching its own "cpus" stamp —
cross-environment comparison is refused, not guessed.

Regenerate with `python3 scripts/make_baseline.py RUN1.json RUN2.json ...`
over artifacts from `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
SPARK_GRAFT_CPUS=N sbt -batch "runMain graft.Bench"` on an otherwise
idle machine (runs right after a full `sbt test` inflate ~10%
uniformly — prefer cold-started runs, and note the upper median will
carry that inflation if half the inputs are inflated). Bench
self-detects load (calibration sentinel -> `"contended": true`) and
both this script and BenchGate refuse contended artifacts. A >2x
per-query regression on an uncontended like-for-like run is a real
signal, sub-second jitter is not.""")

for cpus in sorted(envs):
    group = envs[cpus]
    if len(group) < 2:
        sys.exit(f"cpus={cpus}: need at least two runs, got {len(group)}")
    suite = group[-1]
    for q in set().union(*group):
        if q not in suite:
            sys.exit(f"cpus={cpus}: {q} measured in an earlier run but absent "
                     "from the last (current-suite) artifact — was it removed?")
    def upper_median(vals):
        v = sorted(vals)
        return v[len(v) // 2]
    best = {q: upper_median([r[q] for r in group if q in r]) for q in suite}
    total = sum(best.values())
    stream = sum(v for q, v in best.items() if q.startswith("q8"))
    print(f"""
## Baseline, cpus={cpus}

Total: {total:.3f} s over {len(best)} queries ({len(group)} runs).
Streaming drains (q8x) {stream:.1f} s of that — each append-mode drain
carries ~1-3 s of fixed micro-batch + state-store machinery cost that
amortizes at real state volumes.""")
    if cpus in speeds:
        spd = upper_median(speeds[cpus])
        print(f"""Speed index: {spd:.3f} s (upper median across these runs of each
run's median calibration probe — the machine-speed anchor BenchGate
uses to report the speed-normalized total ratio; informational only).""")
    print("""
| query | sec |
|---|---|""")
    for q in sorted(best):
        print(f"| {q} | {best[q]:.2f} |")
