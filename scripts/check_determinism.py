#!/usr/bin/env python3
"""Compare two Verify output dirs query-by-query (row count + content hash).

Catches nondeterminism that a single oracle compare can't see (unstable
ordering, partition-dependent floats, racey state). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/det1" \
        "runMain graft.Verify /root/testdata/sf0.01 /tmp/det2"
    python3 scripts/check_determinism.py /tmp/det1 /tmp/det2
"""
import duckdb, glob, os, sys

d1root, d2root = sys.argv[1], sys.argv[2]
con = duckdb.connect()
bad, n = [], 0
for d1 in sorted(glob.glob(f"{d1root}/*")):
    name = os.path.basename(d1)
    if name == "oracle_sql.json":
        continue
    n += 1
    d2 = f"{d2root}/{name}"
    try:
        q = "SELECT count(*), sum(hash(t::VARCHAR)) FROM read_parquet('{}/*.parquet') t"
        h1 = con.sql(q.format(d1)).fetchone()
        h2 = con.sql(q.format(d2)).fetchone()
        if h1 != h2:
            bad.append((name, h1, h2))
    except Exception as e:
        bad.append((name, "error", str(e)[:120]))

if bad:
    print(f"{len(bad)}/{n} queries NON-DETERMINISTIC:")
    for b in bad:
        print(" ", b)
    sys.exit(1)
print(f"all {n} queries identical across runs")
