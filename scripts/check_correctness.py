#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_correctness.py [VERIFY_OUT] [SF_DIR]

Reads graft.Verify output (one parquet dir per query + oracle_sql.json),
runs each oracle statement in DuckDB against the same parquet tables, and
compares: schema (column names sorted), ARROW COLUMN TYPES (strict — the
driver's hash is type-sensitive, so a DuckDB DECIMAL(38,0) vs Spark BIGINT
mismatch fails the driver even when every value is identical; round-11
escape class), row count, and values (rows compared both as-emitted and
sorted; floats compared as raw IEEE-754 BITS with NaN canonicalized — the
driver's hash distinguishes +0.0 from -0.0, round-12 escape class;
None==None).

Dev-only tool — NOT part of the engine (the engine is Scala/Spark only).
"""
import sys, os, json, glob, math, struct

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        # Bit-strict: the driver's hash is value-BIT sensitive (round-12
        # escape class: Spark +0.0 vs DuckDB -0.0 compared equal under
        # Python's == and the old round(v, 9)). Canonicalize NaN only.
        if math.isnan(v):
            return ("nan",)
        return ("f", struct.pack("<d", v).hex())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, bytes):
        return ("b", v.hex())
    return v


def canon_type(t):
    """Canonical arrow type string for strict compare. Only unify families
    the driver's hash provably treats as equal (string storage width); every
    numeric width/kind difference is a REAL driver-hash failure."""
    s = str(t)
    if s in ("large_string", "string_view"):
        return "string"
    if s in ("large_binary", "binary_view"):
        return "binary"
    s = s.replace("large_list<", "list<").replace("large_string", "string")
    return s


def type_mismatches(s_schema, d_schema, cols):
    out = []
    for c in cols:
        a = canon_type(s_schema.field(c).type)
        b = canon_type(d_schema.field(c).type)
        if a != b:
            out.append((c, a, b))
    return out


def rows_of(cols, table):
    """List of row tuples with columns ordered by sorted column name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ncols = [[norm(v) for v in col] for col in table]
    return [tuple(ncols[i][r] for i in order) for r in range(len(table[0]) if table else 0)]


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1; failures.append(name); continue
        st = pq.read_table(files[0])
        try:
            d = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1; failures.append(name); continue
        scols, dcols = sorted(st.column_names), sorted(d.column_names)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            n_fail += 1; failures.append(name); continue
        tmism = type_mismatches(st.schema, d.schema, scols)
        if tmism:
            print(f"FAIL {name}: column TYPES differ (driver hash is "
                  f"type-sensitive) spark-vs-duck: {tmism}")
            n_fail += 1; failures.append(name); continue
        if st.num_rows != d.num_rows:
            print(f"FAIL {name}: rows spark={st.num_rows} duck={d.num_rows}")
            n_fail += 1; failures.append(name); continue
        srows = rows_of(st.column_names, [c.to_pylist() for c in st.columns])
        drows = rows_of(d.column_names, [c.to_pylist() for c in d.columns])
        if srows == drows:
            print(f"PASS {name} ({st.num_rows} rows, ordered)")
            n_pass += 1
        elif sorted(map(repr, srows)) == sorted(map(repr, drows)):
            print(f"PASS* {name} ({st.num_rows} rows, order differs)")
            n_pass += 1
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diffs}")
            n_fail += 1; failures.append(name)
    # queries without an oracle: rows-only check
    for d in sorted(glob.glob(f"{out}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        nr = pq.read_table(files[0]).num_rows if files else 0
        print(f"{'PASS' if nr > 0 else 'FAIL'} {name} (rows-only: {nr})")
    print(f"\n{n_pass} pass, {n_fail} fail" + (f": {failures}" if failures else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
