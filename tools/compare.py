#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [name_prefix ...]

Reads each <verifyOutDir>/<name>/ parquet (Spark side), runs the matching
oracle_sql.json entry in DuckDB over the sfDir tables, and compares
rows / schema (sorted column names) / values (columns sorted by name).
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    prefixes = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"{name}: SKIP (no spark output)")
            n_skip += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        try:
            oracle_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            n_fail += 1
            continue
        s_cols, o_cols = sorted(spark_rel.columns), sorted(oracle_rel.columns)
        s_df = spark_rel.df()[s_cols]
        o_df = oracle_rel.df()[o_cols]
        schema_ok = s_cols == o_cols
        rows_ok = len(s_df) == len(o_df)
        vals_ok = False
        if schema_ok and rows_ok:
            # row order: queries carry ORDER BY; compare after a stable
            # lexicographic sort to be robust to tie ordering
            s_s = s_df.astype(str).sort_values(s_cols).reset_index(drop=True)
            o_s = o_df.astype(str).sort_values(o_cols).reset_index(drop=True)
            vals_ok = s_s.equals(o_s)
        ok = schema_ok and rows_ok and vals_ok
        n_pass += ok
        n_fail += (not ok)
        tag = "PASS" if ok else "FAIL"
        detail = "" if ok else (
            f" rows={len(s_df)}/{len(o_df)} schema={s_cols}/{o_cols}" if not (rows_ok and schema_ok)
            else " value mismatch")
        print(f"{name}: {tag}{detail}")
        if not ok and rows_ok and schema_ok:
            diff = (s_s != o_s).any(axis=1)
            print(s_s[diff].head(5).to_string())
            print(o_s[diff].head(5).to_string())
    print(f"== pass={n_pass} fail={n_fail} skip={n_skip}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
