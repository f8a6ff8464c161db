#!/usr/bin/env python3
"""Dev-loop replica of the driver's DuckDB-oracle comparison.

Usage: python3 scripts/check.py [sf_dir] [verify_out_dir]

Loads each <verify_out_dir>/<name>/ parquet (Spark result), runs the
matching oracle_sql.json entry in DuckDB over the sf_dir tables, sorts
columns by name, and compares values exactly (and as sorted multisets
as a fallback diagnostic). NOT part of the shipped library — dev tool.
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)  # full precision — we target bit-exactness
    return repr(v)

def rows_of(df):
    cols = sorted(df.columns)
    return [tuple(canon(r[c]) for c in cols) for _, r in df[cols].iterrows()], cols

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:  # dev-loop subset, mirrors Verify/Bench
        keep = {n.strip() for n in only.split(",") if n.strip()}
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            sdf = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            ddf = con.sql(oracle[name]).df()
            srows, scols = rows_of(sdf)
            drows, dcols = rows_of(ddf)
            if scols != dcols:
                print(f"FAIL {name}: columns differ spark={scols} duck={dcols}")
                n_fail += 1; continue
            if srows == drows:
                print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
            elif sorted(srows) == sorted(drows):
                print(f"WARN {name}: values match but ROW ORDER differs"); n_fail += 1
            else:
                sset, dset = set(srows), set(drows)
                print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}; "
                      f"spark-only={list(sset-dset)[:2]} duck-only={list(dset-sset)[:2]}")
                n_fail += 1
        except Exception as e:
            print(f"ERROR {name}: {e}"); n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
