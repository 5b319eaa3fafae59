#!/usr/bin/env python3
"""Dev-loop oracle check: compare Verify parquet dumps against DuckDB.

Usage: python3 tools/check_oracle.py OUT_DIR SF_DIR [query ...]

Mirrors the driver's compare: sort columns by name, run the oracle SQL
over the same parquet tables, hash values row-wise after a canonical
string render. Exit 1 on any mismatch.
"""
import json, sys, glob, os
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failed = []
    for name in (names or sorted(oracle)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            print(f"{name}: NO DUMP"); failed.append(name); continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        spark = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"{name}: rows={len(spark)} (no oracle)"); continue
        ora = con.execute(oracle[name]).fetchdf()
        sc, oc = sorted(spark.columns), sorted(ora.columns)
        if [c.lower() for c in sc] != [c.lower() for c in oc]:
            print(f"{name}: SCHEMA MISMATCH spark={sc} oracle={oc}")
            failed.append(name); continue
        if len(spark) != len(ora):
            print(f"{name}: ROWS {len(spark)} vs {len(ora)}")
            failed.append(name); continue
        srows = [tuple(canon(v) for v in r) for r in spark[sc].itertuples(index=False)]
        orows = [tuple(canon(v) for v in r) for r in ora[[c for c in sorted(ora.columns)]].itertuples(index=False)]
        if srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"{name}: VALUE MISMATCH at row {bad}:\n  spark={srows[bad]}\n  ora  ={orows[bad]}")
            failed.append(name); continue
        print(f"{name}: OK rows={len(spark)}")
    sys.exit(1 if failed else 0)

main()
