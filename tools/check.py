#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB with views over the sfDir
tables, and diffs: row count, column names, and a hash over the
column-name-sorted, row-sorted stringified values (the strictest plausible
interpretation of the driver's compare).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

# The oracle hash identity is pinned to this DuckDB version: aggregate fold
# order, float formatting, and CLOB/quoting behavior can all shift across
# releases and would flake a hash compare with no engine change. Fail loudly
# on an image upgrade instead of chasing a phantom regression.
EXPECTED_DUCKDB = "1.0.0"
if duckdb.__version__ != EXPECTED_DUCKDB:
    sys.exit(
        f"check.py: duckdb {duckdb.__version__} != pinned {EXPECTED_DUCKDB}; "
        f"oracle hashes are only valid on the pinned version — re-validate the "
        f"suite on the new version, then update EXPECTED_DUCKDB here.")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    out = df.map(cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"ROWS  {name}: rows={len(got)} (no oracle)")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, ec = canon(got), canon(exp)
        if list(gc.columns) != list(ec.columns):
            print(f"FAIL  {name}: columns differ spark={list(gc.columns)} oracle={list(ec.columns)}")
            n_fail += 1
        elif len(gc) != len(ec):
            print(f"FAIL  {name}: rows differ spark={len(gc)} oracle={len(ec)}")
            n_fail += 1
        elif not gc.equals(ec):
            neq = (gc != ec).any(axis=1)
            print(f"FAIL  {name}: {neq.sum()} mismatched rows; first:")
            idx = neq[neq].index[:3]
            for i in idx:
                print(f"   spark : {gc.loc[i].to_dict()}")
                print(f"   oracle: {ec.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(gc)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

main()
