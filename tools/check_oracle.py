#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Runs each oracle_sql.json entry in DuckDB over the sf parquet tables,
loads the engine's parquet output for the same query, and compares:
column sets, row counts, and a hash of the values with columns sorted
by name and rows sorted canonically. Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string with stable float formatting
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if v != v:
                return "NaN"
            return f"{v:.9g}"
        if isinstance(v, bool):
            return str(bool(v))
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def df_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update(("|".join(df.columns) + "\n").encode())
    for row in df.itertuples(index=False):
        h.update(("\x1f".join(row) + "\n").encode())
    return h.hexdigest()[:16]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING ENGINE OUTPUT")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        cg, ce = canon(got), canon(exp)
        if list(cg.columns) != list(ce.columns):
            print(f"{name}: COLUMN MISMATCH got={list(cg.columns)} exp={list(ce.columns)}")
            failures += 1
            continue
        if len(cg) != len(ce):
            print(f"{name}: ROWCOUNT MISMATCH got={len(cg)} exp={len(ce)}")
            failures += 1
            continue
        hg, he = df_hash(cg), df_hash(ce)
        if hg != he:
            print(f"{name}: HASH MISMATCH ({len(cg)} rows)")
            diff = cg.compare(ce) if cg.shape == ce.shape else None
            if diff is not None and not diff.empty:
                print(diff.head(5))
            failures += 1
        else:
            print(f"{name}: OK ({len(cg)} rows)")
    rows_only = [d.split('/')[-1] for d in sorted(glob.glob(f"{out_dir}/[a-z]*")) if '.' not in d.split('/')[-1]]
    for name in rows_only:
        if name not in oracle:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            status = "rows-only" if n > 0 else "EMPTY (rows-only check would fail)"
            print(f"{name}: {status} ({n} rows)")
            if n == 0:
                failures += 1
    print(f"\n{'PASS' if failures == 0 else 'FAIL'}: {failures} failures")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
