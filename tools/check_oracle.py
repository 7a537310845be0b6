#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify.scala's
parquet dumps against the DuckDB oracle SQL on the same tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # make list/array cells hashable+comparable
    for c in df.columns:
        if df[c].map(lambda x: isinstance(x, (list, np.ndarray))).any():
            df[c] = df[c].map(lambda x: tuple(x) if isinstance(x, (list, np.ndarray)) else x)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"COLS spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            exact = ok
        else:
            try:
                exact = av.equals(bv) or (av.astype(object) == bv.astype(object)).all()
            except Exception as e:
                return f"CMPERR {c}: {e}"
        if not exact:
            bad = None
            for i in range(len(av)):
                x, y = av.iloc[i], bv.iloc[i]
                eq = (x == y) if not isinstance(x, float) else (x == y or (pd.isna(x) and pd.isna(y)))
                if isinstance(eq, (list, tuple, np.ndarray)):
                    eq = all(eq)
                if not eq:
                    bad = (i, x, y); break
            return f"VAL col={c} first-mismatch={bad}"
    # dtype check (schema-ish)
    dt = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns if str(a[c].dtype) != str(b[c].dtype)]
    if dt:
        return f"DTYPE {dt} (values match)"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); n_bad += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        except Exception as e:
            print(f"[ERR ] {name}: read spark parquet: {e}"); n_bad += 1; continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"[ERR ] {name}: duckdb: {e}"); n_bad += 1; continue
        diff = compare(name, spark_df, duck_df)
        if diff is None:
            print(f"[ OK ] {name} ({len(spark_df)} rows)"); n_ok += 1
        else:
            print(f"[FAIL] {name}: {diff}"); n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
