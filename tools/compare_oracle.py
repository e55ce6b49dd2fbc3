#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare_oracle.py /root/testdata/sf0.01 /tmp/verify_out

Reads oracle_sql.json + per-query parquet dumps written by graft.Verify,
registers the sf tables as DuckDB views, runs each oracle SQL, and compares
(column names sorted, values compared row by row after sorting rows).
"""
import json, sys, glob
import duckdb
import pandas as pd

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types: decimals -> str, timestamps -> iso str, floats kept
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ddf = con.execute(sql).fetchdf()
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            a, b = normalize(sdf), normalize(ddf)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns spark={list(a.columns)} duckdb={list(b.columns)}")
                n_fail += 1; continue
            if len(a) != len(b):
                print(f"FAIL {name}: rows spark={len(a)} duckdb={len(b)}")
                n_fail += 1; continue
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                print(f"FAIL {name}: value mismatch in {bad_cols}")
                for c in bad_cols[:2]:
                    i = neq[c].idxmax()
                    print(f"   row {i} col {c}: spark={a[c][i]!r} duckdb={b[c][i]!r}")
                n_fail += 1; continue
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
