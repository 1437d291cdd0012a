#!/usr/bin/env python3
"""Local oracle-parity check (mimics the driver's t2 gate).

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name>/ parquet + oracle_sql.json, runs the SQL
in DuckDB over views of the sf parquet tables, and diffs values with
columns sorted by name and rows sorted.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: timestamps → iso strings, floats keep
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet written"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"OK?  {name}: rows-only ({len(got)} rows)"); n_pass += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        bad = None
        kind_bad = None
        for c in g.columns:
            ka, kb = g[c].dtype.kind, w[c].dtype.kind
            # int-vs-float drift (e.g. DuckDB HUGEINT -> float64) hashes
            # differently in the driver even when values compare equal.
            if {ka, kb} == {"f"} or {ka, kb} <= {"i", "u"}:
                pass
            elif ("f" in (ka, kb)) and (ka in "iu" or kb in "iu"):
                kind_bad = (c, g[c].dtype, w[c].dtype)
                break
        if kind_bad:
            c, da, db = kind_bad
            print(f"FAIL {name}: col {c} dtype kind {da} vs {db} (int/float drift)")
            n_fail += 1; continue
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = (~eq).idxmax()
                bad = (c, i, a[i], b[i], (~eq).sum())
                break
        if bad:
            c, i, av, bv, n = bad
            print(f"FAIL {name}: col {c} row {i}: got {av!r} want {bv!r} ({n} diffs)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
