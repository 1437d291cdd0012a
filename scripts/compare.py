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
    # optional 3rd arg: path to write a driver-style JSON summary
    # ({name: {rows_match, schema_match, hash_match, spark_rows,
    # oracle_rows, err}}) — committed per round as CORRECTNESS_SELF.json
    # so an empty/absent driver artifact never leaves a round unattested.
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    results = {}
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
        def rec(rows_match, schema_match, hash_match, sr, orr, err):
            results[name] = {"rows_match": rows_match,
                "schema_match": schema_match, "hash_match": hash_match,
                "spark_rows": sr, "oracle_rows": orr, "err": err}
        if not files:
            print(f"FAIL {name}: no parquet written"); n_fail += 1
            rec(False, False, False, 0, None, "no parquet written"); continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"OK?  {name}: rows-only ({len(got)} rows)"); n_pass += 1
            rec(len(got) > 0, None, None, len(got), None, "rows-only")
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1
            rec(False, False, False, len(got), None, f"oracle SQL error: {e}")
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            rec(len(g) == len(w), False, False, len(g), len(w), None); continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1
            rec(False, True, False, len(g), len(w), None); continue
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
            n_fail += 1
            rec(True, False, False, len(g), len(w),
                f"dtype drift on {c}: {da} vs {db}"); continue
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
            rec(True, True, False, len(g), len(w),
                f"value diff col {c} row {i}")
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
            rec(True, True, True, len(g), len(w), None)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
