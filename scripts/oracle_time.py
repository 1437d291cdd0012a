#!/usr/bin/env python3
"""Per-oracle DuckDB cost audit (the oracle-side PlanSizeAuditSpec).

Usage: python3 scripts/oracle_time.py <sfDir> <oracleJsonOrVerifyDir> [budget_s] [json_out]

Times every oracle SQL in DuckDB over views of the sf parquet tables and
fails (exit 1) if any single oracle exceeds the budget (default 5 s).
Motivation: round 10's driver correctness gate came back empty because ONE
oracle (kcore_membership, inlined multiply-referenced CTEs) cost 320 s at
sf0.01.  This keeps every oracle under budget so the full compare fits the
driver's window.
"""
import sys, os, json, time
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main():
    sf_dir = sys.argv[1]
    src = sys.argv[2]
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    json_out = sys.argv[4] if len(sys.argv) > 4 else None
    if os.path.isdir(src):
        src = os.path.join(src, "oracle_sql.json")
    with open(src) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    times = {}
    errors = {}
    total = 0.0
    for name in sorted(oracle):
        t0 = time.time()
        err = None
        try:
            con.execute(oracle[name]).fetchall()
        except Exception as e:
            err = str(e).splitlines()[0]
            errors[name] = err
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt
        flag = " <-- OVER BUDGET" if dt > budget else ""
        if err:
            print(f"ERR  {name} {dt:7.2f}s  {err}")
        elif dt > budget or dt > 1.0:
            print(f"time {name} {dt:7.2f}s{flag}")
    over = {k: v for k, v in times.items() if v > budget}
    print(f"== total {total:.1f}s over {len(times)} oracles; "
          f"{len(over)} over {budget:.1f}s budget; {len(errors)} errored ==")
    for k in sorted(over, key=over.get, reverse=True):
        print(f"  OVER {k} {over[k]:.2f}s")
    for k in sorted(errors):
        print(f"  ERR  {k}: {errors[k]}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"total_s": round(total, 1), "budget_s": budget,
                       "times": times, "errors": errors},
                      f, indent=1, sort_keys=True)
    # a broken oracle fails FAST — it must fail the audit, not pass it
    sys.exit(1 if (over or errors) else 0)

if __name__ == "__main__":
    main()
