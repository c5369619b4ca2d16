#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
  2. registers each test table in DuckDB as a view over its parquet
  3. runs every oracle_sql.json query, compares against the Spark dump:
     columns sorted by name, rows sorted, EXACT value equality
     (floats included — the graft queries route double aggregation
     through exact decimal arithmetic precisely so that exact float
     equality holds; a 1-ulp miss here means a query skipped that
     machinery and must be fixed, not tolerated)
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create or replace view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con, f"select * from read_parquet('{out_dir}/{name}/*.parquet')")
            want = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok = True
        why = ""
        if list(got.columns) != list(want.columns):
            ok, why = False, f"columns {list(got.columns)} vs {list(want.columns)}"
        elif len(got) != len(want):
            ok, why = False, f"rows {len(got)} vs {len(want)}"
        else:
            for c in got.columns:
                a, b = got[c].tolist(), want[c].tolist()
                for i, (x, y) in enumerate(zip(a, b)):
                    if x is None and y is None:
                        continue
                    if isinstance(x, float) and isinstance(y, float):
                        if math.isnan(x) and math.isnan(y):
                            continue
                        if x != y:
                            ok, why = False, f"col {c} row {i}: {x!r} != {y!r} (diff {abs(x-y):.3g})"
                            break
                    elif str(x) != str(y):
                        ok, why = False, f"col {c} row {i}: {x!r} != {y!r}"
                        break
                if not ok:
                    break
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {why}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
