#!/usr/bin/env python3
"""Times the headline oracle SQL in DuckDB over the same parquet files
graft's ScaleBench reads — the single-node baseline for the
throughput-ratio comparison (VERDICT r2 asked for this at sf1, where
scan/shuffle design rather than fixed job overhead decides the ratio).

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [reps] [queries]
(oracle_sql.json as dumped by `runMain graft.Verify`; only the headline
queries are timed unless [queries] gives a comma-separated override —
the hook the round-10 widened sf100 ledger runs through.)
"""
import json, os, statistics, sys, time
import duckdb

HEADLINE = ["q1_agg", "q2_filter_between", "q9_orderby_limit", "q12_join_multi",
            "q6_count_star"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, reps=3, queries=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue  # scaled dirs carry only the tables their rows need
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"create or replace view {t} as select * from read_parquet('{src}')")
    oracle = json.load(open(oracle_path))
    out = {}
    for name in (queries or HEADLINE):
        # FULL query, materialized via arrow (round 16): the old
        # count(*) wrap let BOTH engines prune work, but asymmetrically
        # — Spark's ColumnPruning drops aggregate expressions out of a
        # grouped subquery under count() while DuckDB still computes
        # them (the round-15 Q12Arms discovery). The honest protocol:
        # graft writes every output row to the noop sink (full in-engine
        # materialization, no driver transfer); DuckDB matches with a
        # full-query arrow fetch (full in-engine columnar
        # materialization, no per-row Python conversion). Trailing
        # ORDER BYs now execute on both sides — the noop write pays the
        # sort too.
        sql = oracle[name]
        con.execute(sql).fetch_arrow_table()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            con.execute(sql).fetch_arrow_table()
            ts.append(time.time() - t0)
        out[name] = statistics.median(ts)
    print(json.dumps({"bench": "scale", "sf": sf_dir, "reps": reps,
                      "duckdb_sec": out}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         sys.argv[4].split(",") if len(sys.argv) > 4 else None)
