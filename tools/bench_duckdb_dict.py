#!/usr/bin/env python3
"""DuckDB side of the dictionary-serving A/B (graft.DictScale): the
same global COUNT(DISTINCT) shapes over the same raw sf lineitem, and
the same point lookup over the same hash-bucketed layout. Run
back-to-back with DictScale in one window; medians mirror its
protocol (first run warms, reps timed).

Usage: python3 tools/bench_duckdb_dict.py <sfDir> <bucketDir> [reps] [cols] [bloomDir]
"""
import os, json, statistics, sys, time
import duckdb


def timed(con, sql, reps):
    con.execute(sql).fetchall()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        con.execute(sql).fetchall()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main(sf_dir, bucket_dir, reps=3, cols=None, bloom_dir=None):
    con = duckdb.connect()
    p = f"{sf_dir}/lineitem.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"create view lineitem as select * from read_parquet('{src}')")
    con.execute(
        f"create view li_bucketed as select * from read_parquet('{bucket_dir}/*.parquet')")
    out = {}
    for c in cols or ["l_suppkey", "l_quantity", "l_orderkey"]:
        out[f"distinct_{c}"] = timed(
            con, f"select count(distinct {c}) from lineitem", reps)
    out["point_lookup"] = timed(
        con,
        "select count(*), sum(l_orderkey), sum(cast(l_quantity as decimal(18,2))) "
        "from li_bucketed where l_suppkey = 3", reps)
    if bloom_dir:
        con.execute("create view li_bloom as select * from "
                    f"read_parquet('{bloom_dir}/*.parquet')")
        out["bloom_point_lookup"] = timed(
            con,
            "select count(*), sum(l_linenumber) from li_bloom "
            "where l_orderkey = 7", reps)
    print(json.dumps({"bench": "dict_scale_duckdb", "sf": sf_dir,
                      "reps": reps, "duckdb_sec": out}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         sys.argv[4].split(",") if len(sys.argv) > 4 and sys.argv[4] else None,
         sys.argv[5] if len(sys.argv) > 5 else None)
