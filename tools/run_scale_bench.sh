#!/bin/bash
# Canonical scale-bench pair (graft + DuckDB back-to-back per sf).
# Bench totals on this box swing >2x with external load — only quote
# numbers captured at loadavg < 2 (see ROUND_NOTES.md).
cd "$(dirname "$0")/.." || exit 1
date; uptime
for sf in sf1 sf10; do
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_PREFER_SMJ=false \
    sbt -batch "runMain graft.ScaleBench target/$sf 5" 2>&1 | grep '"bench"'
  python3 tools/bench_duckdb.py "target/$sf" /tmp/verify_out/oracle_sql.json 5
done
uptime

# sf100 pair (only when loadavg < 2; bucketed stage needs ~50G spill
# headroom and is skipped — its story is measured at sf10):
#   SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_PREFER_SMJ=false \
#     SPARK_GRAFT_SKIP_BUCKETED=1 sbt -batch 'runMain graft.ScaleBench target/sf100 3'
#   python3 tools/bench_duckdb.py target/sf100 /tmp/verify_out/oracle_sql.json 3
