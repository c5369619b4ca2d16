#!/bin/bash
# Round-17 sf100 cross-engine ledger (VERDICT r16 ask #1): every ratio
# through the round-16 noop-sink harnesses (graft) / full arrow fetch
# (DuckDB), graft and DuckDB back-to-back per phase so both see the
# same machine. Only quote numbers whose embedded canaries read calm.
# SPARK_DRIVER_MEM=48g: the forked run JVM defaults to 8g, which OOMs
# the sf100 join/agg shapes (the BENCH_SCALE r5 note records 48g).
set -x
cd "$(dirname "$0")/.." || exit 1
export SPARK_DRIVER_MEM=48g
ORACLE=/tmp/verify_out/oracle_sql.json
LOGDIR=/tmp/r17_ledger
mkdir -p $LOGDIR
date; uptime

# Phase A: headline relational + bucketed/transparent q12 (ScaleBench
# reuses the 128-bucket layouts once built; build cost in its JSON).
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BUCKETS=128 SPARK_GRAFT_PREFER_SMJ=false \
  sbt -batch "runMain graft.ScaleBench target/sf100 3" 2>&1 | tee $LOGDIR/scalebench.log | grep '"bench"'
uptime
python3 tools/bench_duckdb.py target/sf100 $ORACLE 3 \
  q1_agg,q2_filter_between,q9_orderby_limit,q12_join_multi,q6_count_star \
  2>&1 | tee $LOGDIR/duckdb_headline.log
date; uptime

# Phase B: q12 push/no-push/auto arms over the layouts phase A built.
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Q12Arms target/sf100 3 128" \
  2>&1 | tee $LOGDIR/q12arms.log | grep -E '"bench"|q12_arm'
date; uptime

# Phase C: the DuckDB-strong shapes (window rank, percentile,
# count-distinct, string_agg) + q45 full-outer, graft then DuckDB.
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.LedgerBench target/sf100 q16_count_distinct,q20_window_rank,q27_percentile,q34_string_agg,q45_join_full 3" \
  2>&1 | tee $LOGDIR/ledger_sf100.log | grep '"bench"'
uptime
python3 tools/bench_duckdb.py target/sf100 $ORACLE 3 \
  q16_count_distinct,q20_window_rank,q27_percentile,q34_string_agg,q45_join_full,q6_count_star \
  2>&1 | tee $LOGDIR/duckdb_shapes.log
date; uptime

# Phase D: the documents/events-backed shapes at sf100-equivalent
# volumes (disjoint-copy corpora — linear is the true asymptote).
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.LedgerBench target/docs_scale_x1000 q38_explode 3" \
  2>&1 | tee $LOGDIR/ledger_q38.log | grep '"bench"'
python3 tools/bench_duckdb.py target/docs_scale_x1000 $ORACLE 3 q38_explode \
  2>&1 | tee $LOGDIR/duckdb_q38.log
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.LedgerBench target/events_x1000 q42_range_join 3" \
  2>&1 | tee $LOGDIR/ledger_q42.log | grep '"bench"'
python3 tools/bench_duckdb.py target/events_x1000 $ORACLE 3 q42_range_join \
  2>&1 | tee $LOGDIR/duckdb_q42.log
date; uptime

# Phase E: serve arms (dict / matview / topk) at sf100.
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.DictScale target/sf100 3 64" \
  2>&1 | tee $LOGDIR/dictscale.log | grep '"bench"'
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.MatViewScale target/sf100 3" \
  2>&1 | tee $LOGDIR/matview.log | grep '"bench"'
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.TopKScale target/sf100 3" \
  2>&1 | tee $LOGDIR/topk.log | grep '"bench"'
date; uptime
