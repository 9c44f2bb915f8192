#!/bin/bash
# Round-11 bench chain: regenerate gsf data from the round's fresh sf0.1,
# then one full-suite Bench JVM per scale point, then the flat-cost
# subset run for SCALE.md's fixed-overhead audit. No other sbt/spark may
# run concurrently.
set -e
cd /root/repo
rm -f target/bench_chain_done target/bench_chain_failed
{
  for N in 1 2 5 10; do
    rm -rf data/gsf$N
    sbt -batch "runMain graft.tools.GenData data/gsf$N $N.0 /root/testdata/sf0.1"
  done
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf01_r11.json sbt -batch "runMain graft.Bench"
  for N in 1 2 5 10; do
    SPARK_GRAFT_SF_DIR=/root/repo/data/gsf$N SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf$N.json sbt -batch "runMain graft.Bench"
  done
  # flat-cost audit: five sub-second queries alone vs their in-suite times
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench q15_groupby_count q21_sort_desc q26_lit a05_flag t02_quality_score"
} > target/bench_chain_r11.log 2>&1 || { echo FAILED > target/bench_chain_failed; exit 1; }
cp bench_sf01_r11.json bench_out.json
echo DONE > target/bench_chain_done
