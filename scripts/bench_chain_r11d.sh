#!/bin/bash
# Round-11 FINAL bench chain at the 179-query surface (waves 3-5).
# gsf data unchanged (GenData is deterministic). Nothing may compile or edit sources while this runs.
set -e
cd /root/repo
rm -f target/bench_chain_done target/bench_chain_failed
{
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf01_r11.json sbt -batch "runMain graft.Bench"
  for N in 1 2 5 10; do
    SPARK_GRAFT_SF_DIR=/root/repo/data/gsf$N SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf$N.json sbt -batch "runMain graft.Bench"
  done
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench q15_groupby_count q21_sort_desc q26_lit a05_flag t02_quality_score"
} > target/bench_chain_r11d.log 2>&1 || { echo FAILED > target/bench_chain_failed; exit 1; }
cp bench_sf01_r11.json bench_out.json
echo DONE > target/bench_chain_done
