#!/bin/bash
# Round-12 FINAL bench chain at the frozen 186-query surface: sf0.1 +
# gsf1/2/5/10, one JVM per point (standing protocol: re-record ALL points
# in one calm session whenever the query count moves). gsf data is fresh
# (regenerated 12:55 from the current sf0.1). Nothing may compile or edit
# sources while this runs.
set -e
cd /root/repo
rm -f target/bench_chain_done target/bench_chain_failed
{
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf01_r12.json sbt -batch "runMain graft.Bench"
  for N in 1 2 5 10; do
    SPARK_GRAFT_SF_DIR=/root/repo/data/gsf$N SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf$N.json sbt -batch "runMain graft.Bench"
  done
} > target/bench_chain_r12.log 2>&1 || { echo FAILED > target/bench_chain_failed; exit 1; }
cp bench_sf01_r12.json bench_out.json
echo DONE > target/bench_chain_done
