#!/bin/bash
# Round-15 final chain, take 2, at the frozen 219-query surface (s12
# removed as a probe-vetted scale non-starter — the take-1 chain was
# killed at gsf2 when s12's quadratic mass surfaced at gsf1).
# Point order: sf0.1 first (cheap, feeds bench_out.json), then the 10x
# and 100x anchors, then the 20x/50x mid points — so a wall-clock
# truncation costs the least informative points. One sbt JVM per point;
# nothing may compile or edit sources while this runs.
cd /root/repo
rm -f target/bench_chain_done target/bench_chain_failed
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf01_r15.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc15b_sf01.log 2>&1 || { echo 1 > target/bench_chain_failed; exit 1; }
cp bench_sf01_r15.json bench_out.json
SPARK_GRAFT_SF_DIR=data/gsf1 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf1.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc15b_sf1.log 2>&1 || { echo 2 > target/bench_chain_failed; exit 2; }
SPARK_GRAFT_SF_DIR=data/gsf10 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf10.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc15b_sf10.log 2>&1 || { echo 3 > target/bench_chain_failed; exit 3; }
SPARK_GRAFT_SF_DIR=data/gsf2 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf2.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc15b_sf2.log 2>&1 || { echo 4 > target/bench_chain_failed; exit 4; }
SPARK_GRAFT_SF_DIR=data/gsf5 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf5.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc15b_sf5.log 2>&1 || { echo 5 > target/bench_chain_failed; exit 5; }
echo ALL_DONE > target/bench_chain_done
