#!/bin/bash
# Resume of the round-13 chain at the frozen 200-query surface: the bc13
# chain died after gsf1 (sf0.1 and gsf1 are banked in bench_sf01_r13.json /
# bench_sf1.json). This records the remaining gsf2/gsf5/gsf10 points, one
# JVM per point. Nothing may compile or edit sources while this runs.
cd /root/repo
rm -f target/bench_chain_done target/bench_chain_failed
SPARK_GRAFT_SF_DIR=data/gsf2 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf2.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc13_sf2.log 2>&1 || { echo 3 > target/bench_chain_failed; exit 3; }
SPARK_GRAFT_SF_DIR=data/gsf5 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf5.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc13_sf5.log 2>&1 || { echo 4 > target/bench_chain_failed; exit 4; }
SPARK_GRAFT_SF_DIR=data/gsf10 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf10.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc13_sf10.log 2>&1 || { echo 5 > target/bench_chain_failed; exit 5; }
cp bench_sf01_r13.json bench_out.json
echo ALL_DONE > target/bench_chain_done
