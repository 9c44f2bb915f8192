#!/bin/bash
# Round-19 chain at the grown 233-query surface (s14/s15/s16 vector-index
# lifecycle, mm13 routed media ANN, st24 streaming ANN retrieval, p18
# decontaminated curation added after chain bc18). Standing protocol:
# re-record ALL five points in one calm session whenever the query count
# moves. Anchors first (sf0.1 -> gsf1 -> gsf10 -> gsf2 -> gsf5) so a
# wall-clock truncation costs the least informative points. Nothing may
# compile or edit sources while this runs. Markers are CHAIN-NAMESPACED
# (bc19), and — the round-18 ADVICE pin — the sf0.1 output file suffix
# now MATCHES the chain namespace (bench_sf01_r19.json), with prior-chain
# files left immutable.
cd /root/repo
rm -f target/bench_chain_done_bc19 target/bench_chain_failed_bc19
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf01_r19.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc19_sf01.log 2>&1 || { echo 1 > target/bench_chain_failed_bc19; exit 1; }
SPARK_GRAFT_SF_DIR=data/gsf1 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf1.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc19_sf1.log 2>&1 || { echo 2 > target/bench_chain_failed_bc19; exit 2; }
SPARK_GRAFT_SF_DIR=data/gsf10 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf10.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc19_sf10.log 2>&1 || { echo 3 > target/bench_chain_failed_bc19; exit 3; }
SPARK_GRAFT_SF_DIR=data/gsf2 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf2.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc19_sf2.log 2>&1 || { echo 4 > target/bench_chain_failed_bc19; exit 4; }
SPARK_GRAFT_SF_DIR=data/gsf5 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf5.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc19_sf5.log 2>&1 || { echo 5 > target/bench_chain_failed_bc19; exit 5; }
cp bench_sf01_r19.json bench_out.json
echo ALL_DONE > target/bench_chain_done_bc19
