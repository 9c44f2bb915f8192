#!/bin/bash
# Round-21 chain at the grown 244-query surface (s19 concurrent store
# mutations, s20 health-triggered maintenance routing, st26 streaming
# compaction under ingest, p20 shard sink, st27 stream delete routing,
# p21 dataloader resume plan added after chain
# bc20). Standing protocol: re-record ALL five points in one calm session
# whenever the query count moves. Anchors first (sf0.1 -> gsf1 -> gsf10 ->
# gsf2 -> gsf5) so a wall-clock truncation costs the least informative
# points. Nothing may compile or edit sources while this runs. Markers are
# CHAIN-NAMESPACED (bc21) and the sf0.1 output file suffix matches the
# chain namespace (bench_sf01_r21.json), prior-chain files left immutable.
cd /root/repo
rm -f target/bench_chain_done_bc21 target/bench_chain_failed_bc21
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf01_r21.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc21_sf01.log 2>&1 || { echo 1 > target/bench_chain_failed_bc21; exit 1; }
SPARK_GRAFT_SF_DIR=data/gsf1 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf1.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc21_sf1.log 2>&1 || { echo 2 > target/bench_chain_failed_bc21; exit 2; }
SPARK_GRAFT_SF_DIR=data/gsf10 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf10.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc21_sf10.log 2>&1 || { echo 3 > target/bench_chain_failed_bc21; exit 3; }
SPARK_GRAFT_SF_DIR=data/gsf2 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf2.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc21_sf2.log 2>&1 || { echo 4 > target/bench_chain_failed_bc21; exit 4; }
SPARK_GRAFT_SF_DIR=data/gsf5 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf5.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc21_sf5.log 2>&1 || { echo 5 > target/bench_chain_failed_bc21; exit 5; }
cp bench_sf01_r21.json bench_out.json
echo ALL_DONE > target/bench_chain_done_bc21
