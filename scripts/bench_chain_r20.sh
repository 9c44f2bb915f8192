#!/bin/bash
# Round-20 chain at the grown 238-query surface (s17 requantize, s18
# incremental compaction, st25 streaming index append, mm14 stored-index
# media dedup, p19 curate→pack→shard added after chain bc19). Standing protocol:
# re-record ALL five points in one calm session whenever the query count
# moves. Anchors first (sf0.1 -> gsf1 -> gsf10 -> gsf2 -> gsf5) so a
# wall-clock truncation costs the least informative points. Nothing may
# compile or edit sources while this runs. Markers are CHAIN-NAMESPACED
# (bc20), and — the round-18 ADVICE pin — the sf0.1 output file suffix
# now MATCHES the chain namespace (bench_sf01_r20.json), with prior-chain
# files left immutable.
cd /root/repo
rm -f target/bench_chain_done_bc20 target/bench_chain_failed_bc20
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf01_r20.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc20_sf01.log 2>&1 || { echo 1 > target/bench_chain_failed_bc20; exit 1; }
SPARK_GRAFT_SF_DIR=data/gsf1 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf1.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc20_sf1.log 2>&1 || { echo 2 > target/bench_chain_failed_bc20; exit 2; }
SPARK_GRAFT_SF_DIR=data/gsf10 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf10.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc20_sf10.log 2>&1 || { echo 3 > target/bench_chain_failed_bc20; exit 3; }
SPARK_GRAFT_SF_DIR=data/gsf2 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf2.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc20_sf2.log 2>&1 || { echo 4 > target/bench_chain_failed_bc20; exit 4; }
SPARK_GRAFT_SF_DIR=data/gsf5 SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf5.json sbt -batch "runMain graft.Bench" > /root/repo/target/bc20_sf5.log 2>&1 || { echo 5 > target/bench_chain_failed_bc20; exit 5; }
cp bench_sf01_r20.json bench_out.json
echo ALL_DONE > target/bench_chain_done_bc20
