#!/bin/bash
# Round-16 scale drills (run serially, alone on the box):
#  A. sf1.0 re-drill of the round-16 top family on the current tree —
#     clean same-tree base for the sf3 ratios (q164/q169/q181 changed:
#     perplexity persist; q89 changed: Lloyd-trained books).
#  B. sf3.0 drill — the first measured point past 10x the bench SF
#     (verdict task #2: the next cliff, if any, is invisible below it).
#  C. q143/q136 on the sf1.0 WHALE corpus (8 whales, ~10k-supplier
#     baskets) — the capped projection measured where the cap BINDS
#     (verdict task #1's drill row).
# Artifacts under bench/ with NEW names (never clobber committed captures).
set -x
cd /root/repo || exit 1
D16="q143_assoc,q169_ccnet,q172_curriculum,q174_cdc_admit,q181_signal,q188_maximal,q164_perplexity,q89_embedding_pq"

echo "== A: sf1.0 top family, 16g =="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/target/sfgen/sf1 \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_ONLY="$D16" \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r16_sf1_top_16g.json \
  sbt -batch "runMain graft.Bench" > /tmp/drill_r16_a.log 2>&1

echo "== B: sf3.0 top family, 16g =="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/target/sfgen/sf3 \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_ONLY="$D16" \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r16_sf3_top_16g.json \
  sbt -batch "runMain graft.Bench" > /tmp/drill_r16_b.log 2>&1

echo "== C: q143/q136 on the sf1 whale corpus, 16g =="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/target/sfgen/sf1whale \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_ONLY="q143_assoc,q136_copurchase" \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r16_sf1whale_baskets.json \
  sbt -batch "runMain graft.Bench" > /tmp/drill_r16_c.log 2>&1
echo "== drills done rc=$? =="
