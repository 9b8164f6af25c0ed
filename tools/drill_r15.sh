#!/bin/bash
# Round-15 scale drills (run AFTER the quiet bench — each step serially so
# every capture is alone on the box):
#  A. sf0.1-gen subset point for the queries whose code/shape changed this
#     round (q166 capped seeds, q188 new) plus q143 for a same-capture
#     comparison base.
#  B. sf1.0 full top-15+q188 drill at SPARK_DRIVER_MEM=16g (round-14 needed
#     48g; the memory-budget pass wants per-executor realism at <=16g).
#  C. q143 at sf1.0 with spark.sql.shuffle.partitions=320 (partitions
#     scaled ~ sf while local[32] pins threads) — the honest cluster knob.
# Artifacts land under bench/ with NEW names (never clobber committed
# captures — the round-13 lesson).
set -x
cd /root/repo || exit 1
D15="q128_pagerank,q133_trustrank,q135_communities,q143_assoc_rules,q145_link_predict,q164_perplexity_buckets,q166_anf_calibration,q169_ccnet_composition,q172_curriculum_packing,q173_cdc_containment,q174_cdc_admit,q175_leak_safe_split,q181_signal_agreement,q184_assembly_funnel,q99_pipeline_funnel,q188_maximal_runs"

echo "== A: sf0.1-gen subset =="
SPARK_GRAFT_SF_DIR=/root/repo/target/sfgen/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_ONLY="q143_assoc,q166_anf_calibration,q188_maximal" \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r15_sf01gen_sub.json \
  sbt -batch "runMain graft.Bench" > /tmp/drill_r15_a.log 2>&1

echo "== B: sf1.0 top15+q188 at 16g =="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/target/sfgen/sf1 \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_ONLY="$D15" \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r15_sf1_top16_16g.json \
  sbt -batch "runMain graft.Bench" > /tmp/drill_r15_b.log 2>&1

echo "== C: q143 sf1.0, partitions=320 =="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/target/sfgen/sf1 \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_ONLY="q143_assoc" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=320 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r15_sf1_q143_p320.json \
  sbt -batch "runMain graft.Bench" > /tmp/drill_r15_c.log 2>&1
echo "== drills done rc=$? =="
