#!/bin/bash
# Round-13 close-out: full verify at both oracle SFs, the final quiet bench
# capture, and the full ScalaTest suite — run serially so the bench stays
# quiet. Dev-only (test scope); artifacts land in the repo root.
cd /root/repo || exit 1
log=/tmp/v13_close.log
: > "$log"
echo "== verify sf0.01 ==" >> "$log"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v13_fin01" >> "$log" 2>&1 \
  && python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/v13_fin01 >> "$log" 2>&1
echo "== verify sf0.001 ==" >> "$log"
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/v13_fin001" >> "$log" 2>&1 \
  && python3 tools/oracle_check.py /root/testdata/sf0.001 /tmp/v13_fin001 >> "$log" 2>&1
echo "== bench ==" >> "$log"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" >> "$log" 2>&1
cp /root/repo/BENCH.json /root/repo/BENCH_r13_final_quiet.json
echo "== tests ==" >> "$log"
sbt -batch test > /tmp/v13_test.log 2>&1
echo "== all done rc=$? ==" >> "$log"
