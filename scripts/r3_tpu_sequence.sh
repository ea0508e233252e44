#!/bin/bash
# Round-3 TPU measurement sequence — run the moment the axon tunnel is up.
# STRICTLY SEQUENTIAL: the host has one CPU core and one chip; two TPU
# processes corrupt each other's timings (see docs + scripts/component_cost.py).
# Logs land in /tmp/r3logs/; each step's stdout JSON is kept separately.
set -u
LOG=/tmp/r3logs
mkdir -p $LOG
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a $LOG/sequence.log
  timeout "$STEP_TIMEOUT" "$@" > $LOG/$name.json 2> $LOG/$name.err
  rc=$?
  echo "--- $name rc=$rc ($(date +%H:%M:%S))" | tee -a $LOG/sequence.log
  tail -5 $LOG/$name.err | tee -a $LOG/sequence.log
  cat $LOG/$name.json | tee -a $LOG/sequence.log
}

STEP_TIMEOUT=1200 run step1_roofline python scripts/roofline.py
STEP_TIMEOUT=2400 run step2_bench_default python bench.py
STEP_TIMEOUT=2400 run step3_bench_pallas_on python bench.py --use-pallas on
STEP_TIMEOUT=1200 run step4_c1_split python scripts/c1_split.py
STEP_TIMEOUT=1800 run step6_hugecone python scripts/hugecone_bench.py
STEP_TIMEOUT=4800 run step5_bench_all python scripts/bench_all.py --scale full
echo "=== step7 tpu smoke ($(date +%H:%M:%S)) ===" | tee -a $LOG/sequence.log
SOCP_TPU_SMOKE=1 timeout 3600 python -m pytest tests/ -m tpu -q \
  > $LOG/step7_smoke.out 2>&1
echo "--- smoke rc=$? ---" | tee -a $LOG/sequence.log
tail -5 $LOG/step7_smoke.out | tee -a $LOG/sequence.log
echo "=== DONE ($(date +%H:%M:%S)) ===" | tee -a $LOG/sequence.log
