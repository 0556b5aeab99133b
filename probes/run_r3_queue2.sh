#!/bin/bash
# Round-3 TPU batch 2: bench ladder on the retuned engine, fault-boundary
# ladder, TF-path ladder (BASELINE config 2), equal-spp parity render
# (VERDICT r2 #6). Sequential, one TPU process at a time. Detach with:
#   nohup bash probes/run_r3_queue2.sh > probes/results/r3_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RESULTS=probes/results
touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

echo "=== bench start $(date +%H:%M:%S)"
BENCH_TIMEOUT=3000 timeout 3200 python bench.py > "$RESULTS/bench_r3a.json" 2> "$RESULTS/bench_r3a.err"
echo "=== bench rc=$? $(date +%H:%M:%S)"

echo "=== fault start $(date +%H:%M:%S)"
timeout 5400 python probes/probe_fault.py > "$RESULTS/fault.log" 2>&1
echo "=== fault rc=$? $(date +%H:%M:%S)"

echo "=== bench_tf start $(date +%H:%M:%S)"
BENCH_TF=1 BENCH_TIMEOUT=2500 BENCH_STAGES="512:16:device_queue" \
  timeout 2700 python bench.py > "$RESULTS/bench_tf.json" 2> "$RESULTS/bench_tf.err"
echo "=== bench_tf rc=$? $(date +%H:%M:%S)"

echo "=== parity4k start $(date +%H:%M:%S)"
PROBE_RES=1024 PROBE_SPP=4096 timeout 5400 python probes/probe_parity.py \
  > "$RESULTS/parity4k.jsonl" 2> "$RESULTS/parity4k.err"
echo "=== parity4k rc=$? $(date +%H:%M:%S)"
echo "=== queue2 finished $(date +%H:%M:%S)"
