#!/bin/bash
# Round-3 TPU batch 3: lane-cap sweep at te4, 128-spp fault point, bench
# re-run (checksum pulls + 16-spp chunks), TF ladder (config 2), and the
# equal-spp parity render (VERDICT r2 #6). Detach with:
#   nohup bash probes/run_r3_queue3.sh > probes/results/r3_queue3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RESULTS=probes/results
touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

echo "=== gate4 start $(date +%H:%M:%S)"
PROBE_PART=gate4 timeout 2000 python probes/probe_dq_sweep.py \
  > "$RESULTS/gate4.jsonl" 2> "$RESULTS/gate4.err"
echo "=== gate4 rc=$? $(date +%H:%M:%S)"

echo "=== bench start $(date +%H:%M:%S)"
BENCH_TIMEOUT=2500 timeout 2700 python bench.py > "$RESULTS/bench_r3b.json" 2> "$RESULTS/bench_r3b.err"
echo "=== bench rc=$? $(date +%H:%M:%S)"

echo "=== bench_tf start $(date +%H:%M:%S)"
BENCH_TF=1 BENCH_TIMEOUT=2000 BENCH_STAGES="512:64:device_queue" \
  timeout 2200 python bench.py > "$RESULTS/bench_tf.json" 2> "$RESULTS/bench_tf.err"
echo "=== bench_tf rc=$? $(date +%H:%M:%S)"

echo "=== parity4k start $(date +%H:%M:%S)"
PROBE_RES=1024 PROBE_SPP=4096 timeout 4800 python probes/probe_parity.py \
  > "$RESULTS/parity4k.jsonl" 2> "$RESULTS/parity4k.err"
echo "=== parity4k rc=$? $(date +%H:%M:%S)"

echo "=== fault128 start $(date +%H:%M:%S)"
FAULT_POINTS="1024:128:16384" timeout 3000 python probes/probe_fault.py \
  > "$RESULTS/fault128.log" 2>&1
echo "=== fault128 rc=$? $(date +%H:%M:%S)"
echo "=== queue3 finished $(date +%H:%M:%S)"
