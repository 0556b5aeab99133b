#!/bin/bash
# Round-3 TPU batch 4: while-loop floor attribution (array-count scaling)
# + config-5 timed datagen throughput. Detach with:
#   nohup bash probes/run_r3_queue4.sh > probes/results/r3_queue4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RESULTS=probes/results
touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

echo "=== floor start $(date +%H:%M:%S)"
timeout 2400 python probes/probe_floor.py > "$RESULTS/floor.jsonl" 2> "$RESULTS/floor.err"
echo "=== floor rc=$? $(date +%H:%M:%S)"

echo "=== datagen start $(date +%H:%M:%S)"
cd /tmp && DATAGEN_N_IMAGES=2 DATAGEN_SPP_TARGET=256 DATAGEN_RES=512 \
  DATAGEN_H5_NAME=bench_dataset timeout 2400 \
  python /root/repo/scripts/datagen_denoise.py \
  > /root/repo/probes/results/datagen_tpu.log 2>&1
echo "=== datagen rc=$? $(date +%H:%M:%S)"
cd /root/repo
echo "=== queue4 finished $(date +%H:%M:%S)"
