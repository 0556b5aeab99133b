#!/bin/bash
# Round-3 TPU probe queue: run sequentially, exactly one TPU process at a
# time, results to probes/results/. Detach with:
#   nohup bash probes/run_r3_queue.sh > probes/results/r3_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RESULTS=probes/results
touch /tmp/tpu_busy
trap 'rm -f /tmp/tpu_busy' EXIT

step() {  # step <name> <timeout> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)"
  timeout "$to" "$@" > "$RESULTS/$name.jsonl" 2> "$RESULTS/$name.err"
  echo "=== $name rc=$? $(date +%H:%M:%S)"
}

step gate2   3000 env PROBE_PART=gate2   python probes/probe_dq_sweep.py
step gate3   2000 env PROBE_PART=gate3   python probes/probe_dq_sweep.py
step compact_ab 2000 env PROBE_PART=compact python probes/probe_dq_sweep.py
echo "=== queue finished $(date +%H:%M:%S)"
