#!/bin/bash
# TPU tunnel health watcher. Polls device enumeration (bounded); when the
# tunnel heals it runs the queued probes ONCE, sequentially (exactly one
# TPU process at a time), then keeps polling health only. Results land in
# probes/results/. Start with:
#   nohup bash probes/watcher.sh > probes/results/watcher.log 2>&1 &
# Stop with: kill $(cat /tmp/watcher.pid)
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/watcher.pid
RESULTS=probes/results
mkdir -p "$RESULTS"
PROBES_DONE="$RESULTS/.probes_done"

health_probe() {
  timeout 240 python - <<'EOF'
import time, json
t0 = time.time()
import jax
devs = jax.devices()
import jax.numpy as jnp
y = (jnp.arange(4096.0) * 2 + 1).sum()
y.block_until_ready()
print(json.dumps({"devices": [str(d) for d in devs],
                  "total_s": round(time.time() - t0, 2), "val": float(y)}))
EOF
}

while true; do
  ts=$(date +%H:%M:%S)
  if [ -f /tmp/tpu_busy ]; then
    echo "$ts skip poll: /tmp/tpu_busy present"
    sleep 120
    continue
  fi
  out=$(health_probe 2>/dev/null)
  rc=$?
  if [ $rc -eq 0 ] && [ -n "$out" ]; then
    echo "$ts HEALTHY $out"
    echo "$out" > "$RESULTS/health.json"
    if [ ! -f "$PROBES_DONE" ]; then
      echo "$ts running queued probes"
      touch /tmp/tpu_busy
      timeout 3000 python probes/probe_engines.py \
        > "$RESULTS/engines.jsonl" 2> "$RESULTS/engines.err"
      echo "probe_engines rc=$?"
      timeout 3000 python probes/probe_phases.py \
        > "$RESULTS/phases.jsonl" 2> "$RESULTS/phases.err"
      echo "probe_phases rc=$?"
      timeout 3000 python probes/probe_parity.py \
        > "$RESULTS/parity.jsonl" 2> "$RESULTS/parity.err"
      echo "probe_parity rc=$?"
      rm -f /tmp/tpu_busy
      touch "$PROBES_DONE"
      echo "$ts probes done"
    fi
    sleep 600
  else
    echo "$ts wedged (rc=$rc)"
    sleep 300
  fi
done
