#!/bin/bash
# Round-3 TPU tunnel health watcher. Polls device enumeration (bounded);
# when the tunnel heals it runs the round-3 queued probes ONCE,
# sequentially (exactly one TPU process at a time), then keeps polling
# health only. Waits while /tmp/pytest_busy exists (CPU pytest contends
# with TPU timing, NOTES.md). Start with:
#   nohup bash probes/watcher_r3.sh > probes/results/watcher_r3.log 2>&1 &
# Stop with: kill $(cat /tmp/watcher_r3.pid)
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/watcher_r3.pid
RESULTS=probes/results
mkdir -p "$RESULTS"
PROBES_DONE="$RESULTS/.probes_r3_done"

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
  if [ -f /tmp/tpu_busy ] || [ -f /tmp/pytest_busy ]; then
    echo "$ts skip poll: busy marker present"
    sleep 120
    continue
  fi
  out=$(health_probe 2>/dev/null)
  rc=$?
  if [ $rc -eq 0 ] && [ -n "$out" ]; then
    echo "$ts HEALTHY $out"
    echo "$out" > "$RESULTS/health.json"
    if [ ! -f "$PROBES_DONE" ]; then
      echo "$ts running round-3 queued probes"
      touch /tmp/tpu_busy
      PROBE_PART=gate timeout 3000 python probes/probe_dq_sweep.py \
        > "$RESULTS/gate.jsonl" 2> "$RESULTS/gate.err"
      echo "gate rc=$?"
      PROBE_PART=gate1024 timeout 3000 python probes/probe_dq_sweep.py \
        > "$RESULTS/gate1024.jsonl" 2> "$RESULTS/gate1024.err"
      echo "gate1024 rc=$?"
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
