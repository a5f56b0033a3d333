#!/bin/bash
# Quiet-window tunnel recovery: the axon relay wedge may be kept alive by
# our own probe churn (failed setups can leave unclaimed grants; recovery
# needs "stop all TPU clients, wait for the remote claim to expire").
# Strategy: hold an initial radio-silent window with ZERO TPU clients, then
# probe at a low rate (one bounded client per interval). On success, run
# the on-chip measurement queue.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p /tmp/onchip
LOG=/tmp/onchip/wait_quiet.log
: > "$LOG"
QUIET=${1:-5400}     # initial silence (s)
INTERVAL=${2:-2700}  # gap between probes (s)

echo "[$(date +%H:%M:%S)] quiet window ${QUIET}s begins" >> "$LOG"
sleep "$QUIET"
for i in $(seq 1 20); do
  echo "[$(date +%H:%M:%S)] quiet probe $i" >> "$LOG"
  if timeout 2100 python - >> "$LOG" 2>&1 <<'PYEOF'
import hijiki_tpu  # tpuenv before backend init
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
import jax.numpy as jnp
y = (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
print("tunnel OK:", d, float(y[0, 0]), flush=True)
PYEOF
  then
    echo "[$(date +%H:%M:%S)] tunnel recovered — running queue" >> "$LOG"
    bash /root/repo/tools/onchip_queue.sh >> "$LOG" 2>&1
    echo "[$(date +%H:%M:%S)] queue finished" >> "$LOG"
    exit 0
  fi
  sleep "$INTERVAL"
done
echo "[$(date +%H:%M:%S)] gave up" >> "$LOG"
exit 1
