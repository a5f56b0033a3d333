#!/bin/bash
# Probe the axon TPU tunnel until it recovers, then run the on-chip
# measurement queue (tools/onchip_queue.sh). ONE TPU process at a time —
# each probe attempt is a fresh process; on success the queue runs its
# steps sequentially. Progress in /tmp/onchip/wait.log.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p /tmp/onchip
LOG=/tmp/onchip/wait.log
: > "$LOG"

for i in $(seq 1 40); do
  echo "[$(date +%H:%M:%S)] probe attempt $i" >> "$LOG"
  if timeout 2100 python - >> "$LOG" 2>&1 <<'EOF'
import hijiki_tpu  # tpuenv before backend init
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
import jax.numpy as jnp
y = (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
print("tunnel OK:", d, float(y[0, 0]), flush=True)
EOF
  then
    echo "[$(date +%H:%M:%S)] tunnel recovered — running queue" >> "$LOG"
    bash /root/repo/tools/onchip_queue.sh >> "$LOG" 2>&1
    echo "[$(date +%H:%M:%S)] queue finished" >> "$LOG"
    exit 0
  fi
  sleep 120
done
echo "[$(date +%H:%M:%S)] gave up after 40 attempts" >> "$LOG"
exit 1
