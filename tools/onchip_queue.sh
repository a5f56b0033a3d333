#!/bin/bash
# Round-2/3 on-chip measurement queue — run when the axon tunnel is live.
# ONE TPU process at a time (memory: hijiki-tpu-workflow); this script runs
# each probe sequentially and logs to /tmp/onchip/. Order follows
# docs/ROADMAP.md's perf agenda.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
mkdir -p /tmp/onchip

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" 2>&1 | tee /tmp/onchip/"$name".log | tail -12
}

# 0. sanity + current headline
run bench python bench.py

# 1. VMEM formats: SLIM (16-col) and PACKED3 (32-col 3-prim) vs classic
run ab_vmem_formats python tools/ab_packedleaf.py 0 1 3

# 2. HBM formats on the 405k-tri scene: classic vs PACKED4 vs PACKED12
run ab_hbm_formats python tools/ab_packedleaf.py \
  --scene=/tmp/bigcbox.obj --hbm 0 4 12

# 3. grouped DMA-pipelined HBM walker at the winning format
run ab_hbm_groups python tools/ab_hbmgroups.py 1 2 4 8

# 3b. VMEM trunk cache on the HBM walk (0 = off, -1 = whole walk section,
#     8192 = partial). The auto default is ON (resolve_mega_trunk) — if this
#     measures a regression, flip it off (HIJIKI_MEGA_TRUNK=0 / revert the
#     resolver) before reading bench_configs' cfg4b.
run ab_trunk python tools/ab_trunk.py 0 -1 8192
run ab_trunk_g4 python tools/ab_trunk.py --groups=4 0 -1

# 3c. G-retune at the candidate VMEM formats (playbook step 1's follow-up,
#     inlined so one recovery window is self-sufficient: SLIM halves
#     bytes/slice so G=8's union shrinkage may now clear its fetch cost)
run ab_groups_slim python tools/ab_groups.py 512 1024 1,2,4,8 --packed=1
run ab_groups_p3 python tools/ab_groups.py 512 1024 1,2,4,8 --packed=3

# 4. walk-isolated fetch-width probe at 2048^2 (slice-count vs bytes cost
#    model: w16/slim/pack3/pack4 vs w32 at identical ALU)
run walk_probe python tools/walk_probe.py widths

# 4b. pipelined winner-resolve loop (spec_resolve) at the current defaults,
#     then on the HBM-streamed big scene (sync DMA resolve -> pipelined)
run ab_resolve python tools/ab_resolve.py 512 1024 4 0
run ab_resolve_hbm python tools/ab_resolve.py \
  --hbm --scene=/tmp/bigcbox.obj 512 1024 4 12

# 5. the five BASELINE configs (headline refresh)
run bench_configs python tools/bench_configs.py --quick

# 6. CLI bitwise repeat-run parity on the real chip (the /verify gate for
#    estimator-preserving changes: two same-seed renders must match bitwise)
run verify_cli_a python -m hijiki_tpu.cli \
  /root/reference/scenes/cbox/cbox.obj --put-cbox-spheres --use-bvh \
  --driver mega -w 256 -H 256 -s 2 --seed 7 -o /tmp/onchip/verify_a.exr
run verify_cli_b python -m hijiki_tpu.cli \
  /root/reference/scenes/cbox/cbox.obj --put-cbox-spheres --use-bvh \
  --driver mega -w 256 -H 256 -s 2 --seed 7 -o /tmp/onchip/verify_b.exr
run verify_bitwise python -c 'import numpy as np
from hijiki_tpu.utils.exr import read_exr
a = read_exr("/tmp/onchip/verify_a.exr")
b = read_exr("/tmp/onchip/verify_b.exr")
print("bitwise identical:", np.array_equal(a, b), a.shape, float(a.mean()))'

echo "=== queue done; logs in /tmp/onchip/ ==="
