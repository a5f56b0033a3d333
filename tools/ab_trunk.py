"""In-process A/B of the VMEM trunk cache for HBM-streamed trace tables.

The HBM walk is DMA-latency-bound (~1 µs/iteration vs 333 ns in VMEM,
PERF_NOTES §9s) and preorder tables concentrate 98-99% of row visits in the
low rows (tools/sim_hbm_topcache.py §9x). The trunk cache
(ops/pallas_megakernel._with_hbm_bufs) copies the table's first K rows into
VMEM once per kernel and serves the walk from there while cursors are < K —
exact by the strictly-increasing-cursor argument (phase A/B split, no
parking). For PACKED12 scenes the ENTIRE walk section usually fits
(payload rows stay in HBM for the resolve loop), so K = tbl_rows skips the
DMA phase statically. This measures wall time + tile iterations across K,
round-robin per rep (mandatory: block timing drifts 1.5-2x). Outputs are
bitwise-equal across K (tests/test_megakernel.py::test_hbm_trunk_cache_bitwise).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_trunk.py \
           [--scene=/tmp/bigcbox.obj] [--packed=12] [--groups=1] [trunks...]
       trunk values: 0 = off, -1 = whole walk section, N = first N rows;
       default: 0 -1 8192. Scene defaults to the big subdivided cbox
       (generated on demand via make_bigscene.py).
"""

import os
import subprocess
import sys
import time

import numpy as np

from hijiki_tpu.utils.tpuenv import configure_tpu_env

configure_tpu_env()
from hijiki_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from hijiki_tpu.ops.pallas_megakernel import MEGA_PACKET_TPU, render_waves
from hijiki_tpu.scene.compile import compile_scene, scene_to_device
from hijiki_tpu.scene.obj import load_obj_scene

W = H = 512
P = MEGA_PACKET_TPU
REPS = 5


def main():
    scene_path = "/tmp/bigcbox.obj"
    packed = 12
    groups = 1
    ks = []
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            scene_path = a.split("=", 1)[1]
        elif a.startswith("--packed="):
            packed = int(a.split("=", 1)[1])
        elif a.startswith("--groups="):
            groups = int(a.split("=", 1)[1])
        else:
            ks.append(int(a))
    ks = ks or [0, -1, 8192]
    if not os.path.exists(scene_path) and scene_path == "/tmp/bigcbox.obj":
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_bigscene.py"),
             "2", scene_path],
            check=True,
        )
    print(f"devices: {jax.devices()}, {W}x{H}, P={P}, packed={packed}, "
          f"groups={groups}, trunks={ks}", file=sys.stderr)
    scene = load_obj_scene(scene_path)
    cs = scene_to_device(compile_scene(scene, packed_leaf=packed))
    print(f"table: {cs.trace_rows_mega.shape} "
          f"({cs.trace_rows_mega.nbytes / 1e6:.0f} MB), walk section "
          f"{cs.mega_num_tables_static}x{cs.mega_tbl_rows} rows "
          f"({cs.mega_num_tables_static * cs.mega_tbl_rows * 512 / 1e6:.1f} MB"
          f" padded)", file=sys.stderr)
    ks = [cs.mega_tbl_rows if k == -1 else k for k in ks]

    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(
            np.uint32
        )
    )

    def run(k):
        t, n, dep, st, ovf, bounces, rows, alb = render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000, packet=P,
            groups=groups, spec=False, table_in_hbm=True, trunk_rows=k,
        )
        return float(jnp.sum(t)), float(jnp.sum(rows)) / (8.0 * P)

    sums, iters = {}, {}
    for k in ks:
        t0 = time.monotonic()
        sums[k], iters[k] = run(k)
        print(f"warmup trunk={k}: {time.monotonic()-t0:.1f}s sum={sums[k]:.2f} "
              f"tile-iters={iters[k]:.0f}", file=sys.stderr)

    times = {k: [] for k in ks}
    for _ in range(REPS):
        for k in ks:
            t0 = time.monotonic()
            run(k)
            times[k].append(time.monotonic() - t0)

    base = min(times[ks[0]])
    for k in ks:
        t = min(times[k])
        print(f"trunk={k:6d}: {t*1e3:8.1f} ms  image-sum={sums[k]:10.2f}  "
              f"tile-iters={iters[k]:9.0f}  speedup vs trunk={ks[0]}: "
              f"{base/t:.3f}x")


if __name__ == "__main__":
    main()
