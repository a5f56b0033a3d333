"""In-process A/B of the window-DMA HBM walker (h-row descriptors).

The grouped HBM walk's ~636 ns group-step is ~2/3 DMA descriptor overhead
(429 ns/set, PERF_NOTES §11) and extra window rows are nearly free; the
window walker (_traverse_hbm_window) serves in-window visits from VMEM
scratch, cutting descriptor sets to the sim-measured 0.61-0.67x
(tools/sim_dma_window.py). This measures wall time + rounds across window
heights at the production G, round-robin per rep (mandatory: block timing
drifts 1.5-2x, PERF_NOTES §8). Image sums must be IDENTICAL across h
(bitwise estimator, tests/test_megakernel.py::test_hbm_window_bitwise).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_window.py \
           [--scene=/tmp/bigcbox405.obj] [--packed=4] [--groups=2] [h...]
       default heights: 1 2 4; scene defaults to the 405k-tri bigcbox
       (levels=3 via make_bigscene.py, the cfg4b scene).
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
    scene_path = "/tmp/bigcbox405.obj"
    packed = 4
    groups = 2
    hs = []
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            scene_path = a.split("=", 1)[1]
        elif a.startswith("--packed="):
            packed = int(a.split("=", 1)[1])
        elif a.startswith("--groups="):
            groups = int(a.split("=", 1)[1])
        else:
            hs.append(int(a))
    hs = hs or [1, 2, 4]
    if not os.path.exists(scene_path) and "bigcbox405" in scene_path:
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_bigscene.py"),
             "3", scene_path],
            check=True,
        )
    print(f"devices: {jax.devices()}, {W}x{H}, P={P}, packed={packed}, "
          f"G={groups}, windows={hs}", file=sys.stderr)
    scene = load_obj_scene(scene_path)
    cs = scene_to_device(compile_scene(scene, packed_leaf=packed))
    print(f"table: {cs.trace_rows_mega.shape} "
          f"({cs.trace_rows_mega.nbytes / 1e6:.0f} MB)", file=sys.stderr)

    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(
            np.uint32
        )
    )

    def run(h):
        t, n, dep, st, ovf, bounces, rows, alb = render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000, packet=P,
            groups=groups, spec=False, table_in_hbm=True, hbm_window=h,
        )
        return float(jnp.sum(t)), float(jnp.sum(rows)) / (8.0 * P)

    sums, iters = {}, {}
    for h in hs:
        t0 = time.monotonic()
        sums[h], iters[h] = run(h)
        print(f"warmup h={h}: {time.monotonic()-t0:.1f}s sum={sums[h]:.2f} "
              f"rounds={iters[h]:.0f}", file=sys.stderr)

    times = {h: [] for h in hs}
    for _ in range(REPS):
        for h in hs:
            t0 = time.monotonic()
            run(h)
            times[h].append(time.monotonic() - t0)

    base = min(times[hs[0]])
    for h in hs:
        t = min(times[h])
        print(f"window={h}: {t*1e3:8.1f} ms  image-sum={sums[h]:10.2f}  "
              f"rounds={iters[h]:9.0f}  speedup vs h={hs[0]}: {base/t:.3f}x")


if __name__ == "__main__":
    main()
