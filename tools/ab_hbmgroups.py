"""In-process A/B of the grouped DMA-pipelined HBM walker (G cursor groups).

The single-cursor HBM walk (PERF_NOTES §9s: 649 ms/sweep on 405k-tri
bigcbox = ~1 µs/iteration vs 333 ns in VMEM) hides each row copy behind one
group's primitive test only — it is DMA-latency-bound. _traverse_hbm_grouped
gives each of G groups its own scratch slot + in-flight copy, so every copy
has the other groups' math to land under, and per-group unions shrink as in
the VMEM grouped walker (§9m). This measures wall time + tile iterations
across G, round-robin per rep (mandatory: block timing drifts 1.5-2x).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_hbmgroups.py \
           [--scene=/tmp/bigcbox.obj] [--packed=12] [groups...]
       default groups: 1 2 4; scene defaults to the 405k-tri bigcbox
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
    gs = []
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            scene_path = a.split("=", 1)[1]
        elif a.startswith("--packed="):
            packed = int(a.split("=", 1)[1])
        else:
            gs.append(int(a))
    gs = gs or [1, 2, 4]
    if not os.path.exists(scene_path) and scene_path == "/tmp/bigcbox.obj":
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_bigscene.py"),
             "2", scene_path],
            check=True,
        )
    print(f"devices: {jax.devices()}, {W}x{H}, P={P}, packed={packed}, "
          f"groups={gs}", file=sys.stderr)
    scene = load_obj_scene(scene_path)
    cs = scene_to_device(compile_scene(scene, packed_leaf=packed))
    print(f"table: {cs.trace_rows_mega.shape} "
          f"({cs.trace_rows_mega.nbytes / 1e6:.0f} MB), "
          f"packed={cs.mega_packed_static}", file=sys.stderr)

    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(
            np.uint32
        )
    )

    def run(g):
        t, n, dep, st, ovf, bounces, rows, alb = render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000, packet=P,
            groups=g, spec=False, table_in_hbm=True,
        )
        return float(jnp.sum(t)), float(jnp.sum(rows)) / (8.0 * P)

    sums, iters = {}, {}
    for g in gs:
        t0 = time.monotonic()
        sums[g], iters[g] = run(g)
        print(f"warmup G={g}: {time.monotonic()-t0:.1f}s sum={sums[g]:.2f} "
              f"tile-iters={iters[g]:.0f}", file=sys.stderr)

    times = {g: [] for g in gs}
    for _ in range(REPS):
        for g in gs:
            t0 = time.monotonic()
            run(g)
            times[g].append(time.monotonic() - t0)

    base = min(times[gs[0]])
    for g in gs:
        t = min(times[g])
        print(f"groups={g}: {t*1e3:8.1f} ms  image-sum={sums[g]:10.2f}  "
              f"tile-iters={iters[g]:9.0f}  speedup vs G={gs[0]}: {base/t:.3f}x")


if __name__ == "__main__":
    main()
