"""In-process A/B of BVH leaf sizes for the megakernel trace table.

Interior rows and primitive rows cost the same per visit (~333 ns at
P=1024, PERF_NOTES §9j), and a PACKET's union enter-probability for a small
subtree is much higher than a single ray's — so collapsing 2-4 prim
subtrees into leaf runs (fewer interior rows, unconditionally-tested prim
rows) may cut total visits. Estimator unchanged (same prims tested within
reordered walks; t-tie winners can differ).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_leaf.py [sizes...]
"""

import sys
import time

import numpy as np

from hijiki_tpu.utils.tpuenv import configure_tpu_env

configure_tpu_env()
from hijiki_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from hijiki_tpu.ops.pallas_megakernel import render_waves
from hijiki_tpu.scene.compile import compile_scene, scene_to_device
from hijiki_tpu.scene.obj import load_obj_scene

W = H = 512
PACKET = 1024
REPS = 3


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    compiled = {}
    for ls in sizes:
        cs = scene_to_device(compile_scene(scene, leaf_size=ls))
        compiled[ls] = cs
        print(
            f"leaf_size={ls}: {cs.trace_rows_mega.shape[0]} table rows",
            file=sys.stderr,
        )

    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(np.uint32)
    )

    def run(cs):
        t, n, dep, st, ovf, bounces, rows, alb = render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000, packet=PACKET
        )
        return float(jnp.sum(t)), float(jnp.sum(rows)) / (8.0 * PACKET)

    iters = {}
    sums = {}
    for ls, cs in compiled.items():
        t0 = time.monotonic()
        sums[ls], iters[ls] = run(cs)
        print(
            f"warmup ls={ls}: {time.monotonic()-t0:.1f}s sum={sums[ls]:.2f} "
            f"tile-iters={iters[ls]:.0f}",
            file=sys.stderr,
        )

    times = {ls: [] for ls in sizes}
    for rep in range(REPS):
        for ls, cs in compiled.items():
            t0 = time.monotonic()
            run(cs)
            times[ls].append(time.monotonic() - t0)
            print(f"rep{rep} ls={ls}: {times[ls][-1]*1e3:.0f} ms", file=sys.stderr)

    base = min(times[sizes[0]])
    for ls in sizes:
        print(
            f"leaf_size={ls}: min {min(times[ls])*1e3:.0f} ms  "
            f"tile-iters {iters[ls]:.0f}  speedup {base/min(times[ls]):.3f}x  "
            f"sum {sums[ls]:.2f}"
        )


if __name__ == "__main__":
    main()
