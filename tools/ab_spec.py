"""In-process A/B: software-pipelined (spec) walker vs the dual-prefetch
walker (docs/PERF_NOTES.md §9j). Identical estimator — sums must match
bitwise; the only behavioral delta is the any-hit early exit firing one
iteration later in spec mode.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_spec.py [W] [P]
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

REPS = 4


def main():
    W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    packet = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    print(f"devices: {jax.devices()}, {W}x{H}, P={packet}", file=sys.stderr)
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs = scene_to_device(compile_scene(scene))

    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(np.uint32)
    )

    def run(spec):
        t, n, dep, st, ovf, bounces, rows, alb = render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000,
            packet=packet, spec=spec,
        )
        return float(jnp.sum(t)), float(jnp.sum(rows)) / (8.0 * packet)

    sums = {}
    for spec in (False, True):
        t0 = time.monotonic()
        tot, iters = run(spec)
        sums[spec] = tot
        print(
            f"warmup spec={spec}: {time.monotonic()-t0:.1f}s sum={tot:.2f} "
            f"tile-iters={iters:.0f}",
            file=sys.stderr,
        )

    times = {False: [], True: []}
    for rep in range(REPS):
        for spec in (False, True):
            t0 = time.monotonic()
            tot, _ = run(spec)
            dt = time.monotonic() - t0
            times[spec].append(dt)
            assert tot == sums[spec], "sum drifted between reps"
            print(f"rep{rep} spec={spec}: {dt*1e3:.0f} ms", file=sys.stderr)

    base = min(times[False])
    best = min(times[True])
    match = "bitwise-equal sums" if sums[False] == sums[True] else (
        f"SUM MISMATCH {sums[False]} vs {sums[True]}"
    )
    print(f"plain: min {base*1e3:.0f} ms   spec: min {best*1e3:.0f} ms   "
          f"speedup {base/best:.3f}x   ({match})")


if __name__ == "__main__":
    main()
