"""In-process A/B: dedicated any-hit shadow table vs the shared-table
shadow walk (round-4 verdict #1; ops/pallas_megakernel NEE site).

The dedicated table is a single payload-free PACKED3 flattening — occlusion
per lane is the same boolean OR over the same prim set with identical f32
per-prim math, so image sums must match BITWISE; only rows/tile-iters
shrink (sim-priced 1.36-1.59x fewer shadow visits -> ~1.09-1.12x
end-to-end at the measured 31% shadow share; tools/sim_shadow_walk.py).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_shadow_tbl.py \
          [--scene=/path.obj] [--spheres] [W] [P] [G]
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    path = "/root/reference/scenes/cbox/cbox.obj"
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            path = a.split("=", 1)[1]
    W = H = int(args[0]) if len(args) > 0 else 512
    packet = int(args[1]) if len(args) > 1 else 1024
    groups = int(args[2]) if len(args) > 2 else 4
    print(f"devices: {jax.devices()}, {W}x{H}, P={packet}, G={groups}",
          file=sys.stderr)
    scene = load_obj_scene(path)
    if "cbox.obj" in path or "--spheres" in sys.argv:
        scene.put_cbox_spheres()
    cs = scene_to_device(compile_scene(scene))
    assert cs.shadow_rows_mega is not None, "scene compiled no shadow table"
    print(
        f"main table {tuple(cs.trace_rows_mega.shape)} "
        f"shadow table {tuple(cs.shadow_rows_mega.shape)}", file=sys.stderr
    )

    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(np.uint32)
    )

    def run(stbl):
        t, n, dep, st, ovf, bounces, rows, alb = render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000,
            packet=packet, groups=groups, shadow_tbl=stbl,
        )
        return float(jnp.sum(t)), float(jnp.sum(rows)) / (8.0 * packet)

    sums, iters = {}, {}
    for stbl in (False, True):
        t0 = time.monotonic()
        tot, it = run(stbl)
        sums[stbl], iters[stbl] = tot, it
        print(
            f"warmup shadow_tbl={stbl}: {time.monotonic()-t0:.1f}s "
            f"sum={tot:.2f} tile-iters={it:.0f}",
            file=sys.stderr,
        )

    times = {False: [], True: []}
    for rep in range(REPS):
        for stbl in (False, True):
            t0 = time.monotonic()
            tot, _ = run(stbl)
            dt = time.monotonic() - t0
            times[stbl].append(dt)
            assert tot == sums[stbl], "sum drifted between reps"
            print(f"rep{rep} shadow_tbl={stbl}: {dt*1e3:.0f} ms",
                  file=sys.stderr)

    base = min(times[False])
    best = min(times[True])
    match = "bitwise-equal sums" if sums[False] == sums[True] else (
        f"SUM MISMATCH {sums[False]} vs {sums[True]}"
    )
    print(
        f"shared-table: min {base*1e3:.0f} ms ({iters[False]:.0f} iters)   "
        f"shadow-table: min {best*1e3:.0f} ms ({iters[True]:.0f} iters)   "
        f"speedup {base/best:.3f}x   iters {iters[False]/iters[True]:.3f}x   "
        f"({match})"
    )


if __name__ == "__main__":
    main()
