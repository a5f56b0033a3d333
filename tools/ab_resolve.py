"""In-process A/B: pipelined winner-resolve loop (spec_resolve) vs the sync
min->fetch->select loop (ops/pallas_megakernel._resolve_winners). The visit
order and selects are identical, so sums must match bitwise.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_resolve.py \
          [--hbm] [--scene=/path.obj] [W] [P] [G] [packed_leaf]
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
    hbm = "--hbm" in sys.argv
    path = "/root/reference/scenes/cbox/cbox.obj"
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            path = a.split("=", 1)[1]
    W = H = int(args[0]) if len(args) > 0 else 512
    packet = int(args[1]) if len(args) > 1 else 1024
    groups = int(args[2]) if len(args) > 2 else 4
    leaf = int(args[3]) if len(args) > 3 else 0
    print(f"devices: {jax.devices()}, {W}x{H}, P={packet}, G={groups}, "
          f"packed_leaf={leaf}, hbm={hbm}", file=sys.stderr)
    scene = load_obj_scene(path)
    if "cbox.obj" in path:
        scene.put_cbox_spheres()
    cs = scene_to_device(compile_scene(scene, packed_leaf=leaf))

    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(np.uint32)
    )

    def run(sr):
        t, n, dep, st, ovf, bounces, rows, alb = render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000,
            packet=packet, groups=groups, spec_resolve=sr,
            table_in_hbm=hbm,
        )
        return float(jnp.sum(t)), float(jnp.sum(rows)) / (8.0 * packet)

    sums = {}
    for sr in (False, True):
        t0 = time.monotonic()
        tot, iters = run(sr)
        sums[sr] = tot
        print(
            f"warmup spec_resolve={sr}: {time.monotonic()-t0:.1f}s "
            f"sum={tot:.2f} tile-iters={iters:.0f}",
            file=sys.stderr,
        )

    times = {False: [], True: []}
    for rep in range(REPS):
        for sr in (False, True):
            t0 = time.monotonic()
            tot, _ = run(sr)
            dt = time.monotonic() - t0
            times[sr].append(dt)
            assert tot == sums[sr], "sum drifted between reps"
            print(f"rep{rep} spec_resolve={sr}: {dt*1e3:.0f} ms", file=sys.stderr)

    base = min(times[False])
    best = min(times[True])
    match = "bitwise-equal sums" if sums[False] == sums[True] else (
        f"SUM MISMATCH {sums[False]} vs {sums[True]}"
    )
    print(f"sync-resolve: min {base*1e3:.0f} ms   pipelined: min "
          f"{best*1e3:.0f} ms   speedup {base/best:.3f}x   ({match})")


if __name__ == "__main__":
    main()
