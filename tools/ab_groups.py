"""In-process A/B: grouped spec walker (G independent cursor groups per
tile) vs the single-group spec walker (docs/PERF_NOTES.md §9d/§9j).

The packet-union tax scales with lanes-per-cursor while the VPU issue count
scales with total lanes; G groups of P/G lanes keep the issue count but walk
G smaller unions. Estimator-preserving: per-lane accepts are unchanged, so
sums differ at most in t-tie winners (usually bitwise-equal).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_groups.py \
           [W] [P] [G1,G2,...] [--packed=N]
Variants: plain ints use per-group octant voting; suffix "n" (e.g. "4n")
keeps the full-tile octant vote (isolates the voting change).
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
    packed = 0
    pos = []
    for a in sys.argv[1:]:
        if a.startswith("--packed="):
            packed = int(a.split("=", 1)[1])  # G-retune at a packed format
        else:
            pos.append(a)
    W = H = int(pos[0]) if len(pos) > 0 else 512
    packet = int(pos[1]) if len(pos) > 1 else 1024
    variants = pos[2].split(",") if len(pos) > 2 else ["1", "2", "4", "8"]
    print(
        f"devices: {jax.devices()}, {W}x{H}, P={packet}, groups={variants}, "
        f"packed_leaf={packed}",
        file=sys.stderr,
    )
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs = scene_to_device(compile_scene(scene, packed_leaf=packed))

    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(np.uint32)
    )

    def run(g):
        goct = not g.endswith("n")
        t, n, dep, st, ovf, bounces, rows, alb = render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000,
            packet=packet, groups=int(g.rstrip("n")), group_octant=goct,
        )
        # rows counts WALK ITERATIONS per tile (each iteration processes one
        # row per cursor group, so iters != row visits when g > 1)
        return float(jnp.sum(t)), float(jnp.sum(rows)) / (8.0 * packet)

    sums = {}
    iters = {}
    for g in variants:
        t0 = time.monotonic()
        tot, it = run(g)
        sums[g], iters[g] = tot, it
        print(
            f"warmup groups={g}: {time.monotonic()-t0:.1f}s sum={tot:.2f} "
            f"tile-iters={it:.0f}",
            file=sys.stderr,
        )

    times = {g: [] for g in variants}
    for rep in range(REPS):
        for g in variants:
            t0 = time.monotonic()
            tot, _ = run(g)
            dt = time.monotonic() - t0
            times[g].append(dt)
            assert tot == sums[g], "sum drifted between reps"
            print(f"rep{rep} groups={g}: {dt*1e3:.0f} ms", file=sys.stderr)

    base = min(times[variants[0]])
    for g in variants:
        best = min(times[g])
        match = (
            "bitwise-equal sums"
            if sums[g] == sums[variants[0]]
            else f"sum {sums[g]:.4f} vs {sums[variants[0]]:.4f} (t-tie class)"
        )
        print(
            f"groups={g}: min {best*1e3:.0f} ms  speedup {base/best:.3f}x  "
            f"tile-iters {iters[g]:.0f}  ({match})"
        )


if __name__ == "__main__":
    main()
