"""Cross-sweep tile coherence A/B (ROADMAP round-2 lever; VERDICT #4).

Hypothesis: grouping PIXELS whose previous-sweep paths hit nearby geometry
into the same packet shrinks per-packet row unions on the post-camera
bounces (origins cluster), beating raster order. The permutation is pure
lane assignment — every pixel keeps its own seed and jitter, so the
estimator is untouched and per-pixel results are bitwise identical (modulo
which tile a pixel rides in, which only changes t-tie winners).

Protocol (in-process, PERF_NOTES §8): sweep 0 renders in raster order and
yields per-pixel first-hit depth/normal; sweep 1 is rendered twice — raster
vs permuted by quantized first-hit position (Morton-ish cell key, misses
last) — alternating REPS times. Reported: wall time and rows-visited (the
timing-independent traversal-work metric).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_coherence.py [W] [P]
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
from hijiki_tpu.render.blocks import BlockScheduler, per_pixel_seeds
from hijiki_tpu.scene.compile import compile_scene, scene_to_device
from hijiki_tpu.scene.obj import load_obj_scene

REPS = 3


def hit_cell_key(o, d, depth, bbox, grid=32):
    """Quantized first-hit-position key; misses (depth==0) sort last."""
    p = o + depth[:, None] * d
    lo = np.asarray(bbox[:3], np.float32)
    span = np.maximum(np.asarray(bbox[3:], np.float32) - lo, 1e-6)
    q = np.clip(((p - lo) / span * grid).astype(np.int64), 0, grid - 1)
    key = q[:, 0] + grid * (q[:, 1] + grid * q[:, 2])
    return np.where(depth > 0, key, np.int64(grid**3 + 1))


def main():
    W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    packet = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    print(f"devices: {jax.devices()}, {W}x{H}, P={packet}", file=sys.stderr)
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs = scene_to_device(compile_scene(scene))
    bbox = cs.bbox_static

    sched = BlockScheduler(W, H, 128, 0)
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)

    def sweep_inputs(sweep):
        s = sched.sweep(sweep)
        seeds = per_pixel_seeds(W, H, 128, s.block_seeds)
        offx, offy = s.sample_offset
        return (
            (x + offx).reshape(-1).astype(np.float32),
            (y + offy).reshape(-1).astype(np.float32),
            np.asarray(seeds).reshape(-1),
        )

    def run(px, py, seeds):
        t, n, dep, st, ovf, bounces, rows, alb = render_waves(
            cs,
            jnp.asarray(px),
            jnp.asarray(py),
            jnp.asarray(seeds),
            width=W,
            height=H,
            max_bounces=1000,
            packet=packet,
        )
        return (
            np.asarray(t),
            np.asarray(dep),
            float(jnp.sum(rows)) / (8.0 * packet),
        )

    def host_camera_dirs(px, py):
        """Vectorized host twin of the megakernel's baked camera raygen
        (approximate f32 is fine — only feeds the coherence key)."""
        import math

        cx, cy, cz, qx, qy, qz, qw, fov = cs.camera_static
        R = np.array(
            [
                [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
                [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
                [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
            ],
            np.float32,
        )
        scale = math.tan(math.radians(0.5 * fov)) / (0.5 * W)
        local = np.stack(
            [
                (px - 0.5 * W) * scale,
                -(py - 0.5 * H) * scale,
                -np.ones_like(px),
            ],
            axis=-1,
        ).astype(np.float32)
        d = local @ R.T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(np.array([cx, cy, cz], np.float32), d.shape)
        return o, d

    # sweep 0 (raster) -> first-hit stats
    px0, py0, seeds0 = sweep_inputs(0)
    t0_, dep0, iters0 = run(px0, py0, seeds0)
    print(f"sweep0 raster: tile-iters {iters0:.0f}", file=sys.stderr)

    o_rays, d_rays = host_camera_dirs(px0, py0)
    key = hit_cell_key(o_rays, d_rays, dep0, bbox)
    perm = np.argsort(key, kind="stable")
    print(
        f"distinct cells: {len(np.unique(key))}, misses: {int((dep0 == 0).sum())}",
        file=sys.stderr,
    )

    # sweep 1 inputs, raster and permuted
    px1, py1, seeds1 = sweep_inputs(1)
    inputs = {
        "raster": (px1, py1, seeds1),
        "permuted": (px1[perm], py1[perm], seeds1[perm]),
    }

    # warmup both (same shapes -> same binary; first call pays compile)
    sums = {}
    iters = {}
    for name, (a, b, c) in inputs.items():
        t, dep, it = run(a, b, c)
        sums[name] = float(t.sum())
        iters[name] = it
        print(f"warmup {name}: tile-iters {it:.0f} sum {sums[name]:.2f}",
              file=sys.stderr)

    times = {n: [] for n in inputs}
    for rep in range(REPS):
        for name, (a, b, c) in inputs.items():
            t0 = time.monotonic()
            run(a, b, c)
            times[name].append(time.monotonic() - t0)
            print(f"rep{rep} {name}: {times[name][-1]*1e3:.0f} ms", file=sys.stderr)

    base = min(times["raster"])
    best = min(times["permuted"])
    dsum = abs(sums["raster"] - sums["permuted"]) / max(abs(sums["raster"]), 1e-9)
    print(
        f"raster:   min {base*1e3:.0f} ms  tile-iters {iters['raster']:.0f}\n"
        f"permuted: min {best*1e3:.0f} ms  tile-iters {iters['permuted']:.0f}\n"
        f"speedup {base/best:.3f}x  iters ratio "
        f"{iters['permuted']/iters['raster']:.3f}  rel sum delta {dsum:.2e} "
        f"(t-tie winners only)"
    )


if __name__ == "__main__":
    main()
