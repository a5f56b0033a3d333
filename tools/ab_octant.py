"""In-process A/B: single area-ordered mega table vs 8 octant-ordered tables.

Measures render_waves wall time and rows-visited on cbox(+spheres) at 512^2,
alternating variants in one process (docs/PERF_NOTES.md #8: cross-process
timings drift 1.5-2x; within-process alternation is stable to ~2%).
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

from hijiki_tpu.ops.pallas_megakernel import MEGA_PACKET_TPU, render_waves
from hijiki_tpu.scene.compile import compile_scene, scene_to_device
from hijiki_tpu.scene.obj import load_obj_scene

W = H = 512
REPS = 4


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()

    variants = {}
    for name, mode in [("single", "never"), ("octant", "always")]:
        cs = compile_scene(scene, octant_tables=mode)
        print(
            f"{name}: ntab={cs.mega_num_tables_static} rows={cs.trace_rows_mega.shape[0]}"
            f" ({cs.trace_rows_mega.nbytes >> 20} MB)",
            file=sys.stderr,
        )
        variants[name] = scene_to_device(cs)

    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(np.uint32)
    )

    def run(cs):
        t, n, dep, st, ovf, bounces, rows, alb = render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000,
            packet=MEGA_PACKET_TPU,
        )
        tot = float(jnp.sum(t))  # host materialization = sync
        return tot, float(jnp.sum(rows)) / (8.0 * MEGA_PACKET_TPU)

    for name, cs in variants.items():
        t0 = time.monotonic()
        tot, rows = run(cs)
        print(
            f"warmup {name}: {time.monotonic()-t0:.1f}s sum={tot:.1f} rows={rows:.0f}",
            file=sys.stderr,
        )

    times = {k: [] for k in variants}
    rows_seen = {}
    for rep in range(REPS):
        for name, cs in variants.items():
            t0 = time.monotonic()
            tot, rows = run(cs)
            dt = time.monotonic() - t0
            times[name].append(dt)
            rows_seen[name] = rows
            print(f"rep{rep} {name}: {dt*1e3:.0f} ms rows={rows:.0f}", file=sys.stderr)

    for name in variants:
        ts = times[name]
        print(
            f"{name}: min {min(ts)*1e3:.0f} ms  mean {np.mean(ts)*1e3:.0f} ms  "
            f"rows {rows_seen[name]:.0f}"
        )
    print(f"speedup (min/min): {min(times['single'])/min(times['octant']):.3f}x")
    print(
        f"row-visit ratio: {rows_seen['octant']/max(rows_seen['single'],1):.3f}"
    )


if __name__ == "__main__":
    main()
