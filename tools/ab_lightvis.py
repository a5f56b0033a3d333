"""In-process A/B: shadow-walk skip upper bound (scene/lightvis.py gate).

Alternates render_waves with shadow_skip_all off/on. The skip-all image is
BIASED (every NEE shadow ray treated as unoccluded) — this is a perf probe
only: it bounds what any shadow-visibility shortcut (proven-cell grid,
occlusion prediction, ...) could ever save, since such a shortcut can at
best eliminate the whole shadow walk.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_lightvis.py [W]
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

from hijiki_tpu.ops.pallas_megakernel import (
    MEGA_GROUPS_TPU,
    MEGA_PACKET_TPU,
    render_waves,
)
from hijiki_tpu.scene.compile import compile_scene, scene_to_device
from hijiki_tpu.scene.obj import load_obj_scene

REPS = 5
P = MEGA_PACKET_TPU
G = MEGA_GROUPS_TPU


def main():
    W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    print(f"devices: {jax.devices()}, {W}x{H}, P={P}, G={G}", file=sys.stderr)
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs = scene_to_device(compile_scene(scene))

    N = W * H
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:H, 0:W]
    ox, oy = rng.random(2, dtype=np.float32)
    px = jnp.asarray((x + ox).ravel(), jnp.float32)
    py = jnp.asarray((y + oy).ravel(), jnp.float32)
    seeds = jnp.asarray(
        rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32)
    )

    def run(variant):
        out = render_waves(
            cs, px, py, seeds, width=W, height=H, packet=P, groups=G,
            shadow_vis=(variant == "boxes"),
            shadow_skip_all=(variant == "skipall"),
        )
        return jnp.sum(out[0]), out[6]  # film sum, rows

    variants = ("off", "boxes", "skipall")
    runs = {}
    for v in variants:
        s, rows = run(v)
        runs[v] = (float(s), float(jnp.sum(rows.astype(jnp.float64))))
        print(f"{v}: sum={runs[v][0]:.4f} rows={runs[v][1]:.3e}",
              file=sys.stderr)
    if runs["boxes"][0] != runs["off"][0]:
        print("WARNING: shadow-vis film sum differs from baseline!")

    times = {v: [] for v in variants}
    for rep in range(REPS):
        for v in variants:
            t0 = time.perf_counter()
            s, _ = run(v)
            float(s)
            times[v].append(time.perf_counter() - t0)
    t_off = min(times["off"])
    for v in variants:
        t = min(times[v])
        print(f"{v:8s} {t*1e3:8.1f} ms  (rows {runs[v][1]:.3e})"
              f"  {t_off/t:.3f}x")


if __name__ == "__main__":
    main()
