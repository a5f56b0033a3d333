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

    def run(skip):
        out = render_waves(
            cs, px, py, seeds, width=W, height=H,
            packet=P, groups=G, shadow_skip_all=skip,
        )
        return jnp.sum(out[0]), out[6]  # film sum, rows

    runs = {}
    for skip in (False, True):
        s, rows = run(skip)
        runs[skip] = (float(s), float(jnp.sum(rows.astype(jnp.float64))))
        print(f"skip={skip}: sum={runs[skip][0]:.4f} "
              f"rows={runs[skip][1]:.3e}", file=sys.stderr)

    times = {False: [], True: []}
    for rep in range(REPS):
        for skip in (False, True):
            t0 = time.perf_counter()
            s, _ = run(skip)
            float(s)
            times[skip].append(time.perf_counter() - t0)
    t_off = min(times[False])
    t_on = min(times[True])
    print(f"baseline   {t_off*1e3:8.1f} ms  (rows {runs[False][1]:.3e})")
    print(f"skip-all   {t_on*1e3:8.1f} ms  (rows {runs[True][1]:.3e})")
    print(f"upper bound from shadow-walk elimination: {t_off/t_on:.3f}x")


if __name__ == "__main__":
    main()
