"""In-process A/B at the production packet width: octant tables on/off and
wavefront phase-schedule variants (cbox+spheres, 512^2, full trace)."""

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
REPS = 3
P = MEGA_PACKET_TPU


def main():
    print(f"devices: {jax.devices()} packet={P}", file=sys.stderr)
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs_oct = scene_to_device(compile_scene(scene))
    cs_one = scene_to_device(compile_scene(scene, octant_tables="never"))

    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(np.uint32)
    )

    import os
    G = int(os.environ.get("AB_GROUPS", "4"))
    variants = {
        "oct,phases=5-12-48": (cs_oct, (5, 12, 48), (2, 4, 4)),
        "one,phases=5-12-48": (cs_one, (5, 12, 48), (2, 4, 4)),
        "oct,phases=4-10-30": (cs_oct, (4, 10, 30), (2, 4, 4)),
        "oct,phases=3-8-20-48": (cs_oct, (3, 8, 20, 48), (2, 2, 4, 4)),
        "oct,phases=2-5-12-48": (cs_oct, (2, 5, 12, 48), (2, 2, 4, 4)),
        "oct,shrink=4-4-4": (cs_oct, (5, 12, 48), (4, 4, 4)),
    }

    def run(cs, pb, ps):
        t, *_ = render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000,
            phase_bounces=pb, phase_shrink=ps, packet=P, groups=G,
        )
        return float(jnp.sum(t))

    for name, (cs, pb, ps) in variants.items():
        t0 = time.monotonic()
        s = run(cs, pb, ps)
        print(f"warmup {name}: {time.monotonic()-t0:.1f}s sum={s:.1f}", file=sys.stderr)

    times = {k: [] for k in variants}
    for rep in range(REPS):
        for name, (cs, pb, ps) in variants.items():
            t0 = time.monotonic()
            s = run(cs, pb, ps)
            times[name].append(time.monotonic() - t0)
            print(f"rep{rep} {name}: {times[name][-1]*1e3:.0f} ms sum={s:.1f}",
                  file=sys.stderr)

    base = min(times["oct,phases=5-12-48"])
    for name in variants:
        ts = times[name]
        print(f"{name}: min {min(ts)*1e3:.0f} ms  vs-base {base/min(ts):.3f}x")


if __name__ == "__main__":
    main()
