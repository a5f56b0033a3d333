"""In-process A/B of packed leaf rows (scene.compile.build_packed_trace_rows).

A packed row tests PACKED_N=4 triangles in ONE walker iteration (one slab
vote + cursor decision + fetch amortized over 4 prims) instead of 4
iterations of 1. The visit-count simulation (PERF_NOTES §9s) predicted
1.245x on camera rays / 1.137x on incoherent bounces at leaf_size=4 —
while UNPACKED leaf_size=4 measured a loss (each extra prim paid a full
iteration). Estimator: identical prim set; t-tie winners can differ from
the leaf-1 tree (tree shape changes visit order); at EQUAL tree
(packed_leaf=N vs leaf_size=N unpacked) images are bitwise identical
(tests/test_megakernel.py).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_packedleaf.py \
           [sizes...] [--scene=path.obj] [--hbm]
       sizes: 0 = unpacked leaf-1 baseline; N>0 = packed with leaf_size N
       (N==1: 16-wide SLIM rows; N in 2-3: 32-wide PACKED3 rows; N==4:
       64-wide rows; N>=5: 128-wide 12-prim rows). --scene picks the OBJ (default cbox+spheres);
       --hbm forces HBM table streaming (the PACKED12 target mode —
       pass with a big scene, e.g. /tmp/bigcbox.obj from make_bigscene.py).
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

W = H = 512
P = MEGA_PACKET_TPU
G = MEGA_GROUPS_TPU
REPS = 5


def main():
    args = sys.argv[1:]
    scene_path = "/root/reference/scenes/cbox/cbox.obj"
    hbm = False
    sizes = []
    groups_override = None
    for a in args:
        if a.startswith("--scene="):
            scene_path = a.split("=", 1)[1]
        elif a == "--hbm":
            hbm = True
        elif a.startswith("--groups="):
            groups_override = int(a.split("=", 1)[1])
        else:
            sizes.append(int(a))
    sizes = sizes or [0, 1, 3, 4]
    # HBM default: single cursor (the measured baseline); --groups=N tests
    # the grouped DMA pipeline (G overlapped row copies)
    groups = groups_override if groups_override else (1 if hbm else G)
    print(
        f"devices: {jax.devices()}, {W}x{H}, P={P}, G={groups}, hbm={hbm}, "
        f"scene={scene_path}",
        file=sys.stderr,
    )
    scene = load_obj_scene(scene_path)
    if scene_path.endswith("cbox.obj"):
        scene.put_cbox_spheres()
    compiled = {}
    for pl in sizes:
        cs = scene_to_device(compile_scene(scene, packed_leaf=pl))
        compiled[pl] = cs
        print(
            f"packed_leaf={pl}: packed={cs.mega_packed_static} "
            f"rows={cs.trace_rows_mega.shape} tbl={cs.mega_tbl_rows} "
            f"pay={cs.mega_pay_rows_static}",
            file=sys.stderr,
        )

    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(
            np.uint32
        )
    )

    def run(cs):
        t, n, dep, st, ovf, bounces, rows, alb = render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000, packet=P,
            groups=groups, spec=not hbm, table_in_hbm=hbm,
        )
        return float(jnp.sum(t)), float(jnp.sum(rows)) / (8.0 * P)

    iters = {}
    sums = {}
    for pl, cs in compiled.items():
        t0 = time.monotonic()
        sums[pl], iters[pl] = run(cs)
        print(
            f"warmup pl={pl}: {time.monotonic()-t0:.1f}s sum={sums[pl]:.2f} "
            f"tile-iters={iters[pl]:.0f}",
            file=sys.stderr,
        )

    times = {pl: [] for pl in sizes}
    for _ in range(REPS):
        for pl, cs in compiled.items():
            t0 = time.monotonic()
            run(cs)
            times[pl].append(time.monotonic() - t0)

    base = min(times[sizes[0]])
    for pl in sizes:
        t = min(times[pl])
        print(
            f"packed_leaf={pl}: {t*1e3:8.1f} ms  image-sum={sums[pl]:10.2f}  "
            f"tile-iters={iters[pl]:9.0f}  speedup vs {sizes[0]}: {base/t:.3f}x"
        )


if __name__ == "__main__":
    main()
