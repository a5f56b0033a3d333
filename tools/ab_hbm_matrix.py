"""In-process matrix A/B of the HBM-streamed walk: trace-row format x
grouped-DMA cursor groups, on ONE scene, round-robin timed.

Round 2 measured PACKED4 1.091x and G=2 1.183x on the 101k-tri bigcbox and
the autos extrapolated both to every HBM scene (ADVICE r2 flagged the
extrapolation). The 405k-tri re-measure (round 3) came back 0.62x vs the
classic/G1 round-2 number, so this tool measures the full matrix on the
actual cfg4b scene instead of extrapolating: every (format, groups) cell in
one process, REPS round-robin, compare minima (PERF_NOTES §8).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_hbm_matrix.py \
           [--scene=/tmp/bigcbox3.obj] [--formats=0,4] [--groups=1,2] \
           [--reps=4] [--side=512]
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


def main():
    scene_path = "/tmp/bigcbox3.obj"
    formats = [0, 4]
    groups_list = [1, 2]
    specs = [0]
    reps = 4
    side = 512
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            scene_path = a.split("=", 1)[1]
        elif a.startswith("--formats="):
            formats = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--groups="):
            groups_list = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--spec="):
            specs = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--side="):
            side = int(a.split("=", 1)[1])
    W = H = side
    P = MEGA_PACKET_TPU
    print(
        f"devices: {jax.devices()}, {W}x{H}, P={P}, formats={formats}, "
        f"groups={groups_list}, scene={scene_path}",
        file=sys.stderr,
    )

    scene = load_obj_scene(scene_path)
    if scene_path.endswith("cbox.obj"):
        scene.put_cbox_spheres()
    compiled = {}
    for pl in formats:
        cs = scene_to_device(compile_scene(scene, packed_leaf=pl))
        compiled[pl] = cs
        print(
            f"packed_leaf={pl}: packed={cs.mega_packed_static} "
            f"tbl_rows={cs.mega_tbl_rows} pay={cs.mega_pay_rows_static} "
            f"bytes={np.asarray(cs.trace_rows_mega).nbytes/1e6:.1f} MB",
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

    def run(cs, g, sp):
        t, n, dep, st, ovf, bounces, rows, alb = render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000, packet=P,
            groups=g, spec=bool(sp), table_in_hbm=True,
        )
        return float(jnp.sum(t)), float(jnp.sum(rows)) / (8.0 * P)

    cells = [(pl, g, sp) for pl in formats for g in groups_list for sp in specs]
    sums, iters = {}, {}
    for pl, g, sp in cells:
        t0 = time.monotonic()
        sums[(pl, g, sp)], iters[(pl, g, sp)] = run(compiled[pl], g, sp)
        print(
            f"warmup pl={pl} G={g} spec={sp}: {time.monotonic()-t0:.1f}s "
            f"sum={sums[(pl, g, sp)]:.2f} tile-iters={iters[(pl, g, sp)]:.0f}",
            file=sys.stderr,
            flush=True,
        )

    times = {c: [] for c in cells}
    for rep in range(reps):
        for c in cells:
            pl, g, sp = c
            t0 = time.monotonic()
            run(compiled[pl], g, sp)
            times[c].append(time.monotonic() - t0)
        print(f"rep {rep + 1}/{reps} done", file=sys.stderr, flush=True)

    base = min(times[cells[0]])
    rays = W * H
    for c in cells:
        pl, g, sp = c
        t = min(times[c])
        print(
            f"pl={pl} G={g} spec={sp}: {t*1e3:8.1f} ms  {rays/t/1e6:6.3f} "
            f"Mrays/s  image-sum={sums[c]:10.2f}  tile-iters={iters[c]:9.0f}  "
            f"vs {cells[0]}: {base/t:.3f}x"
        )


if __name__ == "__main__":
    main()
