"""In-process A/B: chained multi-sweep launch (render_waves_chained) vs S
separate render_waves launches (docs/PERF_NOTES.md §9o).

Chaining respawns a dead path's lane onto the same pixel's next sweep
sample inside the kernel (phase-0 occupancy) and replaces S launches +
host gaps with one. Estimator-exact: per-sweep sums must match the
separate launches (t-tie class at most).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_chain.py \
           [W] [S] [cap1,cap2,...] [--scene=/path.obj] [--hbm] [--pl=N] [--groups=N]

--hbm streams the trace table from HBM in both arms (the renderer's
big-scene mode; chaining there was mechanically supported but unmeasured —
resolve_chain_sweeps keeps auto off pending this A/B) and defaults groups
to the HBM auto (G=2)."""

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
    render_waves_chained,
)
from hijiki_tpu.scene.compile import compile_scene, scene_to_device
from hijiki_tpu.scene.obj import load_obj_scene

REPS = 4
P = MEGA_PACKET_TPU
G = MEGA_GROUPS_TPU


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    W = H = int(pos[0]) if len(pos) > 0 else 512
    S = int(pos[1]) if len(pos) > 1 else 4
    caps = [int(c) for c in pos[2].split(",")] if len(pos) > 2 else [16]
    scene_path = "/root/reference/scenes/cbox/cbox.obj"
    hbm = False
    pl = 0
    groups = None
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            scene_path = a.split("=", 1)[1]
        elif a == "--hbm":
            hbm = True
        elif a.startswith("--pl="):
            pl = int(a.split("=", 1)[1])
        elif a.startswith("--groups="):
            groups = int(a.split("=", 1)[1])
    global G
    if groups is not None:
        G = groups
    elif hbm:
        G = 2  # the HBM auto (renderer.resolve_mega_groups)
    print(f"devices: {jax.devices()}, {W}x{H}, S={S}, P={P}, G={G}, "
          f"hbm={hbm}, pl={pl}, scene={scene_path}",
          file=sys.stderr)
    scene = load_obj_scene(scene_path)
    if scene_path.endswith("cbox.obj"):
        scene.put_cbox_spheres()
    cs = scene_to_device(compile_scene(scene, packed_leaf=pl))
    print(f"tbl_rows={cs.mega_tbl_rows} packed={cs.mega_packed_static} "
          f"bytes={np.asarray(cs.trace_rows_mega).nbytes / 1e6:.1f} MB",
          file=sys.stderr)

    N = W * H
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:H, 0:W]
    pxs, pys, seeds = [], [], []
    for s in range(S):
        ox, oy = rng.random(2, dtype=np.float32)
        pxs.append((x + ox).ravel().astype(np.float32))
        pys.append((y + oy).ravel().astype(np.float32))
        seeds.append(
            ((np.arange(N) * 2654435761 + s * 977) % (1 << 32)).astype(np.uint32)
        )
    pxs = jnp.asarray(np.stack(pxs))
    pys = jnp.asarray(np.stack(pys))
    seeds = jnp.asarray(np.stack(seeds))

    def run_separate():
        tot = 0.0
        for s in range(S):
            t, *_ = render_waves(
                cs, pxs[s], pys[s], seeds[s], width=W, height=H,
                max_bounces=1000, packet=P, groups=G, table_in_hbm=hbm,
            )
            tot += float(jnp.sum(t))
        return tot

    def run_chained(cap):
        out = render_waves_chained(
            cs, pxs, pys, seeds, width=W, height=H, max_bounces=1000,
            chain_cap=cap, packet=P, groups=G, table_in_hbm=hbm,
        )
        return float(jnp.sum(out[0])), int(out[4])

    t0 = time.monotonic()
    base_sum = run_separate()
    print(f"warmup separate: {time.monotonic()-t0:.1f}s sum={base_sum:.2f}",
          file=sys.stderr)
    for cap in caps:
        t0 = time.monotonic()
        cs_sum, ovf = run_chained(cap)
        print(
            f"warmup chained cap={cap}: {time.monotonic()-t0:.1f}s "
            f"sum={cs_sum:.2f} ovf={ovf} "
            f"(delta {abs(cs_sum-base_sum):.4f})",
            file=sys.stderr,
        )

    variants = ["sep"] + [f"cap{c}" for c in caps]
    times = {v: [] for v in variants}
    for rep in range(REPS):
        for v in variants:
            t0 = time.monotonic()
            if v == "sep":
                run_separate()
            else:
                run_chained(int(v[3:]))
            times[v].append(time.monotonic() - t0)
            print(f"rep{rep} {v}: {times[v][-1]*1e3:.0f} ms", file=sys.stderr)

    base = min(times["sep"])
    for v in variants:
        print(f"{v}: min {min(times[v])*1e3:.0f} ms  speedup "
              f"{base/min(times[v]):.3f}x")


if __name__ == "__main__":
    main()
