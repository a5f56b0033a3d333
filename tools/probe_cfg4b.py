"""Instrumented cfg4b reproduction: renders the 405k-tri bigcbox through the
full Renderer path (the config tools/bench_configs.py times) and prints
per-sweep wall, resolved knobs, and kernel stats — to attribute the gap
between the Renderer-path number (0.029 Mrays/s, round-3 re-measure) and the
direct render_waves matrix (0.364 Mrays/s, tools/ab_hbm_matrix.py) on the
same scene.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_cfg4b.py [--spp N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hijiki_tpu.utils.tpuenv import configure_tpu_env

configure_tpu_env()
from hijiki_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    spp = 1
    # accept --spp=N and --spp N; unknown args fail loudly (review finding)
    argv = list(sys.argv[1:])
    while argv:
        a = argv.pop(0)
        if a.startswith("--spp="):
            spp = int(a.split("=", 1)[1])
        elif a == "--spp" and argv:
            spp = int(argv.pop(0))
        else:
            raise SystemExit(f"unknown arg {a} (only --spp N)")

    import jax

    from hijiki_tpu.render.renderer import (
        RenderConfig,
        Renderer,
        resolve_chain_sweeps,
        resolve_mega_groups,
        resolve_mega_packet,
        resolve_mega_trunk,
        resolve_spec_resolve,
    )
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.obj import load_obj_scene

    log(f"devices: {jax.devices()}")

    big_obj = "/tmp/bigcbox3.obj"
    sc = load_obj_scene(big_obj)
    sc.put_cbox_spheres()
    # device-convert once: the warm render commits the 151 MB table upload,
    # and every Renderer below shares the same device buffers (the gap this
    # probe found: passing host numpy re-uploads per instance, lazily,
    # inside the timed region — ~9 s/sweep of tunnel upload)
    compiled = scene_to_device(compile_scene(sc))
    W = H = 512
    cfg = RenderConfig(width=W, height=H, spp=spp, seed=1, driver="mega",
                       max_bounces=1000)
    r = Renderer(compiled, cfg)
    log(
        f"resolved: table_hbm={r._mega_table_hbm} "
        f"tbl_rows={r.scene.mega_tbl_rows} packed={r.scene.mega_packed_static} "
        f"bytes={np.asarray(r.scene.trace_rows_mega).nbytes / 1e6:.1f} MB "
        f"n_tables={r.scene.mega_num_tables_static}"
    )
    log(
        f"packet={resolve_mega_packet(0)} "
        f"groups={resolve_mega_groups(0, resolve_mega_packet(0), r._mega_table_hbm)} "
        f"spec={resolve_spec_resolve(0, r._mega_table_hbm)} "
        f"trunk={resolve_mega_trunk(0, r._mega_table_hbm, r.scene)} "
        f"chain={resolve_chain_sweeps(cfg, r._mega_table_hbm)}"
    )
    t0 = time.monotonic()
    r.render()
    np.asarray(r.film)
    log(f"warm render (compile): {time.monotonic() - t0:.1f}s")
    log(f"warm metrics: {({k: v for k, v in r.metrics.items() if k != 'sweep_marks'})}")
    log(f"sweep_marks: {[f'{m:.2f}' for m in r.metrics['sweep_marks']]}")

    import dataclasses

    best = None
    for rep in range(3):
        r2 = Renderer(compiled, dataclasses.replace(cfg, seed=2 + rep))
        t0 = time.monotonic()
        r2.render()
        img = r2.image()
        dt = time.monotonic() - t0
        mrays = W * H * spp / dt / 1e6
        log(
            f"rep {rep}: {dt:.2f}s {mrays:.3f} Mrays/s mean={img.mean():.4f} "
            f"marks={[f'{m:.2f}' for m in r2.metrics['sweep_marks']]}"
        )
        best = max(best or 0, mrays)
    print(f"cfg4b renderer-path best: {best:.3f} Mrays/s")


if __name__ == "__main__":
    main()
