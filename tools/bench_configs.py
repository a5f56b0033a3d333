"""Measure the five BASELINE.json configs on the attached chip and print a
markdown table for BASELINE.md.

Usage: python tools/bench_configs.py [--spp N] [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_mixed_scene():
    """Config 3: checkerboard-textured triangles with real UVs + analytic
    spheres + quads (the scene family tests/test_megakernel.py validates)."""
    from hijiki_tpu.scene.model import (
        Camera,
        Dielectric,
        Diffuse,
        DiffuseCheckerboard,
        Emissive,
        Mirror,
        Quad,
        Scene,
        Sphere,
        Triangle,
    )

    s = Scene(camera=Camera.cbox_default())
    white = s.add_material(Diffuse((0.7, 0.7, 0.7)))
    cb = s.add_material(DiffuseCheckerboard((0.9, 0.2, 0.2), 0.25, (0.2, 0.2, 0.9), 0.25))
    mirror = s.add_material(Mirror())
    glass = s.add_material(Dielectric.clear(1.5))
    light = s.add_material(Emissive((10.0, 10.0, 10.0)))
    s.add_object(Quad((-2, 0, -2), (4, 0, 0), (0, 0, 4)), white)
    s.add_object(Quad((-2, 0, -2), (4, 0, 0), (0, 3, 0)), cb)
    s.add_object(Quad((-0.5, 2.8, -0.5), (1, 0, 0), (0, 0, 1)), light)
    s.positions = np.array(
        [[-1.5, 0.01, 1.5], [1.5, 0.01, 1.5], [0.0, 0.01, -1.5]], np.float32
    )
    s.normals = np.array([[0, 1, 0]] * 3, np.float32)
    s.uvs = np.array([[0, 0], [4, 0], [2, 4]], np.float32)
    s.add_object(Triangle((0, 1, 2)), cb)
    s.add_object(Sphere((-0.8, 0.5, 0.3), 0.5), mirror)
    s.add_object(Sphere((0.8, 0.5, 0.3), 0.5), glass)
    return s


def run_config(name, scene, W, H, spp, driver="mega"):
    import jax

    from hijiki_tpu.render.renderer import RenderConfig, Renderer
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device

    # device-convert ONCE so warm and timed Renderers share the same device
    # buffers: Renderer's own scene_to_device is a no-op on jax arrays, and
    # the warmup render commits the upload. Passing the host-side numpy
    # CompiledScene to each Renderer instead would re-upload the whole trace
    # table per instance — INSIDE the timed region (the transfer is lazy) —
    # which for cfg4b's 151 MB PACKED4 table measured ~9 s/sweep of pure
    # tunnel upload against a 0.72 s walk (round-3 probe_cfg4b).
    compiled = scene_to_device(compile_scene(scene))
    cfg = RenderConfig(width=W, height=H, spp=spp, seed=1, driver=driver,
                       max_bounces=1000)
    r = Renderer(compiled, cfg)
    r.render()
    r.image()  # compile+warm
    r2 = Renderer(compiled, dataclasses_replace(cfg, seed=2))
    t0 = time.monotonic()
    r2.render()
    img = r2.image()
    dt = time.monotonic() - t0
    mrays = W * H * spp / dt / 1e6
    log(f"{name}: {dt:.2f}s, {mrays:.3f} Mrays/s, mean {img.mean():.4f}")
    return mrays, dt, float(img.mean())


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--quick", action="store_true", help="8 spp")
    args = ap.parse_args()
    spp = 8 if args.quick else args.spp

    from hijiki_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hijiki_tpu.scene.obj import load_obj_scene

    rows = []

    # 1: cbox diffuse-only (the plain scene is diffuse + emissive)
    sc = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    rows.append(("1 cbox diffuse-only 512^2", *run_config("cfg1", sc, 512, 512, spp)))

    # 2: full material set (mirror + checkerboard + dielectric + emissive)
    sc = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    sc.put_cbox_spheres()
    sc.put_dielectric_sphere()
    rows.append(("2 full materials 512^2", *run_config("cfg2", sc, 512, 512, spp)))

    # 3: textured triangles (UV lookup) + analytic spheres, mixed
    rows.append(("3 textured mixed 512^2", *run_config("cfg3", build_mixed_scene(), 512, 512, spp)))

    # 4: wavefront multi-bounce with compaction, 1024^2 (bench.py config)
    sc = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    sc.put_cbox_spheres()
    # BASELINE config 4 names "per-material stream sort"; on this stack that
    # is a measured dead end (intra-tile sorting inflates packet row unions,
    # PERF_NOTES §9/§9u) — compaction is via phases/regeneration instead,
    # and the row name says so to keep the recorded list self-explanatory.
    rows.append((
        "4 wavefront 1024^2 (compaction via phases; stream sort measured off)",
        *run_config("cfg4", sc, 1024, 1024, max(spp // 8, 1)),
    ))

    # 4b: genuine big scene (405k-tri subdivided cbox, 74 MB trace table) —
    # exercises the HBM-resident table streaming mode (PERF_NOTES §9h) on
    # real BVH topology. Config 4's BASELINE "per-material stream sort" is
    # measured-off on this stack: compaction is via phases/regeneration
    # (render_waves), and --sort-lanes is a documented dead end (PERF_NOTES
    # §9: intra-tile sorting increases packet row unions).
    import subprocess

    big_obj = "/tmp/bigcbox3.obj"
    if not os.path.exists(big_obj):
        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "make_bigscene.py"),
             "3", big_obj],
            check=True,
        )
    sc = load_obj_scene(big_obj)
    sc.put_cbox_spheres()
    big_spp = max(spp // 16, 1)
    name = "4b big scene 405k tris 512^2 (HBM table)"
    mrays, dt, mean = run_config("cfg4b", sc, 512, 512, big_spp)
    rows.append((name, mrays, dt, mean))

    # 5: bilateral denoise + progressive preview accumulation (reconstruction
    # throughput: pallas stencil over one sweep's AOVs)
    import jax.numpy as jnp

    from hijiki_tpu.render.pallas_reconstruct import reconstruct_pallas

    W = H = 1024
    rng = np.random.default_rng(0)
    total = jnp.asarray(rng.random((H, W, 3), np.float32))
    normal = jnp.asarray(rng.standard_normal((H, W, 3)).astype(np.float32))
    off = jnp.asarray(np.array([0.5, 0.5], np.float32))
    np.asarray(reconstruct_pallas(total, normal, off, block_size=128, stddev=0.5))
    t0 = time.monotonic()
    reps = 10
    for _ in range(reps):
        out = reconstruct_pallas(total, normal, off, block_size=128, stddev=0.5)
    np.asarray(out)
    dt = (time.monotonic() - t0) / reps
    mpix = W * H / dt / 1e6
    log(f"cfg5: reconstruction {dt*1000:.1f} ms/sweep @1024^2 = {mpix:.1f} Mpix/s"
        " (dispatch-bound through the tunnel; see in-stream row)")
    rows.append(("5 bilateral reconstruction 1024^2 (per-dispatch)", mpix, dt, 0.0))

    # 5b: the KERNEL statistic — k chained kernels in one dispatch; the
    # slope over k cancels the ~25-29 ms tunnel RTT that dominates the row
    # above (round-4: 0.49 ms/kernel = 2120 Mpix/s vs 11 Mpix/s end-to-end;
    # the round-2/3 cfg5 'regression' was RTT drift, not the kernel —
    # tools/ab_reconstruct.py instream, PERF_NOTES §8)
    import jax

    @partial(jax.jit, static_argnames=("k",))
    def _chain_k(color, normal, so, *, k):
        def body(i, c):
            return reconstruct_pallas(
                c, normal, so, block_size=128, stddev=0.5
            )[..., :3]
        return jnp.sum(jax.lax.fori_loop(0, k, body, color))

    for k in (1, 9):
        float(_chain_k(total, normal, off, k=k))
    t = {1: [], 9: []}
    for _ in range(5):
        for k in (1, 9):
            t0 = time.monotonic()
            float(_chain_k(total, normal, off, k=k))
            t[k].append(time.monotonic() - t0)
    per = (min(t[9]) - min(t[1])) / 8
    mpix_k = W * H / per / 1e6
    log(f"cfg5 in-stream: {per*1000:.2f} ms/kernel = {mpix_k:.0f} Mpix/s")
    rows.append(("5b bilateral reconstruction 1024^2 (in-stream kernel)",
                 mpix_k, per, 0.0))

    print("| config | Mrays/s (cfg5: Mpix/s) | seconds | image mean |")
    print("|---|---|---|---|")
    for name, v, dt, mean in rows:
        print(f"| {name} | {v:.3f} | {dt:.2f} | {mean:.4f} |")


if __name__ == "__main__":
    main()
