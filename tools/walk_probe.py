"""Walk-isolation probe: time the REAL megakernel walker (spec/grouped,
octant tables, analytic pretest) on camera rays, outside the bounce loop.

Variants:
  unpacked / packed       — table format (scene.compile packed_leaf)
  test / notest           — `notest` monkeypatches _prim_test to return
                            all-miss constants, measuring the walk body
                            WITHOUT the prim-test ops. best_t then never
                            tightens; sim (tools/sim_twolevel.py) puts the
                            resulting visit inflation at +3.3% on camera
                            rays — the correction is applied to the
                            reported per-iteration costs.

The (time_test - time_notest) split calibrates the two-level walker design
(park prim rows, drain conditionally): inner-step cost ~= notest body,
drain cost ~= the removed test ops + fetch.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/walk_probe.py [W] [groups]
"""

import functools
import sys
import time

import numpy as np

from hijiki_tpu.utils.tpuenv import configure_tpu_env

configure_tpu_env()
from hijiki_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import hijiki_tpu.ops.pallas_megakernel as mk
from hijiki_tpu.scene.compile import compile_scene, scene_to_device
from hijiki_tpu.scene.obj import load_obj_scene

SUBLANES = mk.SUBLANES
P = mk.MEGA_PACKET_TPU


def walk_kernel(rows_ref, o_ref, d_ref, t_ref, n_ref, *, cfg):
    ox = o_ref[0]
    oy = o_ref[1]
    oz = o_ref[2]
    dx = d_ref[0]
    dy = d_ref[1]
    dz = d_ref[2]
    tmin = jnp.full(ox.shape, mk.f32(1e-4))
    tmax = jnp.full(ox.shape, mk.f32(mk.BIG))
    base = mk._octant_base(tmax >= 0, dx, dy, dz, cfg["tbl_rows"], cfg["ntab"])
    h = mk._traverse(
        rows_ref, cfg["tbl_rows"], cfg["total_rows"], cfg["analytic"], base,
        ox, oy, oz, dx, dy, dz, tmin, tmax, want_payload=True,
        spec=True, groups=cfg["groups"], packed=cfg["packed"],
    )
    t_ref[0] = h["t"]
    n_ref[...] = jnp.broadcast_to(h["nit"], (SUBLANES, P)).reshape(1, SUBLANES, P)


def make_runner(cs, groups):
    ntab = cs.mega_num_tables_static
    R = cs.mega_tbl_rows
    rows = cs.trace_rows_mega
    cfg = dict(
        tbl_rows=R,
        total_rows=rows.shape[0],
        ntab=ntab,
        analytic=(cs.analytic_bake_static
                  if cs.mega_analytic_mode_static else None),
        groups=groups,
        packed=((ntab * R, cs.mega_pay_rows_static, cs.mega_packed_static)
                if cs.mega_packed_static else None),
    )

    def run(o, d):
        n_tiles = o.shape[1] // (SUBLANES * P)
        shp = (3, n_tiles, SUBLANES, P)
        t, nit = pl.pallas_call(
            functools.partial(walk_kernel, cfg=cfg),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((3, None, SUBLANES, P), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, None, SUBLANES, P), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, None, SUBLANES, P), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, SUBLANES, P), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, n_tiles, SUBLANES, P), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, 1, SUBLANES, P), jnp.float32),
            ),
        )(rows, o.reshape(shp), d.reshape(shp))
        return t, nit

    return jax.jit(run)


def camera_rays_np(cs, W, H):
    import math

    cx, cy, cz, qx, qy, qz, qw, fov = cs.camera_static
    R = np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
        [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
        [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
    ])
    idx = np.arange(W * H)
    px = (idx % W) + 0.5
    py = (idx // W) + 0.5
    scale = math.tan(math.radians(0.5 * fov)) / (0.5 * W)
    lx = (px - 0.5 * W) * scale
    ly = -(py - 0.5 * H) * scale
    d = np.stack([lx, ly, -np.ones_like(lx)], -1) @ R.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(np.array([cx, cy, cz]), d.shape)
    o3 = np.ascontiguousarray(o.T, np.float32)
    d3 = np.ascontiguousarray(d.T, np.float32)
    return jnp.asarray(o3), jnp.asarray(d3)


def make_w16_scene(cs):
    """Probe variant: the walk only reads cols 0-10 + the plane normal —
    build a 16-wide table (normals moved to cols 11-13) to measure the
    fetch-width term in isolation. Resolve reads garbage payload; t/iters
    are unaffected (timing probe only)."""
    import dataclasses

    rows = np.asarray(cs.trace_rows_mega)
    slim = np.zeros((rows.shape[0], 16), np.float32)
    slim[:, :11] = rows[:, :11]
    slim[:, 11:14] = rows[:, 29:32]
    return dataclasses.replace(cs, trace_rows_mega=slim)


def patch_normals_at_11():
    """Pair with make_w16_scene: read plane normals from cols 11-13."""
    orig = mk._prim_test
    f32 = mk.f32

    def prim_test_n11(rows8, ox, oy, oz, dx, dy, dz, tmin, best_t, analytic,
                      packed=False):
        assert analytic and not packed
        shp = ox.shape
        col = lambda j: jnp.broadcast_to(rows8[:, j : j + 1], shp)
        v0x, v0y, v0z = col(0), col(1), col(2)
        v1x, v1y, v1z = col(3), col(4), col(5)
        v2x, v2y, v2z = col(6), col(7), col(8)
        nx, ny, nz = col(11), col(12), col(13)
        rx = ox - v0x
        ry = oy - v0y
        rz = oz - v0z
        qx = ry * dz - rz * dy
        qy = rz * dx - rx * dz
        qz = rx * dy - ry * dx
        dd = f32(1.0) / (dx * nx + dy * ny + dz * nz)
        u = -dd * (qx * v2x + qy * v2y + qz * v2z)
        v = dd * (qx * v1x + qy * v1y + qz * v1z)
        t_pq = -dd * (nx * rx + ny * ry + nz * rz)
        phit = (u >= 0) & (v >= 0) & (u + v <= f32(1.0)) & (tmin <= t_pq)
        return phit, t_pq, u, v, None

    mk._prim_test = prim_test_n11
    return orig


def patch_no_test():
    orig = mk._prim_test

    def no_test(rows8, ox, oy, oz, dx, dy, dz, tmin, best_t, analytic,
                packed=False):
        z = ox * mk.f32(0.0)  # lane-varying zero (Mosaic layout trap)
        return z > mk.f32(1.0), z + mk.f32(mk.BIG), z, z, (
            z if packed else None
        )

    mk._prim_test = no_test
    return orig


def main_widths():
    """Fetch-width isolation: the same unpacked walk over 16- vs 32-wide
    rows (identical ALU: both read baked normals, just at different cols),
    plus pack3/pack4 for context. Usage: walk_probe.py widths [W] [G]."""
    W = H = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    groups = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    print(f"devices: {jax.devices()}, {W}x{H}, P={P}, G={groups}",
          file=sys.stderr)
    # Pure-walk isolation: skip _resolve_winners in EVERY variant — resolve
    # is ~3% of iterations (PERF_NOTES §9g2) and identical across widths,
    # and the synthetic w16 table has no payload cols for it to read (its
    # unpacked resolve slices col 28 of a 16-wide table: a trace error).
    # The walk's closest-hit carries (t/u/v/wrow/nit) are returned as-is.
    mk._resolve_winners = (
        lambda rows_ref, total_rows, analytic, final, **kw: final
    )
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs_u = scene_to_device(compile_scene(scene, packed_leaf=0))
    variants = {
        "w32": (cs_u, None),
        "w16": (scene_to_device(make_w16_scene(cs_u)), patch_normals_at_11),
        "slim": (scene_to_device(compile_scene(scene, packed_leaf=1)), None),
        "pack3": (scene_to_device(compile_scene(scene, packed_leaf=3)), None),
        "pack4": (scene_to_device(compile_scene(scene, packed_leaf=4)), None),
    }
    o, d = camera_rays_np(cs_u, W, H)

    runners, stats = {}, {}
    for key, (cs, patch) in variants.items():
        orig = patch() if patch else None
        run = make_runner(cs, groups)
        t, nit = run(o, d)  # trace+warm inside the patch window
        stats[key] = (float(jnp.sum(nit)) / (SUBLANES * P),
                      float(jnp.sum(jnp.where(t < 1e30, t, 0.0))))
        runners[key] = run
        if orig:
            mk._prim_test = orig

    times = {k: [] for k in runners}
    for _ in range(7):
        for key, run in runners.items():
            t0 = time.monotonic()
            t, nit = run(o, d)
            _ = float(jnp.sum(nit))
            times[key].append(time.monotonic() - t0)
    base = min(times["w32"])
    for key in runners:
        best = min(times[key])
        iters, s = stats[key]
        print(f"{key:6s}: {best*1e3:7.2f} ms  tile-iters {iters:8.0f}  "
              f"t-sum {s:12.1f}  vs w32: {base/best:.3f}x")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "widths":
        return main_widths()
    W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print(f"devices: {jax.devices()}, {W}x{H}, P={P}, G={groups}",
          file=sys.stderr)
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    scenes = {
        "unpacked": scene_to_device(compile_scene(scene, packed_leaf=0)),
        "packed": scene_to_device(compile_scene(scene, packed_leaf=4)),
    }
    o, d = camera_rays_np(scenes["packed"], W, H)

    # build all runners first (monkeypatch applies at trace time), then time
    # with round-robin alternation — block-timing drifts 1.5-2x on this
    # stack (docs/PERF_NOTES.md §8)
    runners = {}
    stats = {}
    for patched in (False, True):
        orig = patch_no_test() if patched else None
        for name, cs in scenes.items():
            key = f"{name}{'-notest' if patched else ''}"
            run = make_runner(cs, groups)
            t, nit = run(o, d)
            s = float(jnp.sum(jnp.where(t < 1e30, t, 0.0)))
            iters = float(jnp.sum(nit)) / (SUBLANES * P)
            runners[key] = run
            stats[key] = (iters, s)
        if patched:
            mk._prim_test = orig

    times = {k: [] for k in runners}
    for _ in range(7):
        for key, run in runners.items():
            t0 = time.monotonic()
            t, nit = run(o, d)
            _ = float(jnp.sum(nit))
            times[key].append(time.monotonic() - t0)

    results = {}
    for key in runners:
        best = min(times[key])
        iters, s = stats[key]
        results[key] = (best, iters, s)
        print(f"{key:18s}: {best*1e3:7.2f} ms  tile-iters {iters:8.0f} "
              f"({best/iters*1e9:6.1f} ns/iter)  t-sum {s:.1f}")

    tu, iu, _ = results["unpacked"]
    tp, ip, _ = results["packed"]
    tun, iun, _ = results["unpacked-notest"]
    tpn, ipn, _ = results["packed-notest"]
    print(f"\nper-iter: unpacked {tu/iu*1e9:.1f} ns, no-test {tun/iun*1e9:.1f} ns "
          f"-> test share {(tu/iu-tun/iun)/(tu/iu)*100:.0f}%")
    print(f"per-iter: packed   {tp/ip*1e9:.1f} ns, no-test {tpn/ipn*1e9:.1f} ns "
          f"-> test share {(tp/ip-tpn/ipn)/(tp/ip)*100:.0f}%")


if __name__ == "__main__":
    main()
