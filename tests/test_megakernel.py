"""Megakernel (interpret mode) vs the XLA integrator: identical RNG streams,
matching radiance/AOVs for the same per-pixel seeds."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs = scene_to_device(compile_scene(scene))
    W = H = 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32))
    return cs, W, H, px, py, seeds


@pytest.mark.quick
def test_megakernel_matches_integrator(setup):
    import jax.numpy as jnp

    from hijiki_tpu.ops.camera import camera_rays
    from hijiki_tpu.ops.integrate import integrate
    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.ops.rng import seed_rng

    cs, W, H, px, py, seeds = setup
    total, normal, depth, state = render_tiles(
        cs, px, py, seeds, width=W, height=H, max_bounces=24, interpret=True
    )
    pxy = jnp.stack([px, py], -1)
    o, d, tmin, tmax = camera_rays(
        cs.cam_position, cs.cam_rotation, cs.cam_fov, pxy, jnp.asarray([W, H], jnp.float32)
    )
    out = integrate(cs, o, d, tmin, tmax, seed_rng(seeds), max_bounces=24, traversal="rows")

    # identical predicated RNG consumption -> bitwise-equal final states
    np.testing.assert_array_equal(np.asarray(state), np.asarray(out.state))
    np.testing.assert_allclose(
        np.asarray(total), np.asarray(out.total), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(depth), np.asarray(out.depth), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(normal), np.asarray(out.normal), rtol=1e-2, atol=2e-3
    )


def test_megakernel_dielectric(setup):
    """Dielectric paths through the megakernel (glass sphere scene)."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.camera import camera_rays
    from hijiki_tpu.ops.integrate import integrate
    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.ops.rng import seed_rng
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    scene.put_dielectric_sphere()
    from hijiki_tpu.scene.model import Sphere

    shape, mat = scene.objects[-1]
    scene.objects[-1] = (Sphere((0.0, 0.35, 0.9), 0.3), mat)
    cs = scene_to_device(compile_scene(scene))

    W = H = 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.5).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.5).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 747796405 % (1 << 32)).astype(np.uint32))

    total, normal, depth, state = render_tiles(
        cs, px, py, seeds, width=W, height=H, max_bounces=24, interpret=True
    )
    pxy = jnp.stack([px, py], -1)
    o, d, tmin, tmax = camera_rays(
        cs.cam_position, cs.cam_rotation, cs.cam_fov, pxy, jnp.asarray([W, H], jnp.float32)
    )
    out = integrate(cs, o, d, tmin, tmax, seed_rng(seeds), max_bounces=24, traversal="rows")
    np.testing.assert_array_equal(np.asarray(state), np.asarray(out.state))
    np.testing.assert_allclose(
        np.asarray(total), np.asarray(out.total), rtol=2e-3, atol=2e-3
    )


def test_spec_walker_bitwise_identical(setup):
    """The software-pipelined walker (spec mode) must produce bitwise-equal
    outputs: its carried descend vote is computed from exactly the state the
    plain walker's in-iteration slab reads (ops/pallas_megakernel
    ._traverse_spec docstring)."""
    from hijiki_tpu.ops.pallas_megakernel import render_tiles

    cs, W, H, px, py, seeds = setup
    a = render_tiles(
        cs, px, py, seeds, width=W, height=H, max_bounces=16,
        interpret=True, spec=False,
    )
    b = render_tiles(
        cs, px, py, seeds, width=W, height=H, max_bounces=16,
        interpret=True, spec=True,
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_spec_resolve_bitwise_identical(setup):
    """The pipelined winner-resolve loop (spec_resolve) carries the next
    target one iteration ahead; visit order (min-first) and all selects are
    identical to the sync loop, so every output must be bitwise-equal —
    across the spec, grouped, and plain walkers."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles

    cs = setup[0]
    W, H = 64, 32  # N=2048: enough rays for the packet=256 grouped variant
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray(
        (np.arange(W * H) * 2654435761 % (1 << 32)).astype(np.uint32)
    )
    for kw in (
        dict(packet=128, groups=1),              # spec walker
        dict(packet=256, groups=2),              # grouped spec
        dict(packet=128, groups=1, spec=False),  # plain walker
        dict(packet=128, groups=1, spec=False, table_in_hbm=True),  # DMA
        dict(packet=256, groups=2, spec=False, table_in_hbm=True),  # gDMA
    ):
        a = render_tiles(cs, px, py, seeds, width=W, height=H,
                         max_bounces=12, interpret=True,
                         spec_resolve=False, **kw)
        b = render_tiles(cs, px, py, seeds, width=W, height=H,
                         max_bounces=12, interpret=True,
                         spec_resolve=True, **kw)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_spec_resolve_bitwise_identical_packed():
    """spec_resolve with packed payload sections: SLIM (dual payload-row
    fetch carried) and PACKED4 — bitwise-equal to the sync resolve."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    W = H = 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32))

    for leaf in (1, 4):  # SLIM 16-col, PACKED4 64-col
        cs = scene_to_device(compile_scene(scene, packed_leaf=leaf))
        assert cs.mega_packed_static == leaf
        a = render_tiles(cs, px, py, seeds, width=W, height=H,
                         max_bounces=10, interpret=True, spec_resolve=False)
        b = render_tiles(cs, px, py, seeds, width=W, height=H,
                         max_bounces=10, interpret=True, spec_resolve=True)
        for xx, yy in zip(a, b):
            np.testing.assert_array_equal(np.asarray(xx), np.asarray(yy))


def test_grouped_walker_matches_single_group(setup):
    """The grouped spec walker (G independent cursor groups per tile,
    ops/pallas_megakernel._traverse_spec_grouped) must reproduce the
    single-group walk: per-lane accepts are packet-layout independent, so
    every output — radiance, AOVs, RNG states — matches exactly on this
    scene (only t-tie winners could ever differ between groupings)."""
    from hijiki_tpu.ops.pallas_megakernel import render_waves

    cs, W, H, px, py, seeds = setup
    a = render_waves(
        cs, px, py, seeds, width=W, height=H, max_bounces=12,
        interpret=True, packet=256, groups=1,
    )
    b = render_waves(
        cs, px, py, seeds, width=W, height=H, max_bounces=12,
        interpret=True, packet=256, groups=2,
    )
    # [0] total, [1] normal, [2] depth, [7] albedo: the walks are the same
    # per-lane math, but grouped/ungrouped are distinct XLA programs and the
    # CPU backend may contract (FMA/fuse) them differently, so demand
    # near-bitwise agreement: every element within 1-ULP-scale tolerance AND
    # >= 99% exactly equal (a genuine estimator divergence reroutes whole
    # paths — radiance deltas O(0.1) across many lanes — and fails both).
    # [6] rows counts walk ITERATIONS (one row per group per iter), so it
    # legitimately shrinks with groups and is excluded.
    for i in (0, 1, 2, 7):
        u, v = np.asarray(a[i]), np.asarray(b[i])
        np.testing.assert_allclose(u, v, atol=1e-6, rtol=1e-5)
        assert (u == v).mean() > 0.99
    assert float(np.asarray(b[6]).sum()) < float(np.asarray(a[6]).sum())


def test_grouped_walker_validation():
    """groups>1 with an incompatible packet/spec/hbm config raises early."""
    from hijiki_tpu.ops.pallas_megakernel import _check_groups

    _check_groups(1024, 4, True, False)  # valid
    _check_groups(1024, 4, False, True)  # valid: grouped DMA-pipelined HBM
    with pytest.raises(ValueError):
        _check_groups(256, 4, True, False)  # 4 groups need packet >= 512
    with pytest.raises(ValueError):
        _check_groups(512, 4, False, False)  # VMEM tables need spec walker


def test_render_waves_matches_single_launch(setup):
    """Phased (compaction+sort) launches == one launch, path for path."""
    from hijiki_tpu.ops.pallas_megakernel import render_tiles, render_waves

    cs, W, H, px, py, seeds = setup
    t1 = render_tiles(cs, px, py, seeds, width=W, height=H, max_bounces=24, interpret=True)
    tw = render_waves(
        cs, px, py, seeds, width=W, height=H, max_bounces=24,
        phase_bounces=(6, 12), interpret=True,
    )
    assert int(tw[4]) == 0  # no capacity overflow
    np.testing.assert_array_equal(np.asarray(tw[3]), np.asarray(t1[3]))  # RNG states
    np.testing.assert_allclose(np.asarray(tw[0]), np.asarray(t1[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tw[2]), np.asarray(t1[2]), rtol=1e-5)
    assert float(tw[5].sum()) > 0  # bounce statistics populated


def test_megakernel_mixed_scene_quads_textures():
    """Quads, checkerboard-textured triangles with real UVs, spheres, and a
    dielectric — the mixed-scene config — through the megakernel vs the XLA
    integrator (cbox exercises none of: quads, nonzero triangle UVs)."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.camera import camera_rays
    from hijiki_tpu.ops.integrate import integrate
    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.ops.rng import seed_rng
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
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

    # floor quad + back quad
    s.add_object(Quad((-2, 0, -2), (4, 0, 0), (0, 0, 4)), white)
    s.add_object(Quad((-2, 0, -2), (4, 0, 0), (0, 3, 0)), cb)
    # light quad near ceiling
    s.add_object(Quad((-0.5, 2.8, -0.5), (1, 0, 0), (0, 0, 1)), light)
    # checkerboard-textured triangles with explicit UVs
    s.positions = np.array(
        [[-1.5, 0.01, 1.5], [1.5, 0.01, 1.5], [0.0, 0.01, -1.5]], np.float32
    )
    s.normals = np.array([[0, 1, 0]] * 3, np.float32)
    s.uvs = np.array([[0, 0], [4, 0], [2, 4]], np.float32)
    s.add_object(Triangle((0, 1, 2)), cb)
    # spheres
    s.add_object(Sphere((-0.8, 0.5, 0.3), 0.5), mirror)
    s.add_object(Sphere((0.8, 0.5, 0.3), 0.5), glass)

    cs = scene_to_device(compile_scene(s))
    W = H = 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.41).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.27).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 2891336453 % (1 << 32)).astype(np.uint32))

    total, normal, depth, state = render_tiles(
        cs, px, py, seeds, width=W, height=H, max_bounces=24, interpret=True
    )
    pxy = jnp.stack([px, py], -1)
    o, d, tmin, tmax = camera_rays(
        cs.cam_position, cs.cam_rotation, cs.cam_fov, pxy, jnp.asarray([W, H], jnp.float32)
    )
    out = integrate(cs, o, d, tmin, tmax, seed_rng(seeds), max_bounces=24, traversal="rows")
    # ULP differences in sphere-hit t can flip the dielectric's Fresnel coin
    # for grazing rays, diverging that path's stream (statistically neutral);
    # require equality on >=99.5% of paths and radiance match on those.
    same = np.asarray(state) == np.asarray(out.state)
    assert same.mean() >= 0.995, f"too many diverged paths: {1 - same.mean():.3%}"
    np.testing.assert_allclose(
        np.asarray(total)[same], np.asarray(out.total)[same], rtol=2e-3, atol=2e-3
    )
    assert float(jnp.mean(out.total)) > 0.01  # scene actually lit


def test_sort_tile_by_key():
    """The in-kernel bitonic network sorts a tile's 1024 flat lanes and applies
    one consistent permutation to every payload channel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from hijiki_tpu.ops.pallas_sort import SUBLANES, PACKET, sort_tile_by_key

    rng = np.random.default_rng(7)
    key = rng.integers(0, 5000, size=(SUBLANES, PACKET)).astype(np.int32)
    payload = np.arange(SUBLANES * PACKET, dtype=np.int32).reshape(SUBLANES, PACKET)
    fpayload = rng.standard_normal((SUBLANES, PACKET)).astype(np.float32)

    def kernel(k_ref, p_ref, f_ref, ko_ref, po_ref, fo_ref):
        k, (p, f) = sort_tile_by_key(k_ref[...], [p_ref[...], f_ref[...]])
        ko_ref[...] = k
        po_ref[...] = p
        fo_ref[...] = f

    ko, po, fo = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((SUBLANES, PACKET), jnp.int32),
            jax.ShapeDtypeStruct((SUBLANES, PACKET), jnp.int32),
            jax.ShapeDtypeStruct((SUBLANES, PACKET), jnp.float32),
        ],
        interpret=True,
    )(jnp.asarray(key), jnp.asarray(payload), jnp.asarray(fpayload))
    ko, po, fo = np.asarray(ko).ravel(), np.asarray(po).ravel(), np.asarray(fo).ravel()

    np.testing.assert_array_equal(ko, np.sort(key.ravel()))
    # po is the permutation applied: key[po] must equal the sorted key, and the
    # float channel must ride the same permutation
    np.testing.assert_array_equal(key.ravel()[po], ko)
    np.testing.assert_array_equal(fpayload.ravel()[po], fo)
    assert len(np.unique(po)) == SUBLANES * PACKET  # true permutation


def test_render_waves_lane_sort_is_pure_permutation(setup):
    """lane_sort reorders live paths between bounces but every path's RNG
    stream and radiance are untouched (restored to pixel order by pid)."""
    from hijiki_tpu.ops.pallas_megakernel import render_tiles, render_waves

    cs, W, H, px, py, seeds = setup
    t1 = render_tiles(cs, px, py, seeds, width=W, height=H, max_bounces=4, interpret=True)
    ts = render_waves(
        cs, px, py, seeds, width=W, height=H, max_bounces=4,
        phase_bounces=(2,), lane_sort=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ts[3]), np.asarray(t1[3]))  # RNG states
    np.testing.assert_allclose(np.asarray(ts[0]), np.asarray(t1[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ts[2]), np.asarray(t1[2]), rtol=1e-5)


def test_megakernel_many_analytics_fallback():
    """>8 spheres/quads: analytic baking disabled, unified table path used —
    megakernel must still match the XLA integrator."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.camera import camera_rays
    from hijiki_tpu.ops.integrate import integrate
    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.ops.rng import seed_rng
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.model import Camera, Diffuse, Emissive, Quad, Scene, Sphere

    s = Scene(camera=Camera.cbox_default())
    white = s.add_material(Diffuse((0.7, 0.7, 0.7)))
    light = s.add_material(Emissive((8.0, 8.0, 8.0)))
    s.add_object(Quad((-2, 0, -2), (4, 0, 0), (0, 0, 4)), white)
    s.add_object(Quad((-0.5, 2.8, -0.5), (1, 0, 0), (0, 0, 1)), light)
    for i in range(9):
        s.add_object(Sphere((-1.6 + 0.4 * i, 0.3, 0.4), 0.18), white)
    cs = compile_scene(s)
    assert cs.analytic_bake_static == ()  # fallback engaged
    cs = scene_to_device(cs)

    W = H = 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.5).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.5).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 747796405 % (1 << 32)).astype(np.uint32))
    total, normal, depth, state = render_tiles(
        cs, px, py, seeds, width=W, height=H, max_bounces=12, interpret=True
    )
    pxy = jnp.stack([px, py], -1)
    o, d, tmin, tmax = camera_rays(
        cs.cam_position, cs.cam_rotation, cs.cam_fov, pxy, jnp.asarray([W, H], jnp.float32)
    )
    out = integrate(cs, o, d, tmin, tmax, seed_rng(seeds), max_bounces=12, traversal="rows")
    np.testing.assert_array_equal(np.asarray(state), np.asarray(out.state))
    np.testing.assert_allclose(np.asarray(total), np.asarray(out.total), rtol=2e-3, atol=2e-3)


def test_packet_width_invariance(setup):
    """The estimator is packet-width independent: per-lane RNG streams and
    accepts don't depend on how many lanes share a traversal cursor, so any
    width gives identical images (interpret mode, 64x32 = one 256-wide tile)."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles

    cs = setup[0]
    W, H = 64, 32
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(np.arange(H * W, dtype=np.uint32) * np.uint32(2654435761))

    outs = {}
    for packet in (128, 256):
        t, n, dep, st = render_tiles(
            cs, px, py, seeds, width=W, height=H, max_bounces=4,
            interpret=True, packet=packet,
        )
        outs[packet] = np.asarray(t)
    np.testing.assert_array_equal(outs[128], outs[256])


def test_all_analytic_scene_inert_table(cbox_compiled):
    """All-analytic scenes with <= 8 prims compile to a single inert trace
    row (every prim baked as immediates); the megakernel must agree with the
    XLA integrator on them (interpret mode)."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.camera import camera_rays
    from hijiki_tpu.ops.integrate import integrate
    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.ops.rng import seed_rng
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.model import (
        Camera, Diffuse, Emissive, Quad, Scene, Sphere,
    )

    scene = Scene(camera=Camera.cbox_default())
    w = scene.add_material(Diffuse((0.6, 0.6, 0.6)))
    l = scene.add_material(Emissive((12.0,) * 3))
    scene.add_object(Sphere((0.0, 0.8, 0.0), 0.5), w)
    scene.add_object(Quad((-2, 0, -2), (4, 0, 0), (0, 0, 4)), w)  # floor
    scene.add_object(Quad((-0.6, 2.5, -0.6), (1.2, 0, 0), (0, 0, 1.2)), l)
    cs = scene_to_device(compile_scene(scene))
    assert cs.mega_tbl_rows == 1  # the inert interior row
    W, H = 64, 16
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.5).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.5).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(W * H) * 2654435761 % (1 << 32)).astype(np.uint32))
    t, n, dep, st = render_tiles(cs, px, py, seeds, width=W, height=H,
                                 max_bounces=6, interpret=True)
    pxy = jnp.stack([px, py], -1)
    o, d, tmin, tmax = camera_rays(cs.cam_position, cs.cam_rotation, cs.cam_fov,
                                   pxy, jnp.asarray([W, H], jnp.float32))
    ref = integrate(cs, o, d, tmin, tmax, seed_rng(seeds), max_bounces=6,
                    traversal="rows")
    a, b = np.asarray(t), np.asarray(ref.total)
    # the two backends visit prims in different orders, so exact-t ties at
    # silhouettes may pick different winners on isolated pixels (same
    # tolerance rationale as test_render.test_bvh_vs_brute_render)
    close = np.isclose(a, b, rtol=2e-4, atol=2e-5)
    assert close.mean() > 0.995, f"{(~close).sum()} of {close.size} differ"
    assert a.mean() > 0.01  # lit


def test_chained_sweeps_match_separate(setup):
    """render_waves_chained (in-kernel sample chaining: dead lanes respawn
    onto the pixel's next sweep sample; capped paths park to per-sample
    state slots and finish via the compaction phases) must reproduce S
    separate render_waves sweeps sample-for-sample. chain_cap=8 forces the
    parked-path route to be exercised."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import (
        render_waves,
        render_waves_chained,
    )

    cs, W, H, px, py, seeds = setup
    S = 3
    rng = np.random.default_rng(5)
    pxs, pys, sds_ = [], [], []
    base_px = np.asarray(px) - 0.37
    base_py = np.asarray(py) - 0.61
    for s in range(S):
        ox, oy = rng.random(2, dtype=np.float32)
        pxs.append(base_px + ox)
        pys.append(base_py + oy)
        sds_.append(
            ((np.arange(W * H) * 2654435761 + s * 977) % (1 << 32)).astype(
                np.uint32
            )
        )
    pxs = jnp.asarray(np.stack(pxs))
    pys = jnp.asarray(np.stack(pys))
    sds_ = jnp.asarray(np.stack(sds_))

    ref = [
        render_waves(
            cs, pxs[s], pys[s], sds_[s], width=W, height=H, max_bounces=40,
            interpret=True,
        )
        for s in range(S)
    ]
    ch = render_waves_chained(
        cs, pxs, pys, sds_, width=W, height=H, max_bounces=40, chain_cap=8,
        interpret=True,
    )
    assert int(ch[4]) == 0  # no parked-path capacity overflow
    # total, normal, depth, bounces, albedo: exact per sweep
    for i in (0, 1, 2, 5, 7):
        for s in range(S):
            np.testing.assert_array_equal(
                np.asarray(ref[s][i]), np.asarray(ch[i][s])
            )


def test_chained_overflow_counter_reports_drops(setup):
    """A pathologically low chain_cap must overflow the parked-path
    capacity and SAY so (the bias detector), rather than silently dropping
    samples."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_waves_chained

    cs, W, H, px, py, seeds = setup
    pxs = jnp.stack([px, px])
    pys = jnp.stack([py, py])
    sds_ = jnp.stack([seeds, seeds + jnp.uint32(1)])
    ch = render_waves_chained(
        cs, pxs, pys, sds_, width=W, height=H, max_bounces=40, chain_cap=1,
        phase_shrink=(64,), interpret=True,
    )
    assert int(ch[4]) > 0


def test_chained_phase_normalization(setup):
    """Phase caps are clamped, paired with THEIR shrinks, and non-monotonic
    entries dropped: a resume cap at or below an earlier cap is a pure
    truncation pass (it can only spuriously drop parked samples), and a
    filtered-out cap must take its shrink entry with it or every later
    phase runs at the wrong capacity (round-3 review finding)."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_waves_chained

    cs, W, H, px, py, seeds = setup
    pxs = jnp.stack([px, px])
    pys = jnp.stack([py, py])
    sds_ = jnp.stack([seeds, seeds + jnp.uint32(1)])

    def run(**kw):
        out = render_waves_chained(
            cs, pxs, pys, sds_, width=W, height=H, max_bounces=40,
            chain_cap=8, interpret=True, **kw,
        )
        return out

    ref = run(phase_bounces=(48,))
    # non-monotonic resume caps: (48, 24) — the 24-cap phase after the
    # 48-cap phase is a no-op for every lane and must be dropped, not run
    # as a truncation pass that drops parked samples
    nonmono = run(phase_bounces=(48, 24))
    assert int(nonmono[4]) == 0
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(nonmono[0]))
    # cap<=chain_cap filtered out: its pathological shrink must go WITH it —
    # if the pairing slipped, shrink 9999 would apply to the 48-cap phase
    # and clamp it to the one-tile floor (overflow / dropped samples)
    paired = run(phase_bounces=(4, 48), phase_shrink=(9999, 1))
    assert int(paired[4]) == 0
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(paired[0]))


def test_packed_leaf_rows_bitwise_identical():
    """Packed leaf rows (scene.compile.build_packed_trace_rows): at EQUAL
    tree shape (leaf_size=N unpacked vs packed_leaf=N), the in-row strict-
    min-t earliest-tie tournament reproduces the sequential per-prim walk
    exactly — images must be bitwise identical across every walker variant
    (spec, grouped, plain, HBM DMA) and the any-hit/shadow path."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs_p = scene_to_device(compile_scene(scene, packed_leaf=4))
    cs_u = scene_to_device(compile_scene(scene, packed_leaf=0, leaf_size=4))
    assert cs_p.mega_packed_static and not cs_u.mega_packed_static

    W, H = 64, 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32))

    variants = [
        dict(packet=128, groups=1),                       # spec walker
        dict(packet=256, groups=2),                       # grouped spec
        dict(packet=128, groups=1, spec=False),           # plain walker
        dict(packet=128, groups=1, spec=False, table_in_hbm=True),  # DMA
    ]
    for kw in variants:
        out_p = render_tiles(cs_p, px, py, seeds, width=W, height=H,
                             max_bounces=12, interpret=True, **kw)
        out_u = render_tiles(cs_u, px, py, seeds, width=W, height=H,
                             max_bounces=12, interpret=True, **kw)
        for a, b in zip(out_p[:3], out_u[:3]):
            assert np.array_equal(np.asarray(a), np.asarray(b)), kw


def test_packed3_leaf_rows_ulp_identical():
    """PACKED3 (32-wide, 3 prims/row) recomputes plane normals in-kernel,
    which contracts differently from the numpy bake — winners match the
    unpacked equal-tree walk but t/u/v shift by ULPs. Radiance must agree
    to float-noise tolerance; winner identity (hit mask) must be exact."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs_p = scene_to_device(compile_scene(scene, packed_leaf=3))
    cs_u = scene_to_device(compile_scene(scene, packed_leaf=0, leaf_size=3))
    assert cs_p.mega_packed_static == 3
    assert cs_p.trace_rows_mega.shape[1] == 32

    W = H = 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32))

    tp, np_p, dp, _ = render_tiles(cs_p, px, py, seeds, width=W, height=H,
                                   max_bounces=12, interpret=True,
                                   packet=128, groups=1)
    tu, np_u, du, _ = render_tiles(cs_u, px, py, seeds, width=W, height=H,
                                   max_bounces=12, interpret=True,
                                   packet=128, groups=1)
    assert np.allclose(np.asarray(tp), np.asarray(tu), atol=1e-4, rtol=1e-3)
    # same winners: depth differs only by the ULP-shifted t of the SAME prim
    assert np.allclose(np.asarray(dp), np.asarray(du), atol=1e-4)


def test_packed12_leaf_rows_ulp_identical():
    """PACKED12 (128-wide, 12 prims/row, full HBM DMA width) recomputes
    plane normals in-kernel like PACKED3 — winners match the unpacked
    equal-tree walk but t/u/v shift by ULPs. Covers the spec, grouped, and
    HBM-DMA walkers (the format's target mode)."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs_p = scene_to_device(compile_scene(scene, packed_leaf=12))
    cs_u = scene_to_device(compile_scene(scene, packed_leaf=0, leaf_size=12))
    assert cs_p.mega_packed_static == 12
    assert cs_p.trace_rows_mega.shape[1] == 128

    W, H = 64, 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32))

    variants = [
        dict(packet=128, groups=1),                       # spec walker
        dict(packet=256, groups=2),                       # grouped spec
        dict(packet=128, groups=1, spec=False, table_in_hbm=True),  # DMA
    ]
    for kw in variants:
        tp, np_p, dp, _ = render_tiles(cs_p, px, py, seeds, width=W, height=H,
                                       max_bounces=12, interpret=True, **kw)
        tu, np_u, du, _ = render_tiles(cs_u, px, py, seeds, width=W, height=H,
                                       max_bounces=12, interpret=True, **kw)
        # first-hit AOVs are RNG-free: ULP-class only
        assert np.allclose(np.asarray(dp), np.asarray(du), atol=1e-4), kw
        assert np.allclose(np.asarray(np_p), np.asarray(np_u), atol=1e-4), kw
        # radiance: an ULP-shifted t can flip a later RNG decision (RR /
        # dielectric) on isolated paths — the same class as the oracle
        # silhouette reroutes (docs/PARITY.md). Bound the rerouted set and
        # require everything else to match to float noise.
        tp, tu = np.asarray(tp), np.asarray(tu)
        bad = ~np.isclose(tp, tu, atol=1e-4, rtol=1e-3).all(axis=1)
        assert bad.sum() <= N // 256, (kw, bad.sum())
        assert abs(tp.mean() - tu.mean()) < 1e-3 * max(tu.mean(), 1e-6), kw


def test_grouped_hbm_walker_bitwise():
    """The grouped DMA-pipelined HBM walker (G in-flight row copies) visits
    exactly the rows the grouped spec walker visits at the same G — per-lane
    accept semantics are walker-independent, so images must be BITWISE
    identical between grouped-HBM and grouped-VMEM-spec on the same table,
    for both classic and PACKED12 formats."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()

    W, H = 64, 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32))

    for pl in (0, 12):
        cs = scene_to_device(compile_scene(scene, packed_leaf=pl))
        out_h = render_tiles(cs, px, py, seeds, width=W, height=H,
                             max_bounces=12, interpret=True,
                             packet=256, groups=2, spec=False,
                             table_in_hbm=True)
        out_v = render_tiles(cs, px, py, seeds, width=W, height=H,
                             max_bounces=12, interpret=True,
                             packet=256, groups=2, spec=True)
        for a, b in zip(out_h[:3], out_v[:3]):
            assert np.array_equal(np.asarray(a), np.asarray(b)), pl


def test_packed_auto_gate():
    """packed_leaf='auto' packs only scenes headed for HBM streaming; cbox
    (VMEM-resident, measured 0.91x packed) stays unpacked. Packing requires
    the analytic (triangle-only-table) specialization — cbox+spheres."""
    from hijiki_tpu.scene.compile import compile_scene
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    assert not compile_scene(scene).mega_packed_static
    assert compile_scene(scene, packed_leaf=4).mega_packed_static

    # a scene whose unpacked table would exceed the VMEM budget gets the
    # 64-wide PACKED4 HBM format automatically (on-chip winner, §9z)
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from bigscene_probe import tri_soup_scene

    # 250k tris: est 1.5 rows/tri x 128 B ~= 48 MB >> the 8 MB VMEM
    # table budget (~44k tris; bigger tables cannot co-reside with the
    # walker's ~56 MiB scratch under the 64 MiB scoped limit)
    big = compile_scene(tri_soup_scene(250_000))
    assert big.mega_packed_static == 4
    assert big.trace_rows_mega.shape[1] == 64


def test_slim_leaf_rows_ulp_identical():
    """SLIM (16-wide, 1 prim/row, slot-indexed 2-row payload) walks the
    SAME tree as the unpacked default — only the in-kernel normal recompute
    shifts t/u/v by ULPs. Radiance and AOVs must agree to float noise."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    # pin octants off for both: the auto gate is per-format FOOTPRINT
    # (8 * actual row bytes vs the VMEM staging limit), so cbox's 64 B SLIM
    # rows qualify for octant sets while its 128 B classic rows don't —
    # the "same tree" premise of this test needs both single-flattened
    cs_s = scene_to_device(compile_scene(scene, packed_leaf=1,
                                         octant_tables="never"))
    cs_u = scene_to_device(compile_scene(scene, packed_leaf=0,
                                         octant_tables="never"))
    assert cs_s.mega_packed_static == 1
    assert cs_s.trace_rows_mega.shape[1] == 16
    # the point of SLIM is fetch width: the WALK section (what the inner
    # loop touches) is half the bytes of the classic table; the slot-indexed
    # payload section makes the total slightly larger, but it is only read
    # once per winner in the resolve loop
    assert cs_s.mega_tbl_rows * 16 * 4 < cs_u.trace_rows_mega.nbytes

    W = H = 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32))

    for kw in (dict(packet=128, groups=1), dict(packet=128, groups=1, spec=False)):
        ts, ns, ds, _ = render_tiles(cs_s, px, py, seeds, width=W, height=H,
                                     max_bounces=12, interpret=True, **kw)
        tu, nu, du, _ = render_tiles(cs_u, px, py, seeds, width=W, height=H,
                                     max_bounces=12, interpret=True, **kw)
        assert np.allclose(np.asarray(ts), np.asarray(tu), atol=1e-4, rtol=1e-3), kw
        assert np.allclose(np.asarray(ds), np.asarray(du), atol=1e-4), kw


def test_shadow_cache_bitwise_identical(setup):
    """The shadow-ray occlusion cache only ever VERIFIES predictions
    (_anyhit_pretest runs the walker's exact occlusion predicate via
    _prim_test), so shadow_cache on/off must be bitwise-identical — the §9k
    exactness contract, and the regression net for the pretest's shared
    prim-test path."""
    from hijiki_tpu.ops.pallas_megakernel import render_tiles

    cs, W, H, px, py, seeds = setup
    a = render_tiles(
        cs, px, py, seeds, width=W, height=H, max_bounces=16,
        interpret=True, shadow_cache=False,
    )
    b = render_tiles(
        cs, px, py, seeds, width=W, height=H, max_bounces=16,
        interpret=True, shadow_cache=True,
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_shadow_cache_skip_all_rejected(setup):
    """shadow_skip_all stubs the shadow result dict the cache update reads;
    the combination must fail fast with a clear error, not a trace-time
    KeyError."""
    import pytest

    from hijiki_tpu.ops.pallas_megakernel import render_waves

    cs, W, H, px, py, seeds = setup
    with pytest.raises(ValueError, match="shadow_skip_all"):
        render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=4,
            interpret=True, shadow_cache=True, shadow_skip_all=True,
        )


def test_hbm_trunk_cache_bitwise():
    """The VMEM trunk cache (first-K-rows copy serving the walk's low-row
    fetches; ops/pallas_megakernel._with_hbm_bufs) is a pure fetch-source
    change: the threaded walk's cursor is strictly increasing, so the walk
    splits exactly into a VMEM phase and a DMA phase with identical per-lane
    visit sequences. Images must be BITWISE identical to the trunk-less HBM
    walker for partial trunks, full-walk-section trunks (DMA phase skipped
    statically), grouped walkers, and both row formats."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()

    W, H = 64, 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32))

    for pl in (0, 12):
        # single-table flatten: the trunk is only defined for ntab == 1
        # (octant table sets would need 8 trunks; HBM scenes skip octants)
        cs = scene_to_device(
            compile_scene(scene, packed_leaf=pl, octant_tables="never")
        )
        for trunk, shape_kw in (
            (64, {}),                       # partial: both phases run
            (1 << 30, {}),                  # full walk section: DMA skipped
            (128, dict(groups=2, packet=256)),
        ):
            # the trunk-less reference must share packet/groups: packet
            # composition changes t-tie winners (PERF_NOTES §9d); the trunk
            # itself may not
            base = render_tiles(cs, px, py, seeds, width=W, height=H,
                                max_bounces=12, interpret=True,
                                spec=False, table_in_hbm=True, **shape_kw)
            out = render_tiles(cs, px, py, seeds, width=W, height=H,
                               max_bounces=12, interpret=True,
                               spec=False, table_in_hbm=True,
                               trunk_rows=trunk, **shape_kw)
            for a, b in zip(base[:3], out[:3]):
                assert np.array_equal(np.asarray(a), np.asarray(b)), (
                    pl, trunk, shape_kw,
                )


def test_shadow_table_bitwise(setup):
    """The dedicated any-hit shadow table (scene.compile PACKED3
    flattening, no payload; round-4 verdict #1) must leave every image
    output BITWISE identical: occlusion per lane is the same boolean OR
    over the same prim set with the same per-prim f32 test, and any-hit
    is order-independent. Only the rows diagnostic may change (the point:
    fewer shadow row visits — sim 1.36-1.59x, tools/sim_shadow_walk.py)."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles, render_waves

    cs, W, H, px, py, seeds = setup
    assert cs.shadow_rows_mega is not None
    a = render_tiles(cs, px, py, seeds, width=W, height=H, max_bounces=16,
                     interpret=True)
    b = render_tiles(cs, px, py, seeds, width=W, height=H, max_bounces=16,
                     interpret=True, shadow_tbl=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    wa = render_waves(cs, px, py, seeds, width=W, height=H, max_bounces=16,
                      interpret=True)
    wb = render_waves(cs, px, py, seeds, width=W, height=H, max_bounces=16,
                      interpret=True, shadow_tbl=True)
    names = ["total", "normal", "depth", "state", "overflow", "bounces",
             "rows", "albedo"]
    for n, (x, y) in zip(names, zip(wa, wb)):
        if n == "rows":
            continue  # the traversal-work diagnostic legitimately shrinks
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_shadow_table_random_scene_bitwise():
    """Shadow-table equality on a random mixed scene (quads/spheres in the
    analytic bake + triangle soup) and with the grouped spec walker."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from test_fuzz_oracle import random_scene

    scene = random_scene(91)
    cs = scene_to_device(compile_scene(scene))
    assert cs.shadow_rows_mega is not None
    W, H = 64, 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32))
    for kw in ({}, dict(groups=2, packet=256), dict(spec=False)):
        a = render_tiles(cs, px, py, seeds, width=W, height=H,
                         max_bounces=12, interpret=True, **kw)
        b = render_tiles(cs, px, py, seeds, width=W, height=H,
                         max_bounces=12, interpret=True, shadow_tbl=True, **kw)
        for x_, y_ in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x_), np.asarray(y_)), kw


def test_shadow_table_validation(setup):
    """shadow_tbl is VMEM-only, needs a compiled table, and excludes the
    main-table shadow cache."""
    import pytest as _pytest

    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.render.renderer import resolve_shadow_tbl

    cs, W, H, px, py, seeds = setup
    with _pytest.raises(ValueError, match="VMEM-only"):
        render_tiles(cs, px, py, seeds, width=W, height=H, interpret=True,
                     shadow_tbl=True, table_in_hbm=True)
    with _pytest.raises(ValueError, match="shadow_cache"):
        render_tiles(cs, px, py, seeds, width=W, height=H, interpret=True,
                     shadow_tbl=True, shadow_cache=True)
    import dataclasses as _dc

    no_tbl = _dc.replace(cs, shadow_rows_mega=None, shadow_tbl_rows_static=0)
    with _pytest.raises(ValueError, match="dedicated shadow"):
        render_tiles(no_tbl, px, py, seeds, width=W, height=H,
                     interpret=True, shadow_tbl=True)

    # resolver: auto is OFF everywhere — the on-chip A/B measured the
    # shadow table a dead end (PERF_NOTES §12); explicit 1 still forces it
    assert resolve_shadow_tbl(0, False, cs) is False
    assert resolve_shadow_tbl(0, True, cs) is False
    assert resolve_shadow_tbl(0, False, no_tbl) is False
    assert resolve_shadow_tbl(-1, False, cs) is False
    assert resolve_shadow_tbl(1, False, no_tbl) is True
    import os

    os.environ["HIJIKI_SHADOW_TBL"] = "1"
    try:
        assert resolve_shadow_tbl(0, False, cs) is True
    finally:
        del os.environ["HIJIKI_SHADOW_TBL"]
    os.environ["HIJIKI_SHADOW_TBL"] = "-1"
    try:
        assert resolve_shadow_tbl(0, False, cs) is False
    finally:
        del os.environ["HIJIKI_SHADOW_TBL"]


def test_resolve_mega_trunk():
    """Auto trunk sizing: OFF by default (measured regression on-chip,
    PERF_NOTES §9z), explicit N honored, env override incl. the -2 legacy
    whole-walk auto, off for VMEM tables."""
    from hijiki_tpu.render.renderer import MEGA_TRUNK_BYTES, resolve_mega_trunk

    class S:
        def __init__(self, tbl_rows, ntab=1):
            self.mega_tbl_rows = tbl_rows
            self.mega_num_tables_static = ntab

    budget_rows = MEGA_TRUNK_BYTES // 512
    assert resolve_mega_trunk(0, False, S(100)) == 0          # VMEM table
    assert resolve_mega_trunk(0, True, S(100)) == 0           # auto = off (§9z)
    assert resolve_mega_trunk(-1, True, S(100)) == 0          # forced off
    assert resolve_mega_trunk(7, True, S(100)) == 7           # explicit
    import os
    os.environ["HIJIKI_MEGA_TRUNK"] = "33"
    try:
        assert resolve_mega_trunk(0, True, S(100)) == 33
    finally:
        del os.environ["HIJIKI_MEGA_TRUNK"]
    os.environ["HIJIKI_MEGA_TRUNK"] = "-2"  # legacy whole-walk auto
    try:
        assert resolve_mega_trunk(0, True, S(100)) == 100
        assert resolve_mega_trunk(0, True, S(10**9)) == budget_rows
        assert resolve_mega_trunk(0, True, S(100, ntab=8)) == 0
    finally:
        del os.environ["HIJIKI_MEGA_TRUNK"]

def test_hbm_window_bitwise():
    """The h-row window DMA walker (ops/pallas_megakernel.
    _traverse_hbm_window) serves in-window visits from scratch instead of
    issuing a new descriptor set per visit — a pure fetch-source change:
    per sublane-cursor the visited-row sequence and every accept predicate
    are identical to the single-row walk (PERF_NOTES §11). Images must be
    BITWISE identical to the window-less HBM walker across window heights,
    groupings, and row formats."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()

    W, H = 64, 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32))

    # octant table sets put the NEXT flattening's walk rows (real,
    # intersectable geometry) directly after each table's end, and packed
    # formats put payload rows (arbitrary shading floats in the prim/exit
    # columns) after the walk section — both are the non-benign
    # at-or-past-ends[g] neighborhoods the per-step bound must mask
    # (round-4 advisor finding: a cursor finishing mid-window must not
    # serve rows past its table end to later unrolled steps)
    # (4, "always") covers BOTH non-benign neighborhoods at once: payload
    # rows after the table set AND the next flattening's walk rows at each
    # in-set table seam
    for pl_, octants in ((0, "never"), (4, "never"), (4, "always")):
        cs = scene_to_device(
            compile_scene(scene, packed_leaf=pl_, octant_tables=octants)
        )
        for win, shape_kw in ((2, {}), (4, {}), (2, dict(groups=2, packet=256))):
            base = render_tiles(cs, px, py, seeds, width=W, height=H,
                                max_bounces=12, interpret=True,
                                spec=False, table_in_hbm=True, **shape_kw)
            out = render_tiles(cs, px, py, seeds, width=W, height=H,
                               max_bounces=12, interpret=True,
                               spec=False, table_in_hbm=True,
                               hbm_window=win, **shape_kw)
            for a, b in zip(base[:3], out[:3]):
                assert np.array_equal(np.asarray(a), np.asarray(b)), (
                    pl_, octants, win, shape_kw,
                )
