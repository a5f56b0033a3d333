"""Shadow-visibility boxes (scene/lightvis.py): soundness against the real
any-hit traversal, bitwise estimator equality, and the disable paths."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cbox():
    from hijiki_tpu.scene.compile import compile_scene, scene_to_device
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    return scene_to_device(compile_scene(scene))


def _emitter_samples(cs, rng, n):
    """Uniform area samples on every baked emitter (tri/quad)."""
    pts = []
    for bake in cs.emitter_bake_static:
        kind = int(bake[0])
        g = bake[6:]
        u1 = rng.random(n)
        u2 = rng.random(n)
        if kind == 2:  # triangle: geom = v0, v1, v2, normals
            a = np.asarray(g[0:3])
            b = np.asarray(g[3:6])
            c = np.asarray(g[6:9])
            over = u1 + u2 > 1.0
            u1 = np.where(over, 1.0 - u1, u1)
            u2 = np.where(over, 1.0 - u2, u2)
            p = (
                a[None, :]
                + u1[:, None] * (b - a)[None, :]
                + u2[:, None] * (c - a)[None, :]
            )
        elif kind == 1:  # quad: origin, e1, e2
            o = np.asarray(g[0:3])
            e1 = np.asarray(g[3:6])
            e2 = np.asarray(g[6:9])
            p = o[None, :] + u1[:, None] * e1[None, :] + u2[:, None] * e2[None, :]
        else:  # sphere emitters disable the grid; shouldn't reach here
            continue
        pts.append(p)
    return np.concatenate(pts, axis=0)


def test_boxes_exist_on_cbox(cbox):
    sv = cbox.shadow_vis_static
    assert sv and sv[0] >= 1
    assert len(sv) == 1 + 6 * int(sv[0])


def test_soundness_vs_anyhit_walk(cbox):
    """Random origins inside the proven boxes x random emitter samples:
    the REAL any-hit traversal must find zero occluders in the walk's
    [2*eps, dist-eps] window — the exactness contract of the skip."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.intersect import M_EPS, occluded_rows

    sv = cbox.shadow_vis_static
    K = int(sv[0])
    B = np.asarray(sv[1:]).reshape(K, 6)
    rng = np.random.default_rng(7)
    per_box = 64
    origins = []
    for k in range(K):
        lo, hi = B[k, :3], B[k, 3:]
        origins.append(lo + rng.random((per_box, 3)) * (hi - lo))
    o = np.concatenate(origins).astype(np.float32)
    lights = _emitter_samples(cbox, rng, len(o)).astype(np.float32)
    reps = len(lights) // len(o)  # one sample batch per emitter
    o = np.tile(o, (reps, 1))
    v = lights - o
    dist = np.linalg.norm(v, axis=1)
    d = v / dist[:, None]
    occ = occluded_rows(
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.full((len(o),), np.float32(2.0 * M_EPS)),
        jnp.asarray((dist - M_EPS).astype(np.float32)),
        scene=cbox,
    )
    bad = np.flatnonzero(np.asarray(occ))
    assert bad.size == 0, f"occluded origins in proven boxes: {o[bad[:5]]}"


def test_bitwise_equal_film(cbox):
    """shadow_vis on/off: identical total/normal/depth/state bit for bit
    (the skip only ever replaces a walk that would have returned 0 hits)."""
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_waves

    W = H = 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray(
        (np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32)
    )
    outs = {}
    for sv in (True, False):
        outs[sv] = render_waves(
            cbox, px, py, seeds, width=W, height=H, max_bounces=16,
            interpret=True, shadow_vis=sv,
        )
    for i in (0, 1, 2, 3):  # total, normal, depth, state
        np.testing.assert_array_equal(
            np.asarray(outs[True][i]), np.asarray(outs[False][i])
        )


def test_sphere_emitter_disables():
    from hijiki_tpu.scene.lightvis import build_shadow_vis_boxes

    # one sphere emitter: the planar-hull argument does not apply
    aabb_min = np.array([[-1.0, -1, -1], [0.4, 0.4, 0.4]], np.float32)
    aabb_max = np.array([[1.0, 1, 1], [0.6, 0.6, 0.6]], np.float32)
    kind = np.array([0, 0], np.int32)
    a = np.array([[0.0, 0, 0], [0.5, 0.5, 0.5]], np.float32)
    b = np.array([[1.0, 0, 0], [0.1, 0, 0]], np.float32)
    c = np.zeros((2, 3), np.float32)
    out = build_shadow_vis_boxes(
        aabb_min, aabb_max, kind, a, b, c,
        np.array([1]), 0, 1, 2,
    )
    assert out is None


def test_empty_emitters_disables():
    from hijiki_tpu.scene.lightvis import build_shadow_vis_boxes

    out = build_shadow_vis_boxes(
        np.zeros((1, 3), np.float32), np.ones((1, 3), np.float32),
        np.array([2]), np.zeros((1, 3), np.float32),
        np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32),
        np.array([], np.int64), 0, 1, 2,
    )
    assert out is None


def test_cache_roundtrip(tmp_path, monkeypatch):
    """Second build with identical inputs comes from the disk cache and
    is identical."""
    monkeypatch.setenv("HIJIKI_CACHE_DIR", str(tmp_path))
    from hijiki_tpu.scene.lightvis import build_shadow_vis_boxes

    rng = np.random.default_rng(3)
    # an open scene: one quad light high up, one floor quad below
    a = np.array([[-1, 2.0, -1], [-5, 0.0, -5]], np.float32)
    b = np.array([[2, 0, 0], [10, 0, 0]], np.float32)
    c = np.array([[0, 0, 2], [0, 0, 10]], np.float32)
    aabb_min = np.minimum(np.minimum(a, a + b), np.minimum(a + c, a + b + c))
    aabb_max = np.maximum(np.maximum(a, a + b), np.maximum(a + c, a + b + c))
    kind = np.array([1, 1], np.int32)
    args = (aabb_min, aabb_max, kind, a, b, c, np.array([0]), 0, 1, 2)
    out1 = build_shadow_vis_boxes(*args, target=512)
    out2 = build_shadow_vis_boxes(*args, target=512)
    assert out1 == out2
    assert out1 and out1[0] >= 1


def test_offset_scene_f32_rounded_bounds_sound():
    """Scenes far from the origin: the proof dilation must cover the
    kernel's f32 rounding of the baked box bounds (which scales with
    coordinate MAGNITUDE, not scene extent). Origins placed at the
    f32-ROUNDED box faces — exactly what the in-kernel membership compare
    admits — must still be unoccluded toward every emitter sample."""
    from hijiki_tpu.scene.compile import compile_scene
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    OFF = np.array([500.0, 0.0, 0.0], np.float32)
    scene.positions = scene.positions + OFF
    for shape, _ in scene.objects:
        if hasattr(shape, "position"):
            shape.position = tuple(np.asarray(shape.position) + OFF)
        if hasattr(shape, "origin"):
            shape.origin = tuple(np.asarray(shape.origin) + OFF)
    cs = compile_scene(scene)
    sv = cs.shadow_vis_static
    assert sv, "offset cbox must still prove boxes"
    K = int(sv[0])
    B = np.asarray(sv[1:], np.float32).reshape(K, 6)  # the kernel's bounds

    # brute-force occlusion oracle in f64 over all triangles
    a = np.asarray(cs.prim_a, np.float64)
    b = np.asarray(cs.prim_b, np.float64)
    c = np.asarray(cs.prim_c, np.float64)
    kind = np.asarray(cs.prim_kind)
    tri = kind == 2
    a, b, c = a[tri], b[tri], c[tri]
    n = np.cross(b, c)

    rng = np.random.default_rng(11)
    origins = []
    for k in range(K):
        lo, hi = B[k, :3].astype(np.float64), B[k, 3:].astype(np.float64)
        mid = rng.random((24, 3)) * (hi - lo) + lo
        for ax in range(3):
            fa, fb = mid.copy(), mid.copy()
            fa[:, ax] = lo[ax]  # exactly the f32-rounded face
            fb[:, ax] = hi[ax]
            origins += [fa, fb]
    o = np.concatenate(origins)
    lights = _emitter_samples(cs, rng, len(o))
    o = np.tile(o, (len(lights) // len(o), 1))
    v = lights - o
    dist = np.linalg.norm(v, axis=1)
    d = v / dist[:, None]

    eps = 1e-4
    occ = np.zeros(len(o), bool)
    for i in range(len(a)):
        dn = d @ n[i]
        with np.errstate(divide="ignore", invalid="ignore"):
            rr = o - a[i]
            q = np.cross(rr, d)
            dd = 1.0 / dn
            uu = -dd * (q @ c[i])
            vv = dd * (q @ b[i])
            tt = -dd * (rr @ n[i])
        occ |= (
            (uu >= 0) & (vv >= 0) & (uu + vv <= 1.0)
            & (tt >= 2 * eps) & (tt <= dist - eps)
        )
    bad = np.flatnonzero(occ)
    assert bad.size == 0, f"occluded origins at f32 box faces: {o[bad[:5]]}"
