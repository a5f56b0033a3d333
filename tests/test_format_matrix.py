"""Format x walker fuzz matrix (round-4 verdict #5): every trace-row
format through every fetch path on random scenes, bitwise within a
format/packet shape, sum-gated across formats vs the XLA sync integrator.
Lives in its own file so the xdist loadfile scheduler gives the matrix its
own worker (tests/run_suite.sh)."""

import numpy as np
import pytest

from hijiki_tpu.scene.compile import compile_scene, scene_to_device
from hijiki_tpu.scene.model import Camera, Diffuse, Emissive, Quad, Scene

from test_fuzz_oracle import _add_tri, random_scene


def _mega_film(cs, W, H, seeds_np, **kw):
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles

    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.37).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.61).ravel().astype(np.float32))
    seeds = jnp.asarray(seeds_np)
    total, normal, depth, state = render_tiles(
        cs, px, py, seeds, width=W, height=H, max_bounces=8,
        interpret=True, spec=False, **kw
    )
    return np.asarray(total), np.asarray(state)


@pytest.mark.parametrize("scene_seed", [77, 123])
@pytest.mark.parametrize("packed_leaf", [0, 1, 3, 4, 12])
def test_format_walker_matrix(scene_seed, packed_leaf):
    """Format × walker fuzz matrix on random scenes (round-4 verdict #5):
    every trace-row format {classic, SLIM, PACKED3, PACKED4, PACKED12}
    must produce the SAME image through every fetch path {VMEM,
    forced-HBM, HBM window h=2, HBM grouped G=2} — the fetch source is
    not allowed to change a single visited row or accept predicate
    (bitwise gates within a format/packet shape) — and every format must
    agree with the XLA sync integrator's radiance up to t-tie packet
    reordering (sum gate). This is the matrix that catches the §11b
    garbage-exit / window-overshoot class on unusual scenes before
    hardware does."""
    from hijiki_tpu.ops.integrate import integrate
    from hijiki_tpu.ops.rng import seed_rng

    scene = random_scene(scene_seed)
    cs = scene_to_device(
        compile_scene(scene, packed_leaf=packed_leaf, octant_tables="never")
    )
    W, H = 64, 32  # two (8,128) tiles = one (8,256) grouped tile
    N = W * H
    seeds_np = (np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32)

    vmem, state_v = _mega_film(cs, W, H, seeds_np)
    if packed_leaf != 1:  # SLIM tables are VMEM-only (resolve pay fetch)
        hbm, state_h = _mega_film(cs, W, H, seeds_np, table_in_hbm=True)
        win2, state_w = _mega_film(cs, W, H, seeds_np, table_in_hbm=True,
                                   hbm_window=2)

        # fetch-source changes must be invisible: bitwise across walkers
        np.testing.assert_array_equal(state_v, state_h)
        np.testing.assert_array_equal(vmem, hbm)
        np.testing.assert_array_equal(state_h, state_w)
        np.testing.assert_array_equal(hbm, win2)

        # grouped walker rebuilds packets (t-tie winners may move) — gate
        # the estimate, not the bits
        grp, _ = _mega_film(cs, W, H, seeds_np, table_in_hbm=True, groups=2,
                            packet=256)
        assert abs(grp.sum() - vmem.sum()) <= 1e-3 * abs(vmem.sum()) + 1e-6

    # cross-check the estimator against the sync (XLA) integrator
    y, x = np.mgrid[0:H, 0:W]
    import jax.numpy as jnp

    pxy = jnp.stack(
        [jnp.asarray((x + 0.37).ravel(), jnp.float32),
         jnp.asarray((y + 0.61).ravel(), jnp.float32)], -1
    )
    from hijiki_tpu.ops.camera import camera_rays as _crays

    o, d, tmin, tmax = _crays(
        cs.cam_position, cs.cam_rotation, cs.cam_fov, pxy,
        jnp.asarray([W, H], jnp.float32),
    )
    out = integrate(cs, o, d, tmin, tmax, seed_rng(jnp.asarray(seeds_np)),
                    max_bounces=8, traversal="rows")
    ref = np.asarray(out.total)
    assert abs(vmem.sum() - ref.sum()) <= 1e-3 * abs(ref.sum()) + 1e-6


def test_window_taller_than_table():
    """A scene whose walk table has fewer rows than the DMA window height
    must not produce negative / out-of-bounds DMA slice starts (round-4
    advisor finding: _dma_rows8 clamped to num_rows - h, which went
    negative for tiny tables; the walker now also caps h at the table
    size). Image must be bitwise-identical to the windowless walk."""
    scene = Scene(camera=Camera.cbox_default())
    m_em = scene.add_material(Emissive((10.0, 10.0, 10.0)))
    m_diff = scene.add_material(Diffuse((0.6, 0.5, 0.4)))
    scene.add_object(
        Quad((-0.4, 1.95, -0.4), (0.8, 0.0, 0.0), (0.0, 0.0, 0.8)), m_em
    )
    rng = np.random.default_rng(7)
    _add_tri(scene, rng, np.array([0.0, 0.9, 0.0]), m_diff)
    cs = scene_to_device(compile_scene(scene, octant_tables="never"))
    W = H = 32  # one full (8,128) tile
    N = W * H
    seeds_np = (np.arange(N) * 2654435761 % (1 << 32)).astype(np.uint32)
    base, state_b = _mega_film(cs, W, H, seeds_np, table_in_hbm=True)
    for h in (4, 64):
        out, state_o = _mega_film(cs, W, H, seeds_np, table_in_hbm=True,
                                  hbm_window=h)
        np.testing.assert_array_equal(state_b, state_o)
        np.testing.assert_array_equal(base, out)


