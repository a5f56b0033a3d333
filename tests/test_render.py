"""End-to-end renders: cbox smoke, determinism, BVH A/B, checkpoint/resume."""

import numpy as np
import pytest

from hijiki_tpu.render.renderer import RenderConfig, Renderer


@pytest.fixture(scope="module")
def cbox_small():
    import copy

    from hijiki_tpu.scene.compile import compile_scene
    from hijiki_tpu.scene.obj import load_obj_scene

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    return compile_scene(scene)


def _cfg(**kw):
    base = dict(
        width=32,
        height=32,
        spp=2,
        block_size=64,
        seed=7,
        max_bounces=16,
        preview_interval=0,
    )
    base.update(kw)
    return RenderConfig(**base)


@pytest.mark.quick
def test_e2e_cbox(cbox_small, tmp_path):
    r = Renderer(cbox_small, _cfg())
    metrics = r.render()
    img = r.image()
    assert img.shape == (32, 32, 3)
    assert np.all(np.isfinite(img))
    assert np.all(np.asarray(r.film[..., 3]) > 0)  # every pixel got weight
    mean = float(img.mean())
    assert 0.02 < mean < 3.0, f"implausible mean radiance {mean}"
    # light region (top center) should be the brightest area
    assert img[2:6, 12:20].mean() > img.mean()
    assert metrics["rays_per_second"] > 0
    r.save_exr(str(tmp_path / "out.exr"))
    r.save_png(str(tmp_path / "out.png"))
    from hijiki_tpu.utils.exr import read_exr

    np.testing.assert_array_equal(read_exr(str(tmp_path / "out.exr")), img)


@pytest.mark.quick
def test_deterministic(cbox_small):
    r1 = Renderer(cbox_small, _cfg())
    r1.render()
    r2 = Renderer(cbox_small, _cfg())
    r2.render()
    np.testing.assert_array_equal(np.asarray(r1.film), np.asarray(r2.film))


def test_bvh_vs_brute_render(cbox_small):
    cfg_a = _cfg(width=24, height=24, spp=1, use_bvh=True)
    cfg_b = _cfg(width=24, height=24, spp=1, use_bvh=False)
    ra = Renderer(cbox_small, cfg_a)
    ra.render()
    rb = Renderer(cbox_small, cfg_b)
    rb.render()
    # BVH and brute-force visit primitives in different orders, so exact-t
    # ties (shared triangle edges) may pick different winners on a handful of
    # pixels; require agreement everywhere up to a small absolute tolerance.
    np.testing.assert_allclose(
        np.asarray(ra.film), np.asarray(rb.film), rtol=0, atol=2e-3
    )


def test_checkpoint_resume(cbox_small, tmp_path):
    import dataclasses

    cfg = _cfg(spp=4)
    straight = Renderer(cbox_small, cfg)
    straight.render()

    # emulate an interrupted 4-spp render checkpointed at sweep 2
    half = Renderer(cbox_small, dataclasses.replace(cfg, spp=2))
    half.render()
    ckpt = str(tmp_path / "ck.npz")
    half.config = cfg
    half.save_checkpoint(ckpt)
    resumed = Renderer.resume_checkpoint(cbox_small, ckpt)
    assert resumed.sweeps_done == 2
    resumed.render()
    np.testing.assert_array_equal(np.asarray(resumed.film), np.asarray(straight.film))


def test_fixed_albedo_mode(cbox_compiled):
    """SURVEY §7 quirk 4: parity mode keeps the albedo AOV zero; fixed mode
    populates it and activates the denoiser's albedo feature term."""
    import jax.numpy as jnp
    import numpy as np

    from hijiki_tpu.render.blocks import per_pixel_seeds
    from hijiki_tpu.render.renderer import render_sweep

    W = H = 64
    seeds = jnp.asarray(
        per_pixel_seeds(W, H, 64, np.array([[12345]], np.uint32))
    )
    offset = jnp.asarray(np.array([0.3, 0.7], np.float32))
    kw = dict(width=W, height=H, block_size=64, use_bvh=True, max_bounces=8,
              radius=2, stddev=0.5, leaf_size=1, driver="sync")
    d0, _ = render_sweep(cbox_compiled, seeds, offset, **kw)
    d1, _ = render_sweep(cbox_compiled, seeds, offset, fixed_albedo=True, **kw)
    d0, d1 = np.asarray(d0), np.asarray(d1)
    assert np.isfinite(d1).all()
    # the albedo feature reweights the bilateral splat: same rays, different
    # filter weights -> images differ but agree in overall level
    assert (d0 != d1).any()
    m0 = d0[..., :3].sum() / max(d0[..., 3].sum(), 1e-6)
    m1 = d1[..., :3].sum() / max(d1[..., 3].sum(), 1e-6)
    assert abs(m0 - m1) / max(m0, 1e-6) < 0.1


def test_mega_table_limit_fallback():
    """Scenes whose trace table exceeds the megakernel's VMEM budget keep
    the mega driver but stream the table from HBM (the walker's DMA mode)
    instead of failing the device compile."""
    import numpy as np

    from hijiki_tpu.render import renderer as rmod
    from hijiki_tpu.render.renderer import RenderConfig, Renderer
    from hijiki_tpu.scene.compile import compile_scene
    from hijiki_tpu.scene.model import Camera, Diffuse, Emissive, Quad, Scene, Triangle

    s = Scene(camera=Camera.cbox_default())
    white = s.add_material(Diffuse((0.7, 0.7, 0.7)))
    light = s.add_material(Emissive((10.0,) * 3))
    s.add_object(Quad((-0.5, 2.8, -0.5), (1, 0, 0), (0, 0, 1)), light)
    rng = np.random.default_rng(0)
    n = 256
    ctr = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    s.positions = np.concatenate([ctr, ctr + 0.01, ctr + 0.02]).astype(np.float32)
    s.normals = np.tile(np.array([[0, 1, 0]], np.float32), (3 * n, 1))
    s.uvs = np.zeros((3 * n, 2), np.float32)
    for i in range(n):
        s.add_object(Triangle((i, n + i, 2 * n + i)), white)
    cs = compile_scene(s)

    old = rmod.MEGA_TABLE_LIMIT_BYTES
    rmod.MEGA_TABLE_LIMIT_BYTES = 1024  # force the limit
    try:
        r = Renderer(cs, RenderConfig(width=64, height=64, spp=1, driver="mega"))
        assert r.config.driver == "mega"
        assert r._mega_table_hbm
    finally:
        rmod.MEGA_TABLE_LIMIT_BYTES = old

    # the HBM table path produces the exact VMEM-path image (interpret)
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_tiles
    from hijiki_tpu.scene.compile import scene_to_device

    csd = scene_to_device(cs)
    W = H = 32
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((xx + 0.5).reshape(-1))
    py = jnp.asarray((yy + 0.5).reshape(-1))
    seeds = jnp.asarray(np.arange(H * W, dtype=np.uint32) * np.uint32(2654435761))
    outs = {}
    for hbm in (False, True):
        t, *_ = render_tiles(csd, px, py, seeds, width=W, height=H,
                             max_bounces=4, interpret=True, table_in_hbm=hbm)
        outs[hbm] = np.asarray(t)
    np.testing.assert_array_equal(outs[False], outs[True])


def test_fixed_albedo_mega_matches_sync(cbox_compiled):
    """The megakernel's captured first-hit albedo agrees with the XLA
    integrator's base_color (fixed-albedo mode, interpret kernels on CPU)."""
    import jax.numpy as jnp
    import numpy as np

    from hijiki_tpu.ops.camera import camera_rays
    from hijiki_tpu.ops.integrate import integrate
    from hijiki_tpu.ops.pallas_megakernel import render_waves
    from hijiki_tpu.ops.rng import seed_rng

    cs = cbox_compiled
    W = H = 32
    N = W * H
    y, x = np.mgrid[0:H, 0:W]
    px = jnp.asarray((x + 0.5).ravel().astype(np.float32))
    py = jnp.asarray((y + 0.5).ravel().astype(np.float32))
    seeds = jnp.asarray((np.arange(N) * 747796405 % (1 << 32)).astype(np.uint32))
    out = render_waves(cs, px, py, seeds, width=W, height=H, max_bounces=4,
                       phase_bounces=(), interpret=True)
    alb_mega = np.asarray(out[7])
    pxy = jnp.stack([px, py], -1)
    o, d, tmin, tmax = camera_rays(
        cs.cam_position, cs.cam_rotation, cs.cam_fov, pxy,
        jnp.asarray([W, H], jnp.float32),
    )
    ref = integrate(cs, o, d, tmin, tmax, seed_rng(seeds), max_bounces=4,
                    traversal="rows", albedo_aov=True)
    alb_sync = np.asarray(ref.albedo)
    assert alb_mega.max() > 0.1  # walls captured
    np.testing.assert_allclose(alb_mega, alb_sync, rtol=1e-4, atol=1e-5)


def test_golden_cbox_statistics(cbox_compiled):
    """Golden-image regression: a fixed-seed 32x32@16spp cbox render's
    statistics, pinned across sessions/refactors. The cross-implementation
    tests prove oracle == XLA == Pallas *relative* equality; this pins the
    *absolute* estimator against silent drift. Values recorded on the CPU
    backend (mean 0.1333, TPU agrees to ~3e-6 — f32 ULP noise only)."""
    import numpy as np

    from hijiki_tpu.render.renderer import RenderConfig, Renderer

    r = Renderer(
        cbox_compiled,
        RenderConfig(width=32, height=32, spp=16, block_size=64, seed=7,
                     driver="sync", max_bounces=16),
    )
    r.render()
    img = r.image()
    assert abs(float(img.mean()) - 0.133258) < 5e-4
    q = np.quantile(img, [0.1, 0.5, 0.9])
    np.testing.assert_allclose(q, [0.0, 0.030775, 0.209008], atol=2e-3)


def test_device_seed_expansion_bitwise():
    """per_pixel_seeds_device must reproduce the host expansion bitwise,
    including non-multiple image sizes (edge-block clipped widths)."""
    import jax.numpy as jnp
    import numpy as np

    from hijiki_tpu.render.blocks import per_pixel_seeds, per_pixel_seeds_device

    rng = np.random.default_rng(3)
    for (W, H, B) in [(256, 128, 64), (130, 70, 64), (96, 96, 64)]:
        bw, bh = -(-W // B), -(-H // B)
        bs = rng.integers(0, 1 << 32, (bh, bw), dtype=np.uint32)
        a = np.asarray(per_pixel_seeds(W, H, B, bs))
        b = np.asarray(per_pixel_seeds_device(W, H, B, jnp.asarray(bs)))
        np.testing.assert_array_equal(a, b)


def test_renderer_chained_sweeps_match_unchained(cbox_small):
    """Renderer with chain_sweeps=2 (chained chunk of 2 + a single tail
    sweep at spp=3) must reproduce the unchained film. Chaining is
    estimator-exact per (pixel, sweep) sample (PERF_NOTES §9o), so on the
    interpret backend the films match to reconstruction-accumulation
    rounding."""
    import hijiki_tpu.ops.pallas_megakernel as mk
    import hijiki_tpu.render.pallas_reconstruct as pr

    cfg = dict(width=64, height=64, spp=3, block_size=64, seed=11,
               driver="mega", max_bounces=8)
    orig_rw, orig_rwc, orig_rp = (
        mk.render_waves, mk.render_waves_chained, pr.reconstruct_pallas
    )
    try:
        mk.render_waves = lambda *a, **k: orig_rw(*a, **{**k, "interpret": True})
        mk.render_waves_chained = (
            lambda *a, **k: orig_rwc(*a, **{**k, "interpret": True})
        )
        pr.reconstruct_pallas = (
            lambda *a, **k: orig_rp(*a, **{**k, "interpret": True})
        )
        plain = Renderer(cbox_small, RenderConfig(**cfg, chain_sweeps=1))
        plain.render()
        chained = Renderer(cbox_small, RenderConfig(**cfg, chain_sweeps=2))
        chained.render()
    finally:
        mk.render_waves, mk.render_waves_chained, pr.reconstruct_pallas = (
            orig_rw, orig_rwc, orig_rp
        )
    a, b = np.asarray(plain.film), np.asarray(chained.film)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert a.mean() > 0.01  # lit


def test_preview_fires_across_chained_chunks(cbox_small, tmp_path):
    """Chained chunks advance sweeps_done by n_chunk at a time; previews must
    fire on interval CROSSINGS (chunk 2, interval 3: the old modulo check
    never fires because sweeps_done is only ever 2 and 4)."""
    import hijiki_tpu.ops.pallas_megakernel as mk
    import hijiki_tpu.render.pallas_reconstruct as pr

    png = str(tmp_path / "prev.png")
    cfg = RenderConfig(width=64, height=64, spp=4, block_size=64, seed=2,
                       driver="mega", max_bounces=4, chain_sweeps=2,
                       preview_interval=3, preview_path=png)
    orig_rwc, orig_rp = mk.render_waves_chained, pr.reconstruct_pallas
    try:
        mk.render_waves_chained = (
            lambda *a, **k: orig_rwc(*a, **{**k, "interpret": True})
        )
        pr.reconstruct_pallas = (
            lambda *a, **k: orig_rp(*a, **{**k, "interpret": True})
        )
        r = Renderer(cbox_small, cfg)
        r.render()
    finally:
        mk.render_waves_chained, pr.reconstruct_pallas = orig_rwc, orig_rp
    import os

    assert os.path.exists(png), "preview must fire when a chunk crosses the interval"


def test_spec_resolve_renderer_bitwise(cbox_small):
    """--spec-resolve plumbing: the pipelined winner-resolve must produce a
    bitwise-identical film through the full Renderer (mega driver, chained
    and unchained paths), so flipping the auto default is estimator-free."""
    films = {}
    for sr in (-1, 1):
        for chain in (1, 2):
            r = Renderer(
                cbox_small,
                _cfg(driver="mega", spec_resolve=sr, chain_sweeps=chain),
            )
            r.render()
            films[(sr, chain)] = np.asarray(r.film)
    for chain in (1, 2):
        np.testing.assert_array_equal(films[(-1, chain)], films[(1, chain)])


def test_renderer_hbm_trunk_auto_bitwise():
    """End-to-end Renderer run in HBM-table mode: the auto VMEM trunk is OFF
    (resolve_mega_trunk — the on-chip A/B measured the trunk a regression,
    PERF_NOTES §9z), and an EXPLICIT whole-walk trunk run must still be
    BITWISE identical to a trunk-disabled (-1) run (the trunk only changes
    where a row is fetched from, never the walk order)."""
    import numpy as np

    from hijiki_tpu.render import renderer as rmod
    from hijiki_tpu.render.renderer import RenderConfig, Renderer
    from hijiki_tpu.scene.compile import compile_scene
    from hijiki_tpu.scene.model import Camera, Diffuse, Emissive, Quad, Scene, Triangle

    s = Scene(camera=Camera.cbox_default())
    white = s.add_material(Diffuse((0.7, 0.7, 0.7)))
    light = s.add_material(Emissive((10.0,) * 3))
    s.add_object(Quad((-0.5, 2.8, -0.5), (1, 0, 0), (0, 0, 1)), light)
    rng = np.random.default_rng(0)
    n = 96
    ctr = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    s.positions = np.concatenate([ctr, ctr + 0.01, ctr + 0.02]).astype(np.float32)
    s.normals = np.tile(np.array([[0, 1, 0]], np.float32), (3 * n, 1))
    s.uvs = np.zeros((3 * n, 2), np.float32)
    for i in range(n):
        s.add_object(Triangle((i, n + i, 2 * n + i)), white)
    # single-table flatten: the trunk is only defined for ntab == 1
    cs = compile_scene(s, octant_tables="never")

    films = {}
    old = rmod.MEGA_TABLE_LIMIT_BYTES
    rmod.MEGA_TABLE_LIMIT_BYTES = 1024  # force HBM streaming
    try:
        # explicit whole-walk trunk vs off; auto (0) must resolve to OFF
        for trunk in (cs.mega_tbl_rows, -1, 0):
            r = Renderer(
                cs,
                RenderConfig(width=32, height=32, spp=1, driver="mega",
                             max_bounces=4, mega_trunk=trunk),
            )
            assert r._mega_table_hbm
            if trunk > 0:
                assert r._sweep_kwargs()["mega_trunk"] == cs.mega_tbl_rows
            else:
                assert r._sweep_kwargs()["mega_trunk"] == 0
            r.render()
            films[trunk] = np.asarray(r.film)
    finally:
        rmod.MEGA_TABLE_LIMIT_BYTES = old
    np.testing.assert_array_equal(films[cs.mega_tbl_rows], films[-1])
    np.testing.assert_array_equal(films[0], films[-1])


def test_overflow_zero_matrix(cbox_small):
    """overflow == 0 is an invariant at default configs (VERDICT r2 weak #4):
    no driver x size x chaining x bounce-cap combination may drop paths —
    including the max_bounces <= chain_cap case that used to trip the
    spurious no-op-phase truncation (the old preview test warning)."""
    import warnings

    for size, chain, mb in [(32, 1, 4), (64, 2, 4), (64, 2, 16), (32, 1, 1000)]:
        cfg = RenderConfig(
            width=size, height=size, spp=2, block_size=64, seed=3,
            driver="mega", max_bounces=mb, chain_sweeps=chain,
        )
        r = Renderer(cbox_small, cfg)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            r.render()
        ovf_warns = [x for x in w if "phase capacity" in str(x.message)]
        assert not ovf_warns, (size, chain, mb)
        assert r.metrics["wave_overflow"] == 0, (size, chain, mb)
        assert r.metrics["overflow_retried"] == 0, (size, chain, mb)


def test_overflow_retry_unbiased(cbox_small):
    """A pathological phase_shrink that drops paths must trigger the
    full-capacity re-render: the final film carries no bias and is bitwise
    identical to a run whose capacities never overflowed (same seeds —
    per-lane RNG/radiance are packet-composition-independent)."""
    import warnings

    # chained pool with a tiny in-kernel cap (mega_chain_cap=2): most of the
    # 8 samples park unfinished, and shrink 9999 clamps the resume capacity
    # to the one-tile floor (1024 lanes on the CPU packet) — overflow is
    # guaranteed (measured ~15.7k dropped of 32768 at these settings)
    base = dict(width=64, height=64, spp=8, chain_sweeps=8, block_size=64,
                seed=11, driver="mega", max_bounces=16, mega_chain_cap=2)
    bad = RenderConfig(phase_shrink=(9999,), **base)
    r = Renderer(cbox_small, bad)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        r.render()
    # match on the two stable phrases (not the exact sentence) so a cosmetic
    # rewording of the warning can't silently redden the suite again
    assert any("re-rendering" in str(x.message) and "full capacity" in str(x.message)
               for x in w)
    assert r.metrics["overflow_retried"] > 0
    assert r.metrics["wave_overflow"] == 0

    # the reference run uses full capacity (phase_shrink=1 for every phase,
    # matching the retry path exactly) — chain_cap=2 parks so many paths
    # that the DEFAULT shrink-4 capacities would themselves overflow
    good = RenderConfig(phase_shrink=(1,) * 8, **base)
    r2 = Renderer(cbox_small, good)
    r2.render()
    assert r2.metrics["overflow_retried"] == 0
    assert r2.metrics["wave_overflow"] == 0
    np.testing.assert_array_equal(np.asarray(r.film), np.asarray(r2.film))


def test_checkpoint_never_persists_biased_film(cbox_small, tmp_path):
    """A mid-render checkpoint (progress callback, like the CLI's
    --checkpoint-interval) settles pending overflow BEFORE persisting: the
    saved film must equal a full-capacity render of the same sweeps, never
    the dropped-path film (round-3 review finding: the retry used to run
    only after the loop, so an early checkpoint could bake in the bias)."""
    import warnings

    path = str(tmp_path / "ck.npz")
    bad = RenderConfig(width=64, height=64, spp=4, chain_sweeps=2,
                       block_size=64, seed=11, driver="mega", max_bounces=16,
                       mega_chain_cap=2, phase_shrink=(9999,))
    r = Renderer(cbox_small, bad)
    saved_at = []

    def progress(done, total):
        if done == 2 and not saved_at:
            r.save_checkpoint(path)
            saved_at.append(done)

    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        r.render(progress=progress)
    assert saved_at == [2]
    assert r.metrics["overflow_retried"] > 0  # the config does overflow

    ck = np.load(path, allow_pickle=True)
    good = RenderConfig(width=64, height=64, spp=2, chain_sweeps=2,
                        block_size=64, seed=11, driver="mega", max_bounces=16,
                        mega_chain_cap=2, phase_shrink=(1,) * 8)
    r2 = Renderer(cbox_small, good)
    r2.render()
    np.testing.assert_array_equal(ck["film"], np.asarray(r2.film))
