"""Multi-chip rendering: blocks sharded over a device mesh, psum film reduce.

The distributed layer the reference never had (single GPU, single queue —
SURVEY.md §2.5): each sweep's image blocks are distributed round-robin over a
1-D ``jax.sharding.Mesh``; every device traces its blocks as one wavefront
batch, reconstructs them into a full-size *partial* (rgb*weight, weight)
framebuffer (the bilateral filter only ever reads within a block, so partials
are exact), and the partials are all-reduced with ``psum`` over ICI. Sample
accumulation is associative addition, so the multi-chip result equals the
single-chip render up to float summation order.

Per-shard RNG: block seeds come from the same host schedule as single-chip
rendering (seed = f(user_seed, sweep, block)), so device count does not change
the sampled estimate — only which chip computes it.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from hijiki_tpu.ops.camera import camera_rays
from hijiki_tpu.ops.integrate import integrate
from hijiki_tpu.ops.rng import seed_rng
from hijiki_tpu.render.blocks import cdiv
from hijiki_tpu.render.reconstruct import reconstruct_sweep
from hijiki_tpu.render.renderer import RenderConfig, Renderer
from hijiki_tpu.scene.compile import CompiledScene
from hijiki_tpu.utils.vma import match_vma


def trace_blocks(
    scene: CompiledScene,
    origins,  # (k,2) i32 block origins (x,y); dummy blocks use (W,H)
    dims,  # (k,2) i32 clipped block dims (w,h)
    seeds,  # (k,) u32 block seeds
    sample_offset,  # (2,) f32
    *,
    width: int,
    height: int,
    block_size: int,
    use_bvh: bool,
    max_bounces: int,
    radius: int,
    stddev: float,
    leaf_size: int,
):
    """Trace k blocks (tiles of block_size^2 lanes) and reconstruct them into
    a full-size partial framebuffer delta. Pure function of its inputs — the
    unit sharded by shard_map."""
    f32 = jnp.float32
    B = block_size
    k = origins.shape[0]

    ly = jax.lax.broadcasted_iota(jnp.int32, (k, B, B), 1)
    lx = jax.lax.broadcasted_iota(jnp.int32, (k, B, B), 2)
    gx = origins[:, 0, None, None] + lx
    gy = origins[:, 1, None, None] + ly

    # per-pixel seed = block_seed + lx + ly*clipped_width (render.glsl:156-157)
    state = seed_rng(
        seeds[:, None, None]
        + lx.astype(jnp.uint32)
        + ly.astype(jnp.uint32) * dims[:, 0, None, None].astype(jnp.uint32)
    )

    px = jnp.stack(
        [gx.astype(f32) + sample_offset[0], gy.astype(f32) + sample_offset[1]], axis=-1
    )
    o, d, tmin, tmax = camera_rays(
        scene.cam_position,
        scene.cam_rotation,
        scene.cam_fov,
        px,
        jnp.asarray([width, height], f32),
    )
    out = integrate(
        scene,
        o,
        d,
        tmin,
        tmax,
        state,
        max_bounces=max_bounces,
        use_bvh=use_bvh,
        leaf_size=leaf_size,
    )

    # Scatter tiles into a padded full-image canvas (pad absorbs dummy blocks
    # placed at origin (W,H) and edge-block overdraw), then crop.
    def scatter(tiles, ch):
        # the loop-carried canvas (and constant tiles like the all-ones
        # weight) must share the per-shard block origins' varying axes under
        # shard_map's check_vma (utils/vma.py; no-op unsharded)
        canvas = match_vma(jnp.zeros((height + B, width + B, ch), f32), origins)
        tiles = match_vma(tiles, origins)

        def body(i, cv):
            return jax.lax.dynamic_update_slice(
                cv, tiles[i], (origins[i, 1], origins[i, 0], 0)
            )

        return jax.lax.fori_loop(0, k, body, canvas)[:height, :width]

    color = scatter(out.total, 3)
    normal = scatter(out.normal, 3)
    albedo = scatter(out.albedo, 3)
    ones = scatter(jnp.ones((k, B, B, 1), f32), 1)[..., 0]

    return reconstruct_sweep(
        color,
        normal,
        albedo,
        sample_offset,
        block_size=B,
        radius=radius,
        stddev=stddev,
        sample_weight=ones,
    )


def make_sharded_sweep(mesh: Mesh, scene: CompiledScene, **kwargs):
    """Build the jitted sharded sweep function for a mesh.

    Film reduction is a banded ``psum_scatter`` over rows whenever the
    height divides the device count (round-4 verdict #2a): each device ends
    the sweep OWNING the fully-reduced band of rows it is responsible for,
    so the per-hop ICI payload is O(frame/N) instead of the full-frame
    O(frame) an all-reduce ships, and the film stays row-sharded on device
    across sweep accumulation — it is gathered once, at host readback
    (np.asarray in save/checkpoint). Falls back to the full psum for odd
    heights (the result is identical either way; sample accumulation is
    associative addition)."""
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    banded = kwargs["height"] % ndev == 0

    def per_device(scene_, origins, dims, seeds, sample_offset):
        delta = trace_blocks(scene_, origins, dims, seeds, sample_offset, **kwargs)
        if banded:
            return jax.lax.psum_scatter(
                delta, axis, scatter_dimension=0, tiled=True
            )
        return jax.lax.psum(delta, axis)

    scene_specs = jax.tree.map(lambda _: P(), scene)
    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(scene_specs, P(axis), P(axis), P(axis), P()),
        out_specs=P(axis) if banded else P(),
        # check_vma stays ON: loop-carry inits are vma-promoted where they
        # mix with per-shard data (utils/vma.py match_vma at every loop site)
    )
    return jax.jit(fn)


class MultiChipRenderer(Renderer):
    """Renderer sharding each sweep's blocks over a device mesh."""

    def __init__(
        self,
        compiled: CompiledScene,
        config: RenderConfig,
        num_devices: Optional[int] = None,
        devices=None,
    ):
        super().__init__(compiled, config)
        if devices is None:
            devices = jax.devices()[: num_devices or len(jax.devices())]
        self.mesh = Mesh(np.array(devices), ("d",))
        self.n_dev = len(devices)

        c = config
        # static block list (origins/dims), padded to a multiple of n_dev
        ox, oy = np.meshgrid(
            np.arange(0, c.width, c.block_size), np.arange(0, c.height, c.block_size)
        )
        origins = np.stack([ox.ravel(), oy.ravel()], axis=-1).astype(np.int32)
        dims = np.stack(
            [
                np.minimum(c.block_size, c.width - origins[:, 0]),
                np.minimum(c.block_size, c.height - origins[:, 1]),
            ],
            axis=-1,
        ).astype(np.int32)
        self.n_real_blocks = origins.shape[0]
        pad = (-origins.shape[0]) % self.n_dev
        if pad:
            dummy_o = np.tile([[c.width, c.height]], (pad, 1)).astype(np.int32)
            dummy_d = np.tile([[1, 1]], (pad, 1)).astype(np.int32)
            origins = np.concatenate([origins, dummy_o])
            dims = np.concatenate([dims, dummy_d])
        self.block_origins = origins
        self.block_dims = dims

        self._sweep_fn = make_sharded_sweep(
            self.mesh,
            self.scene,
            width=c.width,
            height=c.height,
            block_size=c.block_size,
            use_bvh=c.use_bvh,
            max_bounces=c.max_bounces,
            radius=c.reconstruction_radius,
            stddev=c.reconstruction_stddev,
            leaf_size=c.leaf_size,
        )

    def _sweep_delta(self, sched):
        """One sweep's film delta, blocks sharded over the mesh."""
        seeds = sched.block_seeds.reshape(-1)
        pad = self.block_origins.shape[0] - seeds.shape[0]
        if pad:
            seeds = np.concatenate([seeds, np.zeros(pad, np.uint32)])
        return self._sweep_fn(
            self.scene,
            jnp.asarray(self.block_origins),
            jnp.asarray(self.block_dims),
            jnp.asarray(seeds),
            jnp.asarray(sched.sample_offset),
        )

    def render(self, progress=None):
        import time

        from hijiki_tpu.utils.tracing import maybe_span

        c = self.config
        start = time.monotonic()
        resume_start = self.sweeps_done
        for sweep in range(self.sweeps_done, c.spp):
            with maybe_span(self.tracer, "dispatch sweep (sharded blocks)",
                            sweep=sweep, devices=self.n_dev):
                delta = self._sweep_delta(self.scheduler.sweep(sweep))
            self.film = self.film + delta
            self.sweeps_done = sweep + 1
            if progress is not None:
                progress(self.sweeps_done, c.spp)
            if c.preview_interval and self.sweeps_done % c.preview_interval == 0:
                self.save_png(c.preview_path)
        with maybe_span(self.tracer, "film ready"):
            self.film.block_until_ready()
        elapsed = time.monotonic() - start
        # only the sweeps traced in THIS call (same rule as Renderer.render:
        # counting the full spp inflates rays/s after a checkpoint resume)
        sweeps_traced = self.sweeps_done - resume_start
        primary = c.width * c.height * sweeps_traced
        self.metrics = dict(
            render_seconds=elapsed,
            primary_rays=primary,
            rays_per_second=primary / elapsed if elapsed > 0 else 0.0,
            spp_per_second=sweeps_traced / elapsed if elapsed > 0 else 0.0,
            devices=self.n_dev,
        )
        return self.metrics


# ----------------------------------------------------------------------------
# megakernel multi-chip: row-band lane sharding + psum'd partial films
# ----------------------------------------------------------------------------


def make_sharded_mega_sweep(
    mesh: Mesh,
    scene: CompiledScene,
    *,
    width: int,
    height: int,
    block_size: int,
    max_bounces: int,
    stddev: float,
    interpret: bool = False,
    packet: int = 128,
    groups: int = 1,
    table_in_hbm: bool = False,
    trunk_rows: int = 0,
    shadow_tbl: bool = False,
    phase_shrink: tuple = (),
    n_sweeps: int = 1,
    seeds_from_blocks: bool = False,
    chain_cap: int = 8,
):
    """Sharded sweep for the Pallas megakernel driver.

    Pixels shard as contiguous row bands (one per device, band height must be
    a multiple of 8 and of the block size's divisors so reconstruction blocks
    don't straddle shards); each device path-traces its band with
    ``render_waves`` and reconstructs its band on a one-block-extended,
    block-aligned canvas. The bilateral filter splats each sample into a
    ±R halo around its reconstruction block, so a band's samples contribute
    to at most R rows beyond the band — and those cross-band contributions
    are exactly the reference's "spill" class, whose center features are
    zeroed BY RULE (reconstruction.glsl block-splat quirk), so computing
    them against the zero-padded extension is bit-exact. The two R-row edge
    strips are exchanged with the neighboring devices via ``ppermute`` and
    added into the band edges; the film then needs no full-frame collective
    at all (round-4 verdict #2a): ``out_specs=P(axis)`` stitches the bands
    into the row-sharded (H,W,4) film, sweep accumulation stays sharded on
    device, and the film is gathered once, at host readback. ICI traffic
    per device per sweep drops from O(frame) (the previous full-frame
    partial psum) to O(R*width) halo strips; the per-device reconstruction
    drops from a mostly-zero full frame to band + 2 blocks. Only the
    scalar overflow counter is still all-reduced.
    """
    import jax.numpy as jnp

    from hijiki_tpu.ops.pallas_megakernel import render_waves
    from hijiki_tpu.render.pallas_reconstruct import reconstruct_pallas

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    if height % ndev:
        raise ValueError("height must divide evenly into device bands")
    band = height // ndev
    if band % block_size:
        # reconstruction blocks must not straddle bands: the bilateral filter's
        # center features are read from the owning device's partial image
        raise ValueError(
            f"band height {band} must be a multiple of block_size {block_size}"
        )

    trace_kwargs = dict(
        width=width,
        height=height,
        max_bounces=max_bounces,
        interpret=interpret,
        packet=packet,
        groups=groups,
        table_in_hbm=table_in_hbm,
        trunk_rows=trunk_rows,
        shadow_tbl=shadow_tbl,
        **({"phase_shrink": phase_shrink} if phase_shrink else {}),
    )

    def _recon_band(t, n, sample_offset):
        B = block_size
        pad_rows = ((B, B), (0, 0), (0, 0))
        return reconstruct_pallas(
            jnp.pad(t.reshape(band, width, 3), pad_rows),
            jnp.pad(n.reshape(band, width, 3), pad_rows),
            sample_offset,
            # the extension holds no samples: zero weight there, or the
            # default all-ones mask would splat phantom weight into the
            # band edges
            sample_weight=jnp.pad(
                jnp.ones((band, width), jnp.float32), pad_rows[:2]
            ),
            block_size=B,
            stddev=stddev,
            interpret=interpret,
        )  # (band + 2B, width, 4); nonzero only in [B-R, B+band+R)

    def _exchange(ext, ovf):
        """Halo-exchange one (band+2B, W, 4) extended-canvas delta (the SUM
        over a chunk's sweeps — strips are additive, so a chained chunk
        pays ONE exchange, not one per sweep) into the owned band."""
        from hijiki_tpu.render.pallas_reconstruct import R as RADIUS

        B = block_size
        own = ext[B : B + band]
        up_strip = ext[B - RADIUS : B]  # spill above the band -> device idx-1
        dn_strip = ext[B + band : B + band + RADIUS]  # spill below -> idx+1
        if ndev > 1:
            recv_from_above = jax.lax.ppermute(
                dn_strip, axis, [(i, i + 1) for i in range(ndev - 1)]
            )
            recv_from_below = jax.lax.ppermute(
                up_strip, axis, [(i, i - 1) for i in range(1, ndev)]
            )
            own = jnp.concatenate(
                [own[:RADIUS] + recv_from_above, own[RADIUS:]], axis=0
            )
            own = jnp.concatenate(
                [own[: band - RADIUS], own[band - RADIUS :] + recv_from_below],
                axis=0,
            )
        # devices 0 / N-1 drop their outer strips — exactly the reference's
        # image-boundary clipping (in_img) of the full-frame filter
        return own, jax.lax.psum(ovf, axis)

    def per_device(scene_, px, py, seeds, sample_offset):
        t, n, dep, _, ovf, _, _, _ = render_waves(
            scene_, px, py, seeds, **trace_kwargs
        )
        return _exchange(_recon_band(t, n, sample_offset), ovf)

    def per_device_blocks(scene_, block_seeds, sample_offsets):
        """Device-side input expansion + optional sweep chaining — the two
        wrapper taxes measured in round 5 (PERF_NOTES §13): the host
        px/py/seed build + ~12 MB/sweep upload (§9l's cost, tripled) and
        the per-sweep launch the plain renderer amortizes by chaining.
        ``block_seeds`` is (S, bh, bw) u32 sharded over band rows;
        ``sample_offsets`` is (S, 2) f32 replicated."""
        from hijiki_tpu.render.blocks import per_pixel_seeds_device

        di = jax.lax.axis_index(axis)
        f32 = jnp.float32
        yy = (
            jax.lax.broadcasted_iota(f32, (band, width), 0)
            + di.astype(f32) * band
        ).reshape(-1)
        xx = jax.lax.broadcasted_iota(f32, (band, width), 1).reshape(-1)
        S = n_sweeps
        seeds = jnp.stack(
            [
                per_pixel_seeds_device(
                    width, band, block_size, block_seeds[si]
                ).reshape(-1)
                for si in range(S)
            ]
        )
        if S == 1:
            t, n, dep, _, ovf, _, _, _ = render_waves(
                scene_,
                xx + sample_offsets[0, 0],
                yy + sample_offsets[0, 1],
                seeds[0],
                **trace_kwargs,
            )
            return _exchange(_recon_band(t, n, sample_offsets[0]), ovf)
        from hijiki_tpu.ops.pallas_megakernel import render_waves_chained

        pxs = jnp.stack([xx + sample_offsets[si, 0] for si in range(S)])
        pys = jnp.stack([yy + sample_offsets[si, 1] for si in range(S)])
        t, n, dep, _, ovf, _, _, _ = render_waves_chained(
            scene_, pxs, pys, seeds, chain_cap=chain_cap, **trace_kwargs
        )
        ext = _recon_band(t[0], n[0], sample_offsets[0])
        for si in range(1, S):
            ext = ext + _recon_band(t[si], n[si], sample_offsets[si])
        return _exchange(ext, ovf)

    scene_specs = jax.tree.map(lambda _: P(), scene)
    fn = jax.shard_map(
        per_device_blocks if seeds_from_blocks else per_device,
        mesh=mesh,
        in_specs=(
            (scene_specs, P(None, axis), P())
            if seeds_from_blocks
            else (scene_specs, P(axis), P(axis), P(axis), P())
        ),
        out_specs=(P(axis), P()),
        # OFF for the mega path in BOTH modes: vma inference through
        # pallas_call kernel traces is incomplete in this JAX version — the
        # bounce loop's float carries enter `{V:d}` (reads of sharded state
        # refs) but their body outputs come back replicated (values routed
        # through the traversal's scratch/DMA ops lose the annotation), so
        # `check_vma=True` kills the COMPILED trace at the resume-phase
        # kernel's while_loop type check (reproduced at 1..8 devices; see
        # tests/test_multichip.py::test_mega_sharded_compiled_trace). This
        # is an upstream inference gap, not a sharding bug: the semantic
        # property the check guards (per-device results equal the
        # single-chip render) is pinned by the mega-vs-single equality
        # test. The XLA block-sharded path (make_sharded_sweep) is
        # vma-clean and keeps the check ON.
        check_vma=False,
    )
    return jax.jit(fn)


def settle_mega_overflow(renderer, scheds, ovfs, film_start, tracer=None):
    """Enforce the overflow==0 invariant on a list of mega sweeps: ONE host
    transfer sums the per-sweep overflow counters (a per-sweep int() would
    pay one tunnel round-trip each); any dropped path triggers a
    full-capacity re-render (phase_shrink=1, which structurally cannot
    overflow) of ALL the recorded schedules from ``film_start`` — per-sweep
    deltas are not retained, so the whole call re-renders, keeping the film
    the unbiased estimate. Shared by MegaMultiChipRenderer.render and the
    multihost _HostStrideMixin so the invariant cannot drift between the
    sharded topologies (the single-device Renderer keeps its own settle:
    it tracks heterogeneous chunk kinds and mid-render checkpoint saves).
    Returns the number of dropped paths that were settled (0 = no retry)."""
    from hijiki_tpu.utils.tracing import maybe_span

    with maybe_span(tracer, "overflow check (host sync)") as sp:
        seen = int(jnp.sum(jnp.stack(ovfs))) if ovfs else 0
        sp["overflow"] = seen
    if seen:
        import warnings

        warnings.warn(
            f"{seen} paths exceeded wavefront phase capacity; "
            "re-rendering at full capacity (phase_shrink=1) with the "
            "same seeds — film stays unbiased"
        )
        film = film_start
        for sched in scheds:
            with maybe_span(tracer, "retry sweep (full capacity)"):
                delta, _ = renderer._sweep_delta(sched, full_capacity=True)
            film = film + delta
        renderer.film = film
    return seen


class MegaMultiChipRenderer(Renderer):
    """Multi-chip renderer for the megakernel driver (row-band sharding)."""

    def __init__(
        self,
        compiled: CompiledScene,
        config: RenderConfig,
        num_devices: Optional[int] = None,
        devices=None,
        interpret: Optional[bool] = None,
    ):
        super().__init__(compiled, config)
        if devices is None:
            devices = jax.devices()[: num_devices or len(jax.devices())]
        if interpret is None:
            # Mosaic kernels only compile for TPU; interpret everywhere else
            # (the CPU mesh used for sharding tests and the CLI --devices
            # smoke path). Callers can still force either mode.
            interpret = devices[0].platform != "tpu"
        self.mesh = Mesh(np.array(devices), ("d",))
        self.n_dev = len(devices)
        c = config
        from hijiki_tpu.render.renderer import (
            MEGA_TABLE_LIMIT_BYTES,
            resolve_mega_groups,
            resolve_mega_packet,
            resolve_mega_trunk,
            resolve_shadow_tbl,
        )

        table_hbm = compiled.trace_rows_mega.nbytes > MEGA_TABLE_LIMIT_BYTES
        self._mega_sweep_kwargs = dict(
            width=c.width,
            height=c.height,
            block_size=c.block_size,
            max_bounces=c.max_bounces,
            stddev=c.reconstruction_stddev,
            interpret=interpret,
            packet=resolve_mega_packet(c.mega_packet),
            groups=resolve_mega_groups(
                getattr(c, "mega_groups", 0),
                resolve_mega_packet(c.mega_packet),
                table_hbm,
            ),
            table_in_hbm=table_hbm,
            trunk_rows=resolve_mega_trunk(
                getattr(c, "mega_trunk", 0), table_hbm, compiled
            ),
            shadow_tbl=resolve_shadow_tbl(
                getattr(c, "mega_shadow", 0), table_hbm, compiled
            ),
        )
        self._phase_shrink = tuple(getattr(c, "phase_shrink", ()) or ())
        self._table_hbm = table_hbm
        self._interpret = interpret
        # sharded sweep executables, lazily built per (chunk size S,
        # full_capacity); the full-capacity twin (phase_shrink=1 cannot
        # drop paths) only compiles if an overflow retry actually triggers
        self._sweep_fns = {}

    def _get_fn(self, n_sweeps, full_capacity):
        key = (n_sweeps, bool(full_capacity))
        if key not in self._sweep_fns:
            self._sweep_fns[key] = make_sharded_mega_sweep(
                self.mesh,
                self.scene,
                phase_shrink=(1,) * 8 if full_capacity else self._phase_shrink,
                n_sweeps=n_sweeps,
                seeds_from_blocks=True,
                **self._mega_sweep_kwargs,
            )
        return self._sweep_fns[key]

    def _chunk_delta(self, scheds, full_capacity=False):
        """One chunk's film delta: S sweeps in ONE sharded launch (S > 1
        chains them in-kernel like the plain renderer; round-5 wrapper-tax
        fix). Inputs are the tiny (S, bh, bw) block-seed array + (S, 2)
        offsets — pixel/seed expansion happens per-band ON DEVICE. Returns
        (delta, ovf) with the overflow counter left on device (a per-chunk
        int() would force a device sync)."""
        from hijiki_tpu.utils.aot import aot_call

        S = len(scheds)
        bs = jnp.asarray(
            np.stack([np.asarray(s.block_seeds, np.uint32) for s in scheds])
        )
        offs = jnp.asarray(
            np.stack(
                [np.asarray(s.sample_offset, np.float32) for s in scheds]
            )
        )
        fn = self._get_fn(S, full_capacity)
        if self._interpret:
            return fn(self.scene, bs, offs)
        return aot_call(
            fn,
            (self.scene, bs, offs),
            {},
            tag="mega_sharded",
            key_extra=dict(
                n_sweeps=S,
                full=bool(full_capacity),
                ndev=self.n_dev,
                phase_shrink=self._phase_shrink,
                **self._mega_sweep_kwargs,
            ),
        )

    def _sweep_delta(self, sched, full_capacity=False):
        """One sweep's film delta (the multihost stride mixin and the
        overflow settle call per-sweep)."""
        return self._chunk_delta([sched], full_capacity)

    def render(self, progress=None):
        import time

        from hijiki_tpu.utils.tracing import maybe_span

        from hijiki_tpu.render.renderer import (
            chain_chunk_size,
            resolve_chain_sweeps,
        )

        c = self.config
        start = time.monotonic()
        resume_start = self.sweeps_done
        film_start = self.film
        scheds, ovfs = [], []
        # same sweep-chaining policy as the plain renderer (one chained
        # launch traces S sweeps; estimator-exact, PERF_NOTES §9d): the
        # wrapper no longer pays a launch per sweep
        chain = resolve_chain_sweeps(c, self._table_hbm, self.sweeps_done)
        sweep = self.sweeps_done
        while sweep < c.spp:
            n_chunk = (
                min(chain_chunk_size(c.spp - sweep, chain), c.spp - sweep)
                if chain > 1
                else 1
            )
            chunk = [
                self.scheduler.sweep(s)
                for s in range(sweep, sweep + n_chunk)
            ]
            with maybe_span(self.tracer, "dispatch chunk (mega bands)",
                            sweeps=f"{sweep}..{sweep + n_chunk - 1}",
                            devices=self.n_dev):
                delta, ovf = self._chunk_delta(chunk)
            scheds.extend(chunk)
            ovfs.append(ovf)
            self.film = self.film + delta
            sweep += n_chunk
            self.sweeps_done = sweep
            if progress is not None:
                progress(self.sweeps_done, c.spp)
        seen = settle_mega_overflow(self, scheds, ovfs, film_start,
                                    tracer=self.tracer)
        with maybe_span(self.tracer, "film ready"):
            self.film.block_until_ready()
        elapsed = time.monotonic() - start
        # only the sweeps traced in THIS call (same rule as Renderer.render:
        # counting the full spp inflates rays/s after a checkpoint resume)
        sweeps_traced = self.sweeps_done - resume_start
        primary = c.width * c.height * sweeps_traced
        self.metrics = dict(
            render_seconds=elapsed,
            primary_rays=primary,
            rays_per_second=primary / elapsed if elapsed > 0 else 0.0,
            spp_per_second=sweeps_traced / elapsed if elapsed > 0 else 0.0,
            devices=self.n_dev,
            # seen == 0 means every per-sweep counter was 0 (they are
            # non-negative), so this is always 0 — no extra device read
            wave_overflow=0,
            overflow_retried=seen,
        )
        return self.metrics
