"""The renderer driver: sweeps, film, checkpointing, metrics, previews.

Replaces the reference's ``Renderer`` + per-block command loop
(``src/main.rs:1143-1355``): on TPU a sweep traces every pixel of the image as
one batched wavefront dispatch (jitted once, replayed per sweep), reconstructs
with the bilateral filter, and accumulates into the persistent
(rgb*weight, weight) framebuffer. The live winit preview window becomes
periodic PNG snapshots (``preview_interval``); progressive accumulate +
normalize-at-read semantics are identical (``shader/reconstruction.glsl:59,65``,
``shader/preview.glsl:11``).

Checkpoint/resume: the film plus the sweep cursor and the scheduler seed is a
complete render state (the design the reference enables but never implements —
SURVEY.md §5); ``save_checkpoint``/``resume_checkpoint`` snapshot it to .npz.
"""

from __future__ import annotations

import dataclasses
import json
import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hijiki_tpu.ops.camera import camera_rays
from hijiki_tpu.ops.integrate import integrate
from hijiki_tpu.ops.rng import seed_rng
from hijiki_tpu.render.blocks import BlockScheduler
from hijiki_tpu.render.reconstruct import normalize_film, reconstruct_sweep
from hijiki_tpu.scene.compile import CompiledScene, scene_to_device
from hijiki_tpu.utils.exr import write_exr, write_png


@dataclass(frozen=True)
class RenderConfig:
    """CLI-level options; defaults mirror the reference's ``Opt``
    (``src/main.rs:1426-1456``: 800x600, 64 spp, preview every 128 blocks)."""

    width: int = 800
    height: int = 600
    spp: int = 64
    block_size: int = 128
    seed: int = 0
    use_bvh: bool = True
    max_bounces: int = 1000
    reconstruction_radius: int = 2  # src/main.rs:1284
    reconstruction_stddev: float = 0.5  # src/main.rs:1285
    preview_interval: int = 0  # sweeps between PNG previews; 0 = off
    preview_path: str = "/tmp/hijiki_preview.png"
    leaf_size: int = 1
    # "sync": bulk-synchronous bounce loop; "wavefront": regenerating lane
    # pool with path-regeneration compaction (render/wavefront.py)
    driver: str = "sync"
    wavefront_lanes: int = 1 << 18
    sort_lanes: bool = False
    # traversal backend: None = "rows" (or "brute" when use_bvh=False);
    # "packet" selects the Pallas packet kernel (TPU only)
    traversal: str = ""
    # fixed-albedo mode: populate the albedo AOV (the reference declares but
    # never assigns it — render.glsl:84-85), activating the denoiser's
    # albedo feature term. sync driver only; off = reference parity.
    fixed_albedo: bool = False
    # live terminal preview (ANSI half-blocks; the winit window analog
    # for headless hosts): redraw every N sweeps, 0 = off
    live_preview: int = 0
    # mega driver packet width (lanes per traversal cursor); 0 = auto
    # (1024 on TPU — measured 1.59x over 128 — else 128). Estimator is
    # width-independent: per-lane RNG/radiance are identical for any width.
    mega_packet: int = 0
    # independent cursor groups per megakernel tile (the grouped spec
    # walker: smaller per-cursor row unions at the same issue width);
    # 0 = auto (measured best on TPU, 1 elsewhere)
    mega_groups: int = 0
    # sweep samples chained per megakernel launch (in-kernel lane respawn:
    # a dead path's lane immediately starts the pixel's next sweep sample —
    # phase-0 occupancy + one launch per chunk instead of per sweep);
    # 1 = off, 0 = auto (on for the TPU mega driver). Estimator-exact:
    # every (pixel, sweep) sample consumes its unchained RNG stream.
    chain_sweeps: int = 0
    # pipelined winner-resolve loop (ops/pallas_megakernel, PERF_NOTES
    # roadmap item 5): 0 = auto (off — unmeasured on hardware; flip per
    # tools/ab_resolve.py), 1 = on, -1 = off. Outputs are bitwise-equal
    # either way (tests/test_megakernel.py).
    spec_resolve: int = 0
    # VMEM trunk cache for HBM-streamed trace tables (the walk serves rows
    # below K from an on-chip copy; ops/pallas_megakernel._with_hbm_bufs):
    # 0 = auto (resolve_mega_trunk), -1 = off, N > 0 = cache the first N
    # rows (clamped to the walk section). Outputs are bitwise-equal either
    # way (tests/test_megakernel.py).
    mega_trunk: int = 0
    # h-row window DMA for HBM-streamed trace tables (each sublane
    # descriptor copies h consecutive rows; in-window visits are served
    # from scratch — PERF_NOTES §11): 0 = auto (resolve_mega_window),
    # 1 = off, h > 1 = window height. Outputs are bitwise-equal either way
    # (tests/test_megakernel.py).
    mega_window: int = 0
    # chained-launch in-kernel bounce cap before a path parks into the
    # compaction phases (render_waves_chained chain_cap): 0 = kernel
    # default (8, measured). Estimator-exact for any value.
    mega_chain_cap: int = 0
    # dedicated any-hit shadow table for the megakernel's NEE walk
    # (scene.compile.CompiledScene.shadow_rows_mega — a payload-free
    # PACKED3 flattening; round-4 verdict #1): 0 = auto
    # (resolve_shadow_tbl: ON whenever the scene built one and the main
    # table is VMEM-resident), 1 = on, -1 = off. Images are
    # bitwise-identical either way (tests/test_megakernel.py).
    mega_shadow: int = 0
    # wavefront phase-capacity shrink factors (mega driver; see
    # ops/pallas_megakernel.render_waves): () = kernel defaults. The
    # renderer enforces overflow == 0 regardless: a sweep chunk that drops
    # paths is re-rendered at full capacity (phase_shrink 1) with the same
    # seeds, so the accumulated film is always the unbiased estimate.
    phase_shrink: tuple = ()


@partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "block_size",
        "use_bvh",
        "max_bounces",
        "radius",
        "stddev",
        "leaf_size",
        "driver",
        "wavefront_lanes",
        "sort_lanes",
        "traversal",
        "fixed_albedo",
        "mega_packet",
        "mega_groups",
        "mega_table_hbm",
        "mega_spec_resolve",
        "mega_trunk",
        "mega_window",
        "mega_shadow_tbl",
        "phase_shrink",
        "seeds_from_blocks",
        "interpret",
    ),
)
def render_sweep(
    scene: CompiledScene,
    pixel_seeds,
    sample_offset,
    *,
    width: int,
    height: int,
    block_size: int,
    use_bvh: bool,
    max_bounces: int,
    radius: int,
    stddev: float,
    leaf_size: int,
    driver: str = "sync",
    wavefront_lanes: int = 1 << 18,
    sort_lanes: bool = False,
    traversal: str = "",
    fixed_albedo: bool = False,
    mega_packet: int = 128,
    mega_groups: int = 1,
    mega_table_hbm: bool = False,
    mega_spec_resolve: bool = False,
    mega_trunk: int = 0,
    mega_window: int = 1,
    mega_shadow_tbl: bool = False,
    phase_shrink: tuple = (),
    seeds_from_blocks: bool = False,
    # run the Pallas kernels (megakernel + reconstruction) in interpret
    # mode — required on non-TPU backends (the renderer auto-sets this)
    interpret: bool = False,
):
    """Trace + reconstruct one full-image sweep; returns (film_delta, stats).

    seeds_from_blocks: ``pixel_seeds`` is the scheduler's tiny (bh, bw) u32
    block-seed array and the (H, W) per-pixel seeds are derived on device
    (render.blocks.per_pixel_seeds_device) — saves the per-sweep host
    compute + 4 MB upload of the expanded seeds (~35%% of a 1024^2 mega
    sweep through the tunnel; PERF_NOTES §9l)."""
    f32 = jnp.float32
    H, W = height, width
    if seeds_from_blocks:
        from hijiki_tpu.render.blocks import per_pixel_seeds_device

        seeds = per_pixel_seeds_device(width, height, block_size, pixel_seeds)
    else:
        seeds = pixel_seeds

    y = jax.lax.broadcasted_iota(f32, (H, W), 0)
    x = jax.lax.broadcasted_iota(f32, (H, W), 1)
    px = jnp.stack([x + sample_offset[0], y + sample_offset[1]], axis=-1)
    if not traversal:
        traversal = "rows" if use_bvh else "brute"

    if driver == "mega":
        # Pallas megakernel wavefront (ops/pallas_megakernel.py): the whole
        # path trace runs on-chip; XLA only does inter-phase compaction.
        from hijiki_tpu.ops.pallas_megakernel import render_waves

        t_, n_, dep_, _, overflow_, bounces_, rows_, alb_ = render_waves(
            scene,
            px[..., 0].reshape(-1),
            px[..., 1].reshape(-1),
            seeds.reshape(-1),
            width=W,
            height=H,
            max_bounces=max_bounces,
            lane_sort=sort_lanes,
            packet=mega_packet,
            groups=mega_groups,
            table_in_hbm=mega_table_hbm,
            spec_resolve=mega_spec_resolve,
            trunk_rows=mega_trunk,
            hbm_window=mega_window,
            shadow_tbl=mega_shadow_tbl,
            interpret=interpret,
            **({"phase_shrink": phase_shrink} if phase_shrink else {}),
        )
        total = t_.reshape(H, W, 3)
        normal = n_.reshape(H, W, 3)
        depth = dep_.reshape(H, W)
        # parity mode keeps the AOV zero (reference quirk); fixed-albedo uses
        # the kernel's captured first-hit reflectance
        albedo = alb_.reshape(H, W, 3) if fixed_albedo else jnp.zeros((H, W, 3), f32)
        path_segments = jnp.sum(bounces_)
        # per-lane counters are tile-uniform: sum/tile-lanes = row visits
        rows_visited = jnp.sum(rows_) / (8.0 * mega_packet)
        wave_overflow = overflow_
    elif driver == "wavefront":
        from hijiki_tpu.render.wavefront import render_wavefront

        imgs = render_wavefront(
            scene,
            px.reshape(-1, 2),
            seeds.reshape(-1),
            jnp.asarray([W, H], f32),
            num_lanes=min(wavefront_lanes, H * W),
            max_iters=max_bounces * max(1, H * W // min(wavefront_lanes, H * W)) + 64,
            max_path_bounces=max_bounces,
            traversal=traversal,
            sort_lanes=sort_lanes,
        )
        total = imgs.color.reshape(H, W, 3)
        normal = imgs.normal.reshape(H, W, 3)
        depth = imgs.depth.reshape(H, W)
        albedo = jnp.zeros((H, W, 3), f32)
    else:
        state = seed_rng(seeds)
        o, d, tmin, tmax = camera_rays(
            scene.cam_position,
            scene.cam_rotation,
            scene.cam_fov,
            px,
            jnp.asarray([W, H], f32),
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
            traversal=traversal,
            albedo_aov=fixed_albedo,
        )
        total, normal, depth, albedo = out.total, out.normal, out.depth, out.albedo

    if driver == "mega" and radius == 2 and not fixed_albedo:
        # Pallas stencil (render/pallas_reconstruct.py): the XLA formulation
        # costs tens of seconds per sweep on this stack (docs/PERF_NOTES.md)
        from hijiki_tpu.render.pallas_reconstruct import reconstruct_pallas

        film_delta = reconstruct_pallas(
            total, normal, sample_offset, block_size=block_size,
            stddev=stddev, interpret=interpret,
        )
    else:
        film_delta = reconstruct_sweep(
            total,
            normal,
            albedo,
            sample_offset,
            block_size=block_size,
            radius=radius,
            stddev=stddev,
        )
    if driver != "mega":
        path_segments = jnp.float32(0.0)
        rows_visited = jnp.float32(0.0)
        wave_overflow = jnp.int32(0)
    stats = dict(
        # paths dropped by phase-capacity overflow (0 = unbiased); see
        # ops/pallas_megakernel.render_waves
        wave_overflow=wave_overflow,
        mean_radiance=jnp.mean(total),
        mean_depth=jnp.mean(depth),
        # total path segments (closest-hit casts); diffuse bounces add one
        # shadow cast each, so true ray casts are between 1x and 2x this
        path_segments=path_segments,
        # trace-table rows visited by the packet walkers (closest + shadow +
        # resolve): the traversal-work unit (docs/PERF_NOTES.md §9)
        rows_visited=rows_visited,
    )
    return film_delta, stats


# the megakernel stages its trace table in VMEM; beyond this size the Mosaic
# compile fails (measured on v5e: 19 MB compiles, 48 MB does not), and the
# renderer streams the table from HBM instead (the walker's DMA mode)
from hijiki_tpu.scene.compile import MEGA_VMEM_TABLE_BYTES as MEGA_TABLE_LIMIT_BYTES

# VMEM budget for the HBM walk's trunk cache (resolve_mega_trunk): 12 MiB =
# 24576 padded rows — comfortably inside the 64 MiB scoped-VMEM limit
# (utils/tpuenv.py) next to the megakernel's ~37 MiB high-water at 1024-lane
# packets. Only the legacy experiment paths use it now (HIJIKI_MEGA_TRUNK=-2
# / explicit N>0): the trunk auto is OFF (on-chip A/B, PERF_NOTES §9z).
MEGA_TRUNK_BYTES = 12 << 20


@partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "block_size",
        "max_bounces",
        "stddev",
        "chain_cap",
        "mega_packet",
        "mega_groups",
        "mega_spec_resolve",
        "mega_trunk",
        "mega_window",
        "mega_shadow_tbl",
        "phase_shrink",
        "interpret",
        "mega_table_hbm",
    ),
)
def _render_sweeps_chained_jit(
    scene: CompiledScene,
    block_seeds,  # (S, bh, bw) u32 scheduler block seeds per sweep
    sample_offsets,  # (S, 2) f32 per-sweep jitter
    *,
    width: int,
    height: int,
    block_size: int,
    max_bounces: int,
    stddev: float,
    chain_cap: int = 8,
    mega_packet: int = 128,
    mega_groups: int = 1,
    mega_table_hbm: bool = False,
    mega_spec_resolve: bool = False,
    mega_trunk: int = 0,
    mega_window: int = 1,
    mega_shadow_tbl: bool = False,
    phase_shrink: tuple = (),
    interpret: bool = False,
):
    """Trace S sweeps in ONE chained megakernel launch (in-kernel sample
    chaining, ops/pallas_megakernel.render_waves_chained) and reconstruct
    each sweep with its own jitter offset. Returns (film_delta (H,W,4) —
    the SUM over the chunk's sweeps; film accumulation is associative so
    summing in-jit saves the (S,H,W,4) materialization + S host-side adds —
    and stats). Mega driver, reference reconstruction (radius 2,
    zero-albedo parity mode) only — the renderer falls back to per-sweep
    launches otherwise."""
    from hijiki_tpu.ops.pallas_megakernel import render_waves_chained
    from hijiki_tpu.render.blocks import per_pixel_seeds_device
    from hijiki_tpu.render.pallas_reconstruct import reconstruct_pallas

    f32 = jnp.float32
    H, W = height, width
    S = block_seeds.shape[0]
    y = jax.lax.broadcasted_iota(f32, (H, W), 0).reshape(-1)
    x = jax.lax.broadcasted_iota(f32, (H, W), 1).reshape(-1)
    pxs = jnp.stack([x + sample_offsets[si, 0] for si in range(S)])
    pys = jnp.stack([y + sample_offsets[si, 1] for si in range(S)])
    seeds = jnp.stack(
        [
            per_pixel_seeds_device(
                width, height, block_size, block_seeds[si]
            ).reshape(-1)
            for si in range(S)
        ]
    )
    t, n, dep, _, ovf, bounces, rows, _ = render_waves_chained(
        scene,
        pxs,
        pys,
        seeds,
        width=W,
        height=H,
        max_bounces=max_bounces,
        chain_cap=chain_cap,
        packet=mega_packet,
        groups=mega_groups,
        table_in_hbm=mega_table_hbm,
        spec_resolve=mega_spec_resolve,
        trunk_rows=mega_trunk,
        hbm_window=mega_window,
        shadow_tbl=mega_shadow_tbl,
        interpret=interpret,
        **({"phase_shrink": phase_shrink} if phase_shrink else {}),
    )
    delta = reconstruct_pallas(
        t[0].reshape(H, W, 3),
        n[0].reshape(H, W, 3),
        sample_offsets[0],
        block_size=block_size,
        stddev=stddev,
        interpret=interpret,
    )
    for si in range(1, S):
        delta = delta + reconstruct_pallas(
            t[si].reshape(H, W, 3),
            n[si].reshape(H, W, 3),
            sample_offsets[si],
            block_size=block_size,
            stddev=stddev,
            interpret=interpret,
        )
    stats = dict(
        wave_overflow=ovf,
        mean_radiance=jnp.mean(t),
        mean_depth=jnp.mean(dep),
        # per-sweep averages so the Renderer metrics stay sweep-denominated
        path_segments=jnp.sum(bounces) / S,
        rows_visited=jnp.sum(rows) / (8.0 * mega_packet) / S,
    )
    return delta, stats


# Resolved defaults of the chained entry's static kwargs, so AOT cache keys
# are invariant to a caller spelling a default explicitly vs omitting it
# (the renderer only passes chain_cap when overridden).
_CHAINED_STATIC_DEFAULTS = dict(
    chain_cap=8,
    mega_packet=128,
    mega_groups=1,
    mega_table_hbm=False,
    mega_spec_resolve=False,
    mega_trunk=0,
    mega_window=1,
    mega_shadow_tbl=False,
    phase_shrink=(),
    interpret=False,
)


def render_sweeps_chained(scene, block_seeds, sample_offsets, **static_kwargs):
    """AOT-cached entry to the chained megakernel executable (utils/aot.py):
    a fresh process with a warm executable cache skips the minutes-long
    Mosaic compile whose persistent-cache key drifts with compile history
    (PERF_NOTES §10). Same signature/semantics as the jitted function."""
    from hijiki_tpu.utils.aot import aot_call

    kw = {**_CHAINED_STATIC_DEFAULTS, **static_kwargs}
    return aot_call(
        _render_sweeps_chained_jit,
        (scene, block_seeds, sample_offsets),
        kw,
        tag="chained",
    )


# tools/dump_chained_hlo.py lowers the chained entry directly
render_sweeps_chained.lower = _render_sweeps_chained_jit.lower


def chain_chunk_size(remaining: int, chain: int) -> int:
    """Prefer a chunk size that divides ``remaining``: a tail chunk with a
    different S re-traces and re-compiles the whole chained Mosaic kernel
    (minutes via the remote tunnel) just to trace a few sweeps. Any divisor
    of remaining in [chain/2, chain] keeps one executable with at most ~2x
    the launch count; otherwise accept the tail recompile."""
    remaining = max(remaining, 1)
    if remaining % chain:
        for s in range(chain - 1, max(chain // 2 - 1, 1), -1):
            if remaining % s == 0:
                return s
    return chain


def resolve_chain_sweeps(config, table_hbm: bool, sweeps_done: int = 0) -> int:
    """0 = auto: CHAIN_SWEEPS_TPU sweeps per chained launch for the plain
    TPU mega driver, 1 (off) elsewhere. Chaining requires the mega driver
    with the reference reconstruction path (radius 2, parity albedo) and no
    lane sort; HIJIKI_CHAIN_SWEEPS overrides the auto choice. Auto stays
    off on the HBM-table path (mechanically supported but unmeasured on
    real hardware — force via the flag/env to experiment)."""
    import os

    c = config
    eligible = (
        c.driver == "mega"
        and c.reconstruction_radius == 2
        and not c.fixed_albedo
        and not c.sort_lanes
    )
    requested = c.chain_sweeps
    env = os.environ.get("HIJIKI_CHAIN_SWEEPS")
    if not requested and env:
        requested = int(env)
    if requested:
        if requested > 1 and not eligible:
            raise ValueError(
                "chain_sweeps > 1 needs the mega driver with radius-2 "
                "reconstruction, parity albedo, and no --sort-lanes"
            )
        return requested
    if not eligible or table_hbm:
        return 1
    import jax

    if jax.devices()[0].platform == "cpu":
        return 1
    from hijiki_tpu.ops.pallas_megakernel import CHAIN_SWEEPS_TPU

    return chain_chunk_size(c.spp - sweeps_done, CHAIN_SWEEPS_TPU)


def resolve_mega_packet(requested: int, sort_lanes: bool = False) -> int:
    """0 = auto: wide packets on TPU (ops/pallas_megakernel.MEGA_PACKET_TPU),
    one-VREG 128 elsewhere (CPU interpret mode gains nothing from width).
    HIJIKI_MEGA_PACKET overrides the auto choice (experiments). The in-kernel
    bitonic lane sort only supports 128-lane packets, so --sort-lanes pins
    the width and rejects conflicting explicit widths up front (instead of a
    deep kernel-tracing error). Wide packets need the raised Mosaic
    scoped-VMEM limit, so tpuenv is applied BEFORE any jax backend touch; if
    a backend initialized before hijiki_tpu was imported (library misuse on a
    local TPU runtime), libtpu already snapshot the 16 MiB default and auto
    falls back to 128-lane packets with a warning."""
    import os

    from hijiki_tpu.utils.tpuenv import scoped_vmem_effective

    # must precede the jax.devices() below (and any caller-side backend init
    # it can reach) — libtpu snapshots LIBTPU_INIT_ARGS at initialization
    vmem_ok = scoped_vmem_effective()

    if sort_lanes:
        explicit = requested or int(os.environ.get("HIJIKI_MEGA_PACKET", "0") or 0)
        if explicit and explicit != 128:
            raise ValueError(
                f"sort_lanes requires 128-lane packets, got mega_packet={explicit} "
                "(the in-kernel bitonic lane sort only supports one-VREG packets); "
                "drop --mega-packet/HIJIKI_MEGA_PACKET or set it to 128"
            )
        return 128
    if requested:
        return requested
    env = os.environ.get("HIJIKI_MEGA_PACKET")
    if env:
        return int(env)
    import jax

    if jax.devices()[0].platform == "cpu":
        return 128
    from hijiki_tpu.ops.pallas_megakernel import MEGA_PACKET_TPU

    if not vmem_ok:
        import warnings

        warnings.warn(
            "jax backend initialized before hijiki_tpu could raise the Mosaic "
            "scoped-VMEM limit (LIBTPU_INIT_ARGS is snapshot at libtpu init); "
            "falling back to 128-lane megakernel packets. Import hijiki_tpu "
            "before initializing jax, or set LIBTPU_INIT_ARGS="
            "'--xla_tpu_scoped_vmem_limit_kib=65536' in the environment, to "
            "get wide packets (~1.6x faster)."
        )
        return 128
    return MEGA_PACKET_TPU


def resolve_spec_resolve(requested: int, table_hbm: bool = False) -> bool:
    """Pipelined winner-resolve default: 0 = auto — ON for HBM-streamed
    tables, OFF for VMEM-resident ones (on-chip A/B, tools/ab_resolve.py,
    round 3: HBM PACKED4+G=2 1.028x — the early row-DMA start overlaps the
    copy; VMEM cbox 0.989x — the resolve loop is only ~3% of iterations
    there, §9g2, and the pipeline bookkeeping costs more than it hides).
    1 = on, -1 = off. HIJIKI_SPEC_RESOLVE overrides the auto choice."""
    import os

    if requested:
        return requested > 0
    env = os.environ.get("HIJIKI_SPEC_RESOLVE")
    if env:
        return int(env) > 0
    return table_hbm


def resolve_mega_groups(requested: int, packet: int, table_hbm: bool) -> int:
    """0 = auto: MEGA_GROUPS_TPU independent cursor groups on TPU when the
    packet is wide enough and the table is VMEM-resident (the grouped spec
    walker trades per-iteration fetch issues for smaller per-cursor row
    unions — measured win, docs/PERF_NOTES.md §9m), 1 elsewhere.
    HIJIKI_MEGA_GROUPS overrides the auto choice (experiments)."""
    import os

    if requested:
        return requested
    env = os.environ.get("HIJIKI_MEGA_GROUPS")
    if env:
        return int(env)
    if table_hbm:
        # grouped DMA pipelining: G cursor groups each with an in-flight
        # row copy. On-chip A/B at the PACKED4 HBM format (101k-tri
        # bigcbox, tools/ab_hbmgroups.py, PERF_NOTES §9z): G=2 1.183x,
        # G=4 1.029x vs single-cursor — two in-flight DMAs hide the copy,
        # four pay more slot overhead than their union shrinkage returns.
        # Re-measured at 405k tris (tools/ab_hbm_matrix.py, BASELINE round
        # 3): PACKED4 G=2 1.20x, classic-rows G=2 1.163x, G=4 0.887x — so
        # the auto covers both measured row formats; only PACKED12/octant
        # HBM configs extrapolate the DMA-hiding rationale
        # (HIJIKI_MEGA_GROUPS=1 opts out per run).
        from hijiki_tpu.ops.pallas_megakernel import PACKET

        return 2 if packet % (2 * PACKET) == 0 else 1
    import jax

    if jax.devices()[0].platform == "cpu":
        return 1
    from hijiki_tpu.ops.pallas_megakernel import MEGA_GROUPS_TPU, PACKET

    if packet % (MEGA_GROUPS_TPU * PACKET) != 0:
        return max(1, packet // PACKET)
    return MEGA_GROUPS_TPU


def resolve_mega_trunk(requested: int, table_hbm: bool, scene) -> int:
    """VMEM trunk-cache rows for HBM-streamed walks. 0 = auto: OFF — the
    on-chip A/B (tools/ab_trunk.py, 101k-tri bigcbox, PACKED12) measured
    the trunk a regression (whole-walk 0.965x, 8192-row 0.946x,
    docs/PERF_NOTES.md §9z): the walker's row DMA is already hidden behind
    the prim test and the trunk only adds the VMEM fill + a phase split.
    The §9x visit-share sim (98-99% of visits in the first 16k rows) was
    right about locality but wrong that the DMA was on the critical path.
    -1 = off explicitly, N > 0 = first N rows (kept for experiments;
    estimator-exact either way — the threaded walk's cursor is strictly
    increasing, so the trunk only changes WHERE a row is fetched from).
    HIJIKI_MEGA_TRUNK overrides."""
    import os

    if not table_hbm:
        return 0
    if requested:
        return max(requested, 0)
    env = os.environ.get("HIJIKI_MEGA_TRUNK")
    if env:
        if int(env) == -2:  # -2 = the old auto: whole walk section
            if scene.mega_num_tables_static != 1:
                return 0
            return min(scene.mega_tbl_rows, MEGA_TRUNK_BYTES // 512)
        return max(int(env), 0)
    return 0


def resolve_shadow_tbl(requested: int, table_hbm: bool, scene) -> bool:
    """Dedicated any-hit shadow table (ops/pallas_megakernel, round-4
    verdict #1): 0 = auto — OFF. The on-chip A/B (tools/ab_shadow_tbl.py,
    cbox+spheres 512^2, PERF_NOTES §12) measured the PACKED3 shadow
    table's 1.07-1.08x tile-iteration cut fully repaid by the 3-prim
    tournament's extra issue (G=4 0.995x, G=2 1.006x) and extra serial
    chain depth (G=1 0.950x) — the §11 slab+prim issue term survived.
    1 = on (errors downstream if the scene has none), -1 = off.
    HIJIKI_SHADOW_TBL overrides. Images are bitwise-identical either way
    (same prim set, same per-prim f32 test, order-independent OR;
    tests/test_megakernel.py)."""
    import os

    if requested:
        return requested > 0
    env = os.environ.get("HIJIKI_SHADOW_TBL")
    if env:
        return int(env) > 0
    return False


def resolve_mega_window(requested: int, table_hbm: bool) -> int:
    """h-row window DMA height for HBM-streamed walks
    (ops/pallas_megakernel._traverse_hbm_window). 0 = auto: OFF (1) until
    the on-chip A/B lands — the probe-priced estimate is ~1.1-1.2x on the
    405k-tri cfg4b scene (PERF_NOTES §11, tools/sim_dma_window.py), inside
    the build-and-measure band. 1 = single-row descriptors (the grouped
    walker), h > 1 = window height. HIJIKI_MEGA_WINDOW overrides.
    Estimator-exact for any h (bitwise tests in tests/test_megakernel.py)."""
    import os

    if not table_hbm:
        return 1
    if requested:
        return max(requested, 1)
    env = os.environ.get("HIJIKI_MEGA_WINDOW")
    if env:
        return max(int(env), 1)
    return 1


class Renderer:
    """Progressive sweep renderer over a compiled scene (reference driver
    loop: src/main.rs:1284-1492 — block scheduling, film accumulation,
    metrics, checkpoint/resume).

    ``compiled`` may be host-side (fresh from ``compile_scene``) or already
    device-resident (``scene_to_device``). To share one table upload across
    several Renderer instances — benchmarks, sweeps over configs — convert
    once with ``scene_to_device`` and pass the converted scene: the
    constructor's own conversion is a no-op on jax arrays, and the device
    transfer is lazy, so a host-side scene re-uploads its full trace table
    per instance inside the first render (~9 s for a 151 MB table through
    the axon tunnel, tools/probe_cfg4b.py)."""

    def __init__(self, compiled: CompiledScene, config: RenderConfig):
        self._mega_table_hbm = False
        if (
            config.driver == "mega"
            and compiled.trace_rows_mega.nbytes > MEGA_TABLE_LIMIT_BYTES
        ):
            # keep the Pallas fast path: leave the table in HBM and stream
            # rows into VMEM with double-buffered async copies (the walker's
            # dual-successor DMA mode) instead of dropping to the XLA sync
            # driver
            self._mega_table_hbm = True
        self.scene = scene_to_device(compiled)
        self.config = config
        self.scheduler = BlockScheduler(
            config.width, config.height, config.block_size, config.seed
        )
        self.film = jnp.zeros((config.height, config.width, 4), jnp.float32)
        self.sweeps_done = 0
        self.metrics: dict = {}
        # optional host-span tracing (utils/tracing.SpanTracer; CLI
        # --trace-json): per-chunk dispatch spans, film sync, overflow
        # retries, checkpoint saves. None = allocation-free no-op.
        self.tracer = None

    def _sweep_kwargs(self):
        c = self.config
        return dict(
            width=c.width,
            height=c.height,
            block_size=c.block_size,
            use_bvh=c.use_bvh,
            max_bounces=c.max_bounces,
            radius=c.reconstruction_radius,
            stddev=c.reconstruction_stddev,
            leaf_size=c.leaf_size,
            driver=c.driver,
            wavefront_lanes=c.wavefront_lanes,
            sort_lanes=c.sort_lanes,
            traversal=c.traversal,
            fixed_albedo=c.fixed_albedo,
            mega_packet=resolve_mega_packet(c.mega_packet, c.sort_lanes),
            mega_groups=resolve_mega_groups(
                c.mega_groups,
                resolve_mega_packet(c.mega_packet, c.sort_lanes),
                self._mega_table_hbm,
            ),
            mega_table_hbm=self._mega_table_hbm,
            mega_spec_resolve=resolve_spec_resolve(
                c.spec_resolve, self._mega_table_hbm
            ),
            mega_trunk=resolve_mega_trunk(
                c.mega_trunk, self._mega_table_hbm, self.scene
            ),
            mega_window=resolve_mega_window(
                c.mega_window, self._mega_table_hbm
            ),
            mega_shadow_tbl=resolve_shadow_tbl(
                c.mega_shadow, self._mega_table_hbm, self.scene
            ),
            phase_shrink=tuple(c.phase_shrink or ()),
            # Pallas kernels need interpret mode off-TPU (bench.py's
            # on_tpu test); the mega driver is then driveable anywhere
            interpret=(
                c.driver == "mega" and jax.devices()[0].platform == "cpu"
            ),
        )

    def render(self, progress: Optional[Callable[[int, int], None]] = None):
        """Run the remaining sweeps (all of them unless resumed)."""
        from hijiki_tpu.utils.tracing import maybe_span

        c = self.config
        kwargs = self._sweep_kwargs()
        start = time.monotonic()
        sweep_marks = []
        total_segments = 0.0
        resume_start = self.sweeps_done
        chain = resolve_chain_sweeps(c, self._mega_table_hbm, self.sweeps_done)
        sweep = self.sweeps_done
        # overflow == 0 is an INVARIANT, not a warning: record each chunk's
        # launch inputs and lazily accumulate its overflow counter; if any
        # path was dropped by a phase-capacity truncation, the pending
        # chunks are re-rendered at full capacity (phase_shrink = 1, which
        # cannot overflow) with the SAME recorded seeds — the film is always
        # the unbiased estimate. Settled once after the loop (one host
        # transfer; the async dispatch pipeline is never per-chunk synced)
        # AND before any mid-render checkpoint save (save_checkpoint), so a
        # checkpoint can never persist a biased film.
        self._ovf_film_start = self.film
        self._ovf_records: list = []
        self._ovf_counters: list = []
        self._ovf_retried_total = 0

        def _run_chunk(kind, a, b, ps):
            if kind == "chained":
                return render_sweeps_chained(
                    self.scene,
                    a,
                    b,
                    width=c.width,
                    height=c.height,
                    block_size=c.block_size,
                    max_bounces=c.max_bounces,
                    stddev=c.reconstruction_stddev,
                    **({"chain_cap": c.mega_chain_cap} if c.mega_chain_cap else {}),
                    mega_packet=kwargs["mega_packet"],
                    mega_groups=kwargs["mega_groups"],
                    mega_table_hbm=self._mega_table_hbm,
                    mega_spec_resolve=kwargs["mega_spec_resolve"],
                    mega_trunk=kwargs["mega_trunk"],
                    mega_window=kwargs["mega_window"],
                    mega_shadow_tbl=kwargs["mega_shadow_tbl"],
                    phase_shrink=ps,
                    interpret=kwargs["interpret"],
                )
            return render_sweep(
                self.scene, a, b, seeds_from_blocks=True,
                **{**kwargs, "phase_shrink": ps},
            )

        # exposed so save_checkpoint (called from a progress callback
        # mid-render) can settle pending overflow before persisting
        self._ovf_run_chunk = _run_chunk

        while sweep < c.spp:
            n_chunk = min(chain, c.spp - sweep) if chain > 1 else 1
            if n_chunk > 1:
                # chained chunk: one launch traces n_chunk sweeps with
                # in-kernel lane respawn; per-sweep deltas come back in
                # order so the film accumulation matches sweep-at-a-time
                scheds = [
                    self.scheduler.sweep(si)
                    for si in range(sweep, sweep + n_chunk)
                ]
                bs = jnp.asarray(
                    np.stack(
                        [np.asarray(sc.block_seeds, np.uint32) for sc in scheds]
                    )
                )
                offs = jnp.asarray(
                    np.stack(
                        [
                            np.asarray(sc.sample_offset, np.float32)
                            for sc in scheds
                        ]
                    )
                )
                with maybe_span(
                    self.tracer, "dispatch chained chunk",
                    sweeps=f"{sweep}..{sweep + n_chunk - 1}",
                ):
                    delta, stats = _run_chunk(
                        "chained", bs, offs, kwargs["phase_shrink"]
                    )
                self._last_stats = stats
                self._ovf_records.append(("chained", bs, offs))
                self._ovf_counters.append(stats["wave_overflow"])
                self.film = self.film + delta
            else:
                sched = self.scheduler.sweep(sweep)
                # per-pixel seeds expand on DEVICE from the tiny block-seed
                # array (seeds_from_blocks in render_sweep): the host
                # expansion + 4 MB upload cost ~35% of a 1024^2 mega sweep
                # (PERF_NOTES §9l)
                bs1 = jnp.asarray(np.asarray(sched.block_seeds, dtype=np.uint32))
                off1 = jnp.asarray(sched.sample_offset)
                with maybe_span(
                    self.tracer, "dispatch sweep", sweep=sweep
                ):
                    delta, stats = _run_chunk(
                        "sweep", bs1, off1, kwargs["phase_shrink"]
                    )
                self._last_stats = stats
                self._ovf_records.append(("sweep", bs1, off1))
                self._ovf_counters.append(stats["wave_overflow"])
                self.film = self.film + delta
            prev_done = sweep
            sweep += n_chunk
            self.sweeps_done = sweep
            if progress is not None:
                progress(self.sweeps_done, c.spp)
            # interval-CROSSING checks, not modulo: chained chunks advance
            # sweeps_done by n_chunk at a time, so "done % interval == 0"
            # would skip most (or all) previews whenever the interval is not
            # a multiple of the chunk size
            if c.preview_interval and (
                prev_done // c.preview_interval != sweep // c.preview_interval
            ):
                self.save_png(c.preview_path)
            if c.live_preview and (
                prev_done // c.live_preview != sweep // c.live_preview
            ):
                self._term_preview().update(
                    self.image(),
                    f"{self.sweeps_done}/{c.spp} sweeps",
                )
            sweep_marks.append(time.monotonic() - start)
        # the overflow invariant: one host sync AFTER the loop (never per
        # chunk); any dropped path triggers a full-capacity re-render of
        # this call's chunks with the recorded seeds — deterministic, so
        # the recomputed film is the exact unbiased estimate
        with maybe_span(self.tracer, "overflow check (host sync)") as sp:
            self._settle_overflow()
            sp["overflow"] = self._ovf_retried_total
        overflow_seen = self._ovf_retried_total
        self._ovf_run_chunk = None
        with maybe_span(self.tracer, "film ready"):
            self.film.block_until_ready()
        elapsed = time.monotonic() - start
        # only the sweeps traced in THIS call: after a checkpoint resume the
        # loop starts at resume_start, and counting the full spp would inflate
        # rays/s (parallel/multihost.py applies the same rule)
        sweeps_traced = self.sweeps_done - resume_start
        primary_rays = c.width * c.height * sweeps_traced
        self.metrics = dict(
            render_seconds=elapsed,
            primary_rays=primary_rays,
            rays_per_second=primary_rays / elapsed if elapsed > 0 else 0.0,
            spp_per_second=sweeps_traced / elapsed if elapsed > 0 else 0.0,
        )
        # per-CHUNK wall-clock marks (dispatch-side; device work may lag).
        # One mark per launch: with sweep chaining a chunk covers
        # chain_chunk_sweeps sweeps, so len(sweep_marks) < sweeps traced;
        # divide chunk deltas by chain_chunk_sweeps for per-sweep times.
        self.metrics["sweep_marks"] = sweep_marks
        self.metrics["chain_chunk_sweeps"] = chain if chain > 1 else 1
        if getattr(self, "_last_stats", None) is not None:
            # wave_overflow is the overflow of the film as ACCUMULATED:
            # 0 whenever nothing dropped, and 0 after the full-capacity
            # re-render (phase_shrink=1 structurally cannot drop).
            # overflow_retried records that a retry happened (and how many
            # paths the discarded first attempt had dropped).
            self.metrics["wave_overflow"] = (
                0 if overflow_seen else int(self._last_stats.get("wave_overflow", 0))
            )
            self.metrics["overflow_retried"] = overflow_seen
            segs = float(self._last_stats.get("path_segments", 0.0))
            if segs > 0:
                # per-sweep path segments (closest-hit casts); the reference's
                # printed rays/s counts primary rays only (src/main.rs:1490)
                self.metrics["path_segments_last_sweep"] = segs
                self.metrics["mean_path_length"] = segs / (c.width * c.height)
            rows = float(self._last_stats.get("rows_visited", 0.0))
            if rows > 0:
                # traversal work: trace-table rows visited per sweep and the
                # effective walker throughput
                self.metrics["rows_visited_last_sweep"] = rows
                self.metrics["mrows_per_second"] = (
                    rows * c.spp / elapsed / 1e6 if elapsed > 0 else 0.0
                )
        if self.tracer is not None:
            self.tracer.counter(
                "throughput",
                mrays_per_s=self.metrics["rays_per_second"] / 1e6,
                spp_per_s=self.metrics["spp_per_second"],
            )
        return self.metrics

    def _settle_overflow(self) -> int:
        """Enforce the overflow==0 invariant on the pending chunks: ONE
        host transfer sums their overflow counters (a per-counter int()
        would pay one tunnel round-trip per chunk); if any path was
        dropped, self.film is rebuilt from the recorded seeds at full
        capacity (phase_shrink=1, which structurally cannot overflow).
        Runs at the end of render() and before any mid-render checkpoint
        save. Accumulates into self._ovf_retried_total and resets the
        pending state so subsequent chunks settle independently."""
        from hijiki_tpu.utils.tracing import maybe_span

        counters = self._ovf_counters
        if not counters:
            return 0
        if len(counters) > 1:
            seen = int(jnp.sum(jnp.stack(counters)))
        else:
            seen = int(counters[0])
        if seen:
            import warnings

            warnings.warn(
                f"{seen} paths exceeded wavefront phase capacity; "
                "re-rendering ALL pending chunks at full capacity "
                "(phase_shrink=1) with the same seeds — film stays "
                "unbiased; per-chunk deltas are not retained, so every "
                "chunk since the last settle re-renders, not just the "
                "overflowed ones"
            )
            film = self._ovf_film_start
            for kind, a, b in self._ovf_records:
                with maybe_span(
                    self.tracer, "retry chunk (full capacity)", kind=kind
                ):
                    delta, stats = self._ovf_run_chunk(kind, a, b, (1,) * 8)
                self._last_stats = stats
                film = film + delta
            self.film = film
            self._ovf_retried_total += seen
        self._ovf_film_start = self.film
        self._ovf_records = []
        self._ovf_counters = []
        return seen

    def _term_preview(self):
        if not hasattr(self, "_term_preview_obj"):
            from hijiki_tpu.utils.term_preview import TerminalPreview

            self._term_preview_obj = TerminalPreview()
        return self._term_preview_obj

    def image(self) -> np.ndarray:
        """Normalized (H,W,3) float RGB."""
        return np.asarray(normalize_film(self.film))

    def save_exr(self, path: str) -> None:
        write_exr(path, self.image())

    def save_png(self, path: str) -> None:
        write_png(path, self.image())

    # --- checkpoint / resume (net-new vs the reference, SURVEY.md §5) ---

    def save_checkpoint(self, path: str) -> None:
        from hijiki_tpu.utils.tracing import maybe_span

        # a checkpoint must never persist a biased film: settle any pending
        # overflow (mid-render saves come from the progress callback while
        # chunks are still being recorded) before reading the film back
        if getattr(self, "_ovf_run_chunk", None) is not None:
            self._settle_overflow()
        with maybe_span(self.tracer, "checkpoint save", path=path):
            np.savez(
                path,
                film=np.asarray(self.film),
                sweeps_done=self.sweeps_done,
                config=json.dumps(dataclasses.asdict(self.config)),
            )

    @classmethod
    def resume_checkpoint(
        cls,
        compiled: CompiledScene,
        path: str,
        config: "RenderConfig | None" = None,
        **ctor_kwargs,
    ) -> "Renderer":
        """Resume a checkpointed render.

        ``config`` (e.g. from fresh CLI flags) may override the checkpointed
        one — so resuming with a higher spp renders the extra sweeps — but
        fields that would change the already-accumulated film (geometry of
        the estimate: size, seed, block size, driver, bounces) must match.
        """
        data = np.load(path, allow_pickle=False)
        ckpt_config = RenderConfig(**json.loads(str(data["config"])))
        if config is not None:
            for f in ("width", "height", "block_size", "seed", "use_bvh",
                      "max_bounces", "driver", "reconstruction_radius",
                      "reconstruction_stddev", "fixed_albedo"):
                a, b = getattr(config, f), getattr(ckpt_config, f)
                if a != b:
                    raise ValueError(
                        f"checkpoint resume: {f}={a!r} conflicts with the "
                        f"checkpointed render's {f}={b!r}"
                    )
        r = cls(compiled, config or ckpt_config, **ctor_kwargs)
        r.film = jnp.asarray(data["film"])
        r.sweeps_done = int(data["sweeps_done"])
        # replay the scheduler to the checkpointed sweep so the remaining
        # sweeps use the seeds they would have had uninterrupted
        for s in range(r.sweeps_done):
            r.scheduler.sweep(s)
        return r
