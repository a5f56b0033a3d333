"""The Pallas path-tracing megakernel: a full path trace per ray tile.

On this TPU stack, XLA-level elementwise code executes far below VPU speed
and gathers inside device loops are unreliable (docs/PERF_NOTES.md), so the
entire bounce loop lives in one Pallas kernel: camera ray generation, packet
BVH traversal (closest-hit with shading payload + any-hit shadow rays),
surface shading with next-event estimation, BSDF sampling, Russian roulette —
all vectorized over an (8,128) ray tile, looping bounces per tile with
early exit the moment every path in the tile terminates (the tile-granular
form of wavefront compaction: tiles retire independently, so one long path
stalls 1024 lanes instead of the whole image).

Everything scene-constant is baked at compile time as python-float immediates
(camera, emitter geometry/power/pdf, material parameters) — the TPU analog of
the reference renderer recompiling its GLSL with per-scene macros
(``src/main.rs:769-783``). The only memory the kernel touches per step is the
VMEM-resident trace-row table.

The estimator is the reference megakernel's (``shader/render.glsl:81-146``),
with per-path RNG streams identical to ``ops/integrate.py`` (same predicated
xorshift32 consumption), so the same seeds produce the same image as the
XLA drivers up to float associativity.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hijiki_tpu.ops.pallas_sort import sort_tile_by_key
from hijiki_tpu.scene.compile import CompiledScene
from hijiki_tpu.utils.vma import match_vma, sds

M_EPS = 1e-4
M_PI = 3.1415926535897932384626433832795
# Lanes per packet (rays sharing one traversal cursor). 128 = one VREG row.
# Wider packets issue multi-VREG vector ops whose halves are independent
# chains, filling the VPU's latency bubbles (the walk is a serial dependency
# chain, ~6 cycles/op at width 128) at the price of larger per-packet row
# unions. Measured on cbox 512^2 (v5e): 256 -> 1.27x, 512 -> 1.45x,
# 1024 -> 1.59x end-to-end vs 128; 2048 exceeds the 16 MB VMEM scoped limit.
# The renderer picks MEGA_PACKET_TPU on TPU devices (the single
# interpreter of the HIJIKI_MEGA_PACKET override lives in
# render.renderer.resolve_mega_packet); kernels are shape-generic and this
# module constant is only the plain one-VREG default.
PACKET = 128
MEGA_PACKET_TPU = 1024
# Independent cursor groups per megakernel tile on TPU (grouped spec walker,
# _traverse_spec_grouped): auto default used by render.renderer
# .resolve_mega_groups. Measured in-process (tools/ab_groups.py, cbox 512^2
# full trace, P=1024, bitwise-equal sums): G=2 1.03x, G=4 1.17x, G=8 0.79x
# (per-group fetch issues overtake the union shrink) — see PERF_NOTES §9m.
MEGA_GROUPS_TPU = 4
# Sweep samples per chained launch on TPU (render_waves_chained; auto
# default used by render.renderer.resolve_chain_sweeps).
CHAIN_SWEEPS_TPU = 8
SUBLANES = 8
# HBM-resident tables pad rows to one full lane tile: Mosaic DMA slices
# must be 128-aligned in the lane dimension
HBM_ROW_WIDTH = 128
TRACE_COLS = 32
# Packed leaf rows (scene.compile.build_packed_trace_rows): shading payload
# lives in a slot-indexed section after the walk tables. A walker receives
# packed=(pay_base, n_pay, nper) or None; with packed, analytic/miss
# winners encode as n_pay + k and `wrow` carries payload-row slots.
# nper=4: 64-wide rows, PACKED_N tris at stride PACKED_STRIDE from col
# PACKED_BASE with baked normals + per-prim slot cols. nper=3/12: 32/128-
# wide rows, tris at PACKED3_BASES/PACKED12_BASES, normals recomputed
# in-kernel, consecutive slots from col PACKED3_SLOT_COL/PACKED12_SLOT_COL.
PACKED_N = 4
PACKED_BASE = 12
PACKED_STRIDE = 13
PACKED3_N = 3
PACKED3_BASES = (0, 11, 20)
PACKED3_SLOT_COL = 29
# nper=12: 128-wide rows (full HBM DMA width), tris at PACKED12_BASES,
# normals recomputed in-kernel, consecutive slots from col PACKED12_SLOT_COL
PACKED12_N = 12
PACKED12_BASES = (0,) + tuple(11 + 9 * k for k in range(11))
PACKED12_SLOT_COL = 110
# nper=1: SLIM 16-wide rows — prim at cols 0-8, slot at col 11, normal
# recomputed; payload spans SLIM_PAY_STRIDE consecutive 16-wide pay rows
SLIM_SLOT_COL = 11
SLIM_PAY_STRIDE = 2
TILE = SUBLANES * PACKET
# per-sweep channels flushed by the chained kernel as samples finish
# (same order as the wavefront result buffer):
# Lr,Lg,Lb, n1,n2,n3, depth, segs, rows, ar,ag,ab
CHAIN_OUT_CH = 12

KIND_SPHERE = 0.0
KIND_QUAD = 1.0
KIND_TRIANGLE = 2.0

TAG_DIFFUSE = 0.0
TAG_DIFFUSECBOARD = 1.0
TAG_MIRROR = 2.0
TAG_DIELECTRIC = 3.0
TAG_EMISSIVE = 4.0

f32 = jnp.float32
BIG = 3.0e38  # f32-finite stand-in for the reference's 1e100 -> inf tmax


# ----------------------------------------------------------------------------
# RNG (bit-exact shader/rand.glsl, uint32 xorshift + Wang hash)
# ----------------------------------------------------------------------------


def _atan_poly(z):
    """atan(z) for |z| <= 1, minimax odd polynomial (~1e-5 abs error)."""
    t = z * z
    p = f32(0.0208351)
    p = p * t - f32(0.0851330)
    p = p * t + f32(0.1801410)
    p = p * t - f32(0.3302995)
    p = p * t + f32(0.9998660)
    return z * p


def _atan2(y, x):
    """Polynomial atan2 (Mosaic has no native atan2). Only feeds the sphere's
    spherical UV -> checkerboard lookup, so ~1e-5 accuracy is ample. (0,0)
    yields NaN, matching GLSL's undefined atan(0,0) + the NaN guard
    (shader/shapes/sphere.glsl:49-51)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    r = _atan_poly(num / den)
    r = jnp.where(swap, f32(0.5 * M_PI) - r, r)
    r = jnp.where(x < 0, f32(M_PI) - r, r)
    return jnp.where(y < 0, -r, r)


def _asin(x):
    """asin via atan2(x, sqrt(1-x^2)); input pre-clipped to [-1,1]."""
    return _atan2(x, jnp.sqrt(jnp.maximum(f32(1.0) - x * x, f32(0.0))))


def _wang_hash(seed):
    seed = (seed ^ jnp.uint32(61)) ^ (seed >> jnp.uint32(16))
    seed = seed * jnp.uint32(9)
    seed = seed ^ (seed >> jnp.uint32(4))
    seed = seed * jnp.uint32(0x27D4EB2D)
    return seed ^ (seed >> jnp.uint32(15))


def _xorshift(s):
    s = s ^ (s << jnp.uint32(13))
    s = s ^ (s >> jnp.uint32(17))
    return s ^ (s << jnp.uint32(5))


def _u32_to_f32(s):
    """float(u32) like GLSL's randUniformFloat conversion. Mosaic can't cast
    uint32->float32 directly; reinterpret as int32 and correct the sign wrap
    (+2^32 for negative). Matches direct conversion except for possible 1-ULP
    double-rounding on values >= 2^31."""
    i = pltpu.bitcast(s, jnp.int32)
    fv = i.astype(f32)
    return jnp.where(i < 0, fv + f32(4294967296.0), fv)


def _randf(s):
    s = _xorshift(s)
    return s, _u32_to_f32(s) * f32(1.0 / 4294967296.0)


# ----------------------------------------------------------------------------
# In-kernel packet traversal (shared closest-hit / any-hit walker)
# ----------------------------------------------------------------------------


def _check_groups(packet, groups, spec, table_in_hbm):
    """Validate the grouped-walker configuration early (kernel tracing
    failures are opaque). Groups >1 require whole 128-lane VREG rows per
    group, and (for VMEM tables) the spec walker; HBM tables route to the
    DMA-pipelined grouped walker, which overlaps the G groups' row copies."""
    if groups == 1:
        return
    if groups < 1 or packet % (groups * PACKET) != 0:
        raise ValueError(
            f"groups={groups} needs packet to be a multiple of "
            f"{groups * PACKET} (got {packet}): each cursor group must own "
            f"at least one full 128-lane VREG row"
        )
    if not spec and not table_in_hbm:
        raise ValueError("groups>1 requires the spec walker (spec=True)")


def _clamp_trunk(trunk_rows, table_in_hbm, ntab, tbl_rows):
    """Resolve the static VMEM trunk-cache row count: only meaningful for
    single-table HBM walks (octant table sets would need 8 trunks), capped
    at the walk section and rounded down to whole sublane groups for the
    bulk fill DMA. 0 disables the trunk."""
    if not table_in_hbm or ntab != 1 or trunk_rows <= 0:
        return 0
    k = min(int(trunk_rows), tbl_rows)
    return k if k == tbl_rows else (k // SUBLANES) * SUBLANES


def _fetch_rows8(rows_ref, num_rows, cur):
    """Fetch one trace row per packet (8 dynamic slices) -> (8, W)."""
    return jnp.concatenate(
        [
            rows_ref[pl.ds(jnp.minimum(cur[k, 0], num_rows - 1), 1), :]
            for k in range(SUBLANES)
        ],
        axis=0,
    )


def _dma_rows8(rows_ref, num_rows, cur, scratch, sems, slot=0, height=1):
    """Async-copy one (height, 128-wide padded) window of trace rows per
    packet from the HBM-resident table into the VMEM scratch. The slice
    index must be a scalar extracted straight from a loop-carried (8,1)
    cursor: vector index arithmetic feeding a DMA descriptor hits Mosaic's
    unimplemented lane broadcast. Waits re-derive the same descriptors.
    ``slot`` selects a group's 8-sublane region of a (G*8*height, W)
    scratch (grouped/window HBM walkers); sublane k's window occupies
    scratch rows [(slot*8+k)*height, +height). ``height`` > 1 is the
    window-DMA mode (PERF_NOTES §11): extra rows per descriptor are nearly
    free (~429 ns/set at h=1 vs ~450 at h=2 measured), and every visit
    that lands inside the window is served from scratch without a new
    descriptor set."""
    for k in range(SUBLANES):
        # max(0, ...): a table with fewer rows than the window height must
        # not produce a negative slice start (the walker also caps h at the
        # table size, so the window itself stays in bounds)
        pltpu.make_async_copy(
            rows_ref.at[
                pl.ds(
                    jnp.maximum(jnp.minimum(cur[k, 0], num_rows - height), 0),
                    height,
                ),
                :,
            ],
            scratch.at[pl.ds((slot * SUBLANES + k) * height, height), :],
            sems.at[slot * SUBLANES + k],
        ).start()


def _dma_rows8_wait(rows_ref, num_rows, cur, scratch, sems, slot=0, height=1):
    for k in range(SUBLANES):
        pltpu.make_async_copy(
            rows_ref.at[
                pl.ds(
                    jnp.maximum(jnp.minimum(cur[k, 0], num_rows - height), 0),
                    height,
                ),
                :,
            ],
            scratch.at[pl.ds((slot * SUBLANES + k) * height, height), :],
            sems.at[slot * SUBLANES + k],
        ).wait()


def _fetch_rows8_hbm_sync(rows_ref, num_rows, cur, scratch, sems):
    """Synchronous start+wait HBM fetch (the winner-resolve loop: iterations
    are few, latency overlap isn't worth the plumbing)."""
    _dma_rows8(rows_ref, num_rows, cur, scratch, sems)
    _dma_rows8_wait(rows_ref, num_rows, cur, scratch, sems)
    return scratch[...]


def _with_hbm_bufs(cfg, fn, rows_ref=None):
    """Run ``fn(cfg)`` with per-kernel DMA staging buffers in cfg['hbm_bufs']
    when the trace table lives in HBM (cfg['hbm']): one (8,128) VMEM slot
    per cursor group for the walker's pipelined row fetches, one for the
    resolve loop's synchronous fetch, and their DMA semaphores.

    When cfg['trunk_rows'] = K > 0, also allocates a (K, HBM_ROW_WIDTH) VMEM
    trunk cache and fills it once per kernel with the table's first K rows
    (one bulk DMA from ``rows_ref``). Because the threaded walk's cursor is
    strictly increasing (descend = cur+1, skip = exit > cur), the walk splits
    exactly into a VMEM phase (all cursors < K) and a DMA phase — no parking
    or restart logic (see _traverse_hbm_grouped). Preorder tables concentrate
    98-99%% of row visits in the low rows (tools/sim_hbm_topcache.py), so the
    trunk serves almost every iteration at VMEM fetch cost instead of a ~µs
    row copy."""
    if not cfg.get("hbm"):
        fn(cfg)
        return
    G = cfg.get("groups", 1)
    K = cfg.get("trunk_rows", 0)
    H = cfg.get("hbm_window", 1)  # rows per DMA descriptor (window walker)

    if K > 0:
        def inner(scr_a, sem_a, scr_r, sem_r, trunk, sem_t):
            cp = pltpu.make_async_copy(
                rows_ref.at[pl.ds(0, K), :], trunk, sem_t
            )
            cp.start()
            cp.wait()
            fn(dict(cfg, hbm_bufs=(scr_a, sem_a, scr_r, sem_r, trunk)))

        pl.run_scoped(
            inner,
            pltpu.VMEM((G * SUBLANES * H, HBM_ROW_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA((G * SUBLANES,)),
            pltpu.VMEM((SUBLANES, HBM_ROW_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA((SUBLANES,)),
            pltpu.VMEM((K, HBM_ROW_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        )
        return

    def inner(scr_a, sem_a, scr_r, sem_r):
        fn(dict(cfg, hbm_bufs=(scr_a, sem_a, scr_r, sem_r)))

    pl.run_scoped(
        inner,
        pltpu.VMEM((G * SUBLANES * H, HBM_ROW_WIDTH), jnp.float32),
        pltpu.SemaphoreType.DMA((G * SUBLANES,)),
        pltpu.VMEM((SUBLANES, HBM_ROW_WIDTH), jnp.float32),
        pltpu.SemaphoreType.DMA((SUBLANES,)),
    )


def _analytic_pretest(analytic, num_rows, ox, oy, oz, dx, dy, dz, tmin, tmax,
                      want_payload):
    """Test the baked analytic prims (spheres/quads) as compile-time
    immediates, before the triangle-table walk. Returns the walk's init state
    with best_t pre-tightened (analytic hits cull the tree walk).

    Semantics mirror the in-table rows exactly (same accept predicates), so
    the estimator is unchanged; winners are encoded as wrow = num_rows + k,
    miss = num_rows + len(analytic)."""
    zero = jnp.zeros(ox.shape, f32)
    if want_payload:
        best_t, u_o, v_o = tmax, zero, zero
        wrow = jnp.full(ox.shape, num_rows + len(analytic), jnp.int32)
    else:
        hitf = zero
    for k, entry in enumerate(analytic):
        akind = entry[0]
        g = entry[3:12]
        if not want_payload:
            best_t = jnp.where(hitf > 0, tmin, tmax)
        if akind == KIND_SPHERE:
            cxk, cyk, czk, rad = g[0], g[1], g[2], g[3]
            rx = ox - f32(cxk)
            ry = oy - f32(cyk)
            rz = oz - f32(czk)
            sb = f32(2.0) * (dx * rx + dy * ry + dz * rz)
            sc = rx * rx + ry * ry + rz * rz - f32(rad * rad)
            disc = sb * sb - f32(4.0) * sc
            sq = jnp.sqrt(jnp.maximum(disc, f32(0.0)))
            st0 = f32(-0.5) * (sb + sq)
            st1 = f32(-0.5) * (sb - sq)
            ok0 = (tmin <= st0) & (st0 <= best_t)
            ok1 = (tmin <= st1) & (st1 <= best_t)
            pt = jnp.where(ok0, st0, st1)
            phit = (disc >= f32(0.0)) & (ok0 | ok1)
            pu = pv = None
        else:  # quad: v0 origin, v1/v2 edges; precompute the plane normal
            v0 = g[0:3]
            v1 = g[3:6]
            v2 = g[6:9]
            nrm = (
                v1[1] * v2[2] - v1[2] * v2[1],
                v1[2] * v2[0] - v1[0] * v2[2],
                v1[0] * v2[1] - v1[1] * v2[0],
            )
            rx = ox - f32(v0[0])
            ry = oy - f32(v0[1])
            rz = oz - f32(v0[2])
            qx = ry * dz - rz * dy
            qy = rz * dx - rx * dz
            qz = rx * dy - ry * dx
            dd = f32(1.0) / (dx * f32(nrm[0]) + dy * f32(nrm[1]) + dz * f32(nrm[2]))
            pu = -dd * (qx * f32(v2[0]) + qy * f32(v2[1]) + qz * f32(v2[2]))
            pv = dd * (qx * f32(v1[0]) + qy * f32(v1[1]) + qz * f32(v1[2]))
            pt = -dd * (f32(nrm[0]) * rx + f32(nrm[1]) * ry + f32(nrm[2]) * rz)
            phit = (pu >= 0) & (pu <= f32(1.0)) & (pv >= 0) & (pv <= f32(1.0))
            phit &= (tmin <= pt) & (pt <= best_t)
        accept = phit & (pt < best_t)
        if want_payload:
            best_t = jnp.where(accept, pt, best_t)
            # sphere accepts reset uv to 0, matching the walker's
            # where(is_sphere, 0, u) select
            u_o = jnp.where(accept, zero if pu is None else pu, u_o)
            v_o = jnp.where(accept, zero if pv is None else pv, v_o)
            wrow = jnp.where(accept, jnp.int32(num_rows + k), wrow)
        else:
            hitf = jnp.where(accept, f32(1.0), hitf)
    if want_payload:
        return dict(t=best_t, u=u_o, v=v_o, wrow=wrow)
    return dict(hitf=hitf)


def _traverse_spec(rows_ref, tbl_rows, total_rows, analytic, base,
                   ox, oy, oz, dx, dy, dz, tmin, tmax, want_payload,
                   pred=None, packed=None, spec_resolve=False):
    """Software-pipelined packet walk (``spec`` mode, VMEM tables).

    The plain walker's per-iteration critical chain is
    ``cursor -> row fetch -> slab test -> cross-lane descend vote -> cursor``:
    the fetch was taken off the chain by the dual-successor prefetch
    (PERF_NOTES §9f) but the slab + (8,P)->(8,1) vote latency still sits on
    it. Here the descend vote for the *current* row is computed one iteration
    EARLY (on the freshly fetched row, using the post-accept best_t of that
    iteration) and carried — so the successor is already known at iteration
    start, the cursor decision is a couple of (8,1) selects on carries, and
    ONE direct fetch of the next row replaces the two speculative ones
    (8 dynamic slices instead of 16, no (8,32) select). The fetch, slab and
    vote all get a full iteration of latency slack.

    Exactness: the carried vote for row r is computed from exactly the
    best_t / hit state the plain walker's in-iteration slab would read from
    its carries when processing r (post-accept of r's predecessor), so the
    visit sequence and all accepts are IDENTICAL — not merely statistically
    equivalent. The one divergence is the any-hit early exit firing one
    iteration later (the ``done`` vote is carried too), which adds one
    accept-free iteration per fully-resolved shadow packet and slightly
    different ``nit`` counters. Images are bitwise-identical.
    """
    inv_dx = f32(1.0) / dx
    inv_dy = f32(1.0) / dy
    inv_dz = f32(1.0) / dz
    tox = -ox * inv_dx
    toy = -oy * inv_dy
    toz = -oz * inv_dz
    end = base + tbl_rows

    def slab_vote(rows8, best_t, active_s):
        """Descend vote (8,1) for the row in rows8 against best_t."""
        col = lambda j: jnp.broadcast_to(rows8[:, j : j + 1], ox.shape)
        v0x, v0y, v0z = col(0), col(1), col(2)
        v1x, v1y, v1z = col(3), col(4), col(5)
        is_prim_s = rows8[:, 9:10] >= f32(0.0)  # (8,1)
        ax = v0x * inv_dx + tox
        bx = v1x * inv_dx + tox
        ay = v0y * inv_dy + toy
        by = v1y * inv_dy + toy
        az = v0z * inv_dz + toz
        bz = v1z * inv_dz + toz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
            jnp.minimum(az, bz),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
            jnp.maximum(az, bz),
        )
        slab = (t0 < t1 + f32(M_EPS)) & (t0 < best_t) & (t1 > tmin)
        vote = jnp.any(slab & (active_s & ~is_prim_s), axis=1, keepdims=True)
        return jnp.where(vote, f32(1.0), f32(0.0))  # f32 carry (Mosaic-safe)

    def cond(c):
        return jnp.any(c["cur"] < end)

    def body(c):
        cur = c["cur"]
        rows8 = c["rows8"]  # the row at cur (selected last iteration)
        col = lambda j: jnp.broadcast_to(rows8[:, j : j + 1], ox.shape)
        col_s = lambda j: rows8[:, j : j + 1]
        nexit = col_s(10).astype(jnp.int32)
        is_prim_s = col_s(9) >= f32(0.0)
        active = cur < end

        # cursor decision: carries only — no fetch/slab/vote on this chain
        take_exit = is_prim_s | (c["desc"] < f32(0.5))
        nxt = jnp.where(take_exit, nexit, cur + 1)
        if not want_payload:
            nxt = jnp.where(c["done"] > f32(0.5), end, nxt)
        cur_n = jnp.where(active, nxt, cur)
        # next row's data comes from the CARRIED dual prefetch — an
        # in-register select, so the speculative vote below never waits on a
        # load (spec v1 fetched here and put the load latency back on the
        # body; measured 0.915x)
        sel_n = jnp.broadcast_to(take_exit, c["pfa"].shape)
        rows8_n = jnp.where(sel_n, c["pfb"], c["pfa"])

        # primitive test on the current row (identical math to _traverse)
        if want_payload:
            best_t = c["t"]
        else:
            best_t = jnp.where(c["hitf"] > 0, tmin, tmax)
        phit, pt, pu, pv, pslot = _prim_test(
            rows8, ox, oy, oz, dx, dy, dz, tmin, best_t, analytic,
            packed=packed[2] if packed is not None else 0,
        )

        accept = (active & is_prim_s) & phit & (pt < best_t)
        out = dict(c)
        if want_payload:
            out["t"] = jnp.where(accept, pt, c["t"])
            out["u"] = jnp.where(accept, pu, c["u"])
            out["v"] = jnp.where(accept, pv, c["v"])
            if packed is not None:
                win = pslot.astype(jnp.int32)
            else:
                win = jnp.broadcast_to(cur, ox.shape)
            out["wrow"] = jnp.where(accept, win, c["wrow"])
            bt_next = out["t"]
        else:
            out["hitf"] = jnp.where(accept, f32(1.0), c["hitf"])
            if pred is not None:
                out["orow"] = jnp.where(
                    accept, jnp.broadcast_to(cur, ox.shape), c["orow"]
                )
            bt_next = jnp.where(out["hitf"] > 0, tmin, tmax)
            done_v = jnp.all((out["hitf"] > 0) | (tmax < 0), axis=1, keepdims=True)
            out["done"] = jnp.where(done_v, f32(1.0), f32(0.0))

        # speculative vote for the next row (register inputs, no load wait)
        # — consumed next iteration, so its slab + cross-lane reduce latency
        # has a full iteration of slack
        out["desc"] = slab_vote(rows8_n, bt_next, cur_n < end)
        # prefetch BOTH successors of the next row for iteration i+1
        nexit_n = rows8_n[:, 10:11].astype(jnp.int32)
        out["pfa"] = _fetch_rows8(rows_ref, total_rows, cur_n + 1)
        out["pfb"] = _fetch_rows8(rows_ref, total_rows, nexit_n)
        out["cur"] = cur_n
        out["rows8"] = rows8_n
        out["nit"] = c["nit"] + f32(1.0)
        return out

    init = dict(
        cur=base,
        # (8,1): the visit count is per-packet uniform; consumers broadcast
        nit=jnp.zeros((SUBLANES, 1), f32),
    )
    enc = packed[1] if packed is not None else total_rows
    if analytic is not None:
        pre = _analytic_pretest(
            analytic, enc, ox, oy, oz, dx, dy, dz, tmin, tmax, want_payload
        )
        init.update(pre)
    elif want_payload:
        init["t"] = tmax
        init["u"] = jnp.zeros(ox.shape, f32)
        init["v"] = jnp.zeros(ox.shape, f32)
        init["wrow"] = jnp.full(ox.shape, enc, jnp.int32)
    else:
        init["hitf"] = jnp.zeros(ox.shape, f32)
    if not want_payload and pred is not None:
        # shadow-ray occlusion cache: verified predictions resolve lanes
        # before the walk (exact — see _anyhit_pretest)
        ph, vrow = _anyhit_pretest(
            rows_ref, total_rows, analytic, pred,
            ox, oy, oz, dx, dy, dz, tmin, tmax, packed=packed,
        )
        init["hitf"] = jnp.maximum(init["hitf"], ph)
        init["orow"] = vrow
    init["rows8"] = _fetch_rows8(rows_ref, total_rows, base)
    if want_payload:
        bt0 = init["t"]
    else:
        bt0 = jnp.where(init["hitf"] > 0, tmin, tmax)
        done0 = jnp.all((init["hitf"] > 0) | (tmax < 0), axis=1, keepdims=True)
        init["done"] = jnp.where(done0, f32(1.0), f32(0.0))
    init["desc"] = slab_vote(init["rows8"], bt0, base < end)
    nexit0 = init["rows8"][:, 10:11].astype(jnp.int32)
    init["pfa"] = _fetch_rows8(rows_ref, total_rows, base + 1)
    init["pfb"] = _fetch_rows8(rows_ref, total_rows, nexit0)

    final = jax.lax.while_loop(cond, body, init)
    if not want_payload:
        final = dict(final)
        final.pop("done")
    if not want_payload:
        return final
    return _resolve_winners(rows_ref, total_rows, analytic, final,
                            hbm_bufs=None, packed=packed,
                            pipelined=spec_resolve)


def _prim_test(rows8, ox, oy, oz, dx, dy, dz, tmin, best_t, analytic,
               packed=False):
    """Unified primitive test of one trace row against a ray group.

    Identical math to the inlined blocks in ``_traverse``/``_traverse_spec``
    (plane-normal cols 29-31 precomputed at scene compile); shapes follow
    ``ox``. Returns (phit, pt, pu, pv, pslot); pslot is None unless packed.

    ``packed``: prims per packed row — 0 = classic single-prim row, 3/12 =
    the 32/128-wide PACKED3/PACKED12 formats (normals recomputed in-kernel,
    consecutive slots from one base col), 4 = the 64-wide format (baked
    normals, per-prim slot cols). Analytic tables only — see scene.compile.
    All packed prims
    are tested and reduced by a strict-min-t tournament with earliest-prim
    tie-break — exactly the outcome of the sequential unpacked walk over
    the same leaf (each accept there requires strictly smaller t than
    every earlier accept), so packing is estimator-exact at equal tree
    shape. Leaf pads (duplicates in the 64-wide format, degenerate zero
    triangles in PACKED3) can never win the tournament. pslot is the
    winner's payload-row index as f32; garbage where ~phit (callers gate
    on phit). Interior rows' prim columns yield NaN t and all-false hits.
    """
    shp = ox.shape
    col = lambda j: jnp.broadcast_to(rows8[:, j : j + 1], shp)
    if packed:
        assert analytic is not None, (
            "packed trace rows are triangle-only (analytic mode)"
        )
        bhit = bt = bu = bv = bsl = None
        for k in range(packed):
            if packed == 1:
                B = 0
            elif packed == PACKED3_N:
                B = PACKED3_BASES[k]
            elif packed == PACKED12_N:
                B = PACKED12_BASES[k]
            else:
                B = PACKED_BASE + PACKED_STRIDE * k
            v0x, v0y, v0z = col(B), col(B + 1), col(B + 2)
            v1x, v1y, v1z = col(B + 3), col(B + 4), col(B + 5)
            v2x, v2y, v2z = col(B + 6), col(B + 7), col(B + 8)
            if packed in (1, PACKED3_N, PACKED12_N):
                # recompute the plane normal (ULP-class vs the numpy bake —
                # same winners); VPU issue slots are not the walker's
                # bottleneck (PERF_NOTES §9s), keeping rows at fetch width
                # 16/32
                nx = v1y * v2z - v1z * v2y
                ny = v1z * v2x - v1x * v2z
                nz = v1x * v2y - v1y * v2x
            else:
                nx, ny, nz = col(B + 9), col(B + 10), col(B + 11)
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
            if packed == 1:
                sl = col(SLIM_SLOT_COL)
            elif packed in (PACKED3_N, PACKED12_N):
                sl = f32(k)  # literal; winner adds the base-slot col below
            else:
                sl = col(B + 12)
            if bhit is None:
                bhit, bt, bu, bv, bsl = phit, t_pq, u, v, sl
            else:
                better = phit & (~bhit | (t_pq < bt))
                bt = jnp.where(better, t_pq, bt)
                bu = jnp.where(better, u, bu)
                bv = jnp.where(better, v, bv)
                bsl = jnp.where(better, sl, bsl)
                bhit = bhit | phit
        if packed == PACKED3_N:
            bsl = col(PACKED3_SLOT_COL) + bsl
        elif packed == PACKED12_N:
            bsl = col(PACKED12_SLOT_COL) + bsl
        return bhit, bt, bu, bv, bsl
    v0x, v0y, v0z = col(0), col(1), col(2)
    v1x, v1y, v1z = col(3), col(4), col(5)
    v2x, v2y, v2z = col(6), col(7), col(8)
    nx, ny, nz = col(29), col(30), col(31)
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
    in_tri = (u >= 0) & (v >= 0) & (u + v <= f32(1.0))
    if analytic is not None:
        # (t_pq <= best_t) is implied by the accept's strict (pt < best_t)
        phit = in_tri & (tmin <= t_pq)
        return phit, t_pq, u, v, None
    kind = col(9)
    is_tri = kind == f32(KIND_TRIANGLE)
    in_quad = (u >= 0) & (u <= f32(1.0)) & (v >= 0) & (v <= f32(1.0))
    ok_pq = (is_tri & in_tri) | (~is_tri & in_quad)
    ok_pq &= (tmin <= t_pq) & (t_pq <= best_t)
    radius = v1x
    sb = f32(2.0) * (dx * rx + dy * ry + dz * rz)
    sc = rx * rx + ry * ry + rz * rz - radius * radius
    disc = sb * sb - f32(4.0) * sc
    sq = jnp.sqrt(jnp.maximum(disc, f32(0.0)))
    st0 = f32(-0.5) * (sb + sq)
    st1 = f32(-0.5) * (sb - sq)
    ok0 = (tmin <= st0) & (st0 <= best_t)
    ok1 = (tmin <= st1) & (st1 <= best_t)
    t_s = jnp.where(ok0, st0, st1)
    ok_s = (disc >= f32(0.0)) & (ok0 | ok1)
    is_sphere = kind == f32(KIND_SPHERE)
    phit = (is_sphere & ok_s) | (~is_sphere & ok_pq)
    pt = jnp.where(is_sphere, t_s, t_pq)
    zero = jnp.zeros_like(pt)
    pu = jnp.where(is_sphere, zero, u)
    pv = jnp.where(is_sphere, zero, v)
    return phit, pt, pu, pv, None


def _traverse_spec_grouped(rows_ref, tbl_rows, total_rows, analytic, base,
                           ox, oy, oz, dx, dy, dz, tmin, tmax, want_payload,
                           groups, pred=None, group_octant=True, packed=None,
                           spec_resolve=False):
    """Grouped software-pipelined walk: G independent cursor groups per tile.

    The packet-union tax scales with lanes-per-cursor (per-sublane unions,
    PERF_NOTES §9d: ~73 row visits at 128 lanes vs ~262 at 1024), while the
    per-iteration VPU issue count scales with TOTAL lanes. Splitting the
    (8, P) tile's lane dim into ``groups`` groups of P/G lanes — each with
    its own (8,1) cursor set, carried row, and carried descend vote — keeps
    the iteration issue count of the wide tile (G × ops on (8, P/G) arrays,
    all independent chains, so the latency-bubble fill of §9d is preserved)
    but lets every group retire after ITS OWN union, not the tile-wide one.
    The loop runs until the slowest group finishes; finished groups idle
    (masked) — the max-over-groups inflation and the G× dynamic-slice fetch
    issue cost are what the union shrinkage has to beat.

    Groups fetch their next row directly (8 slices/group/iter, half of the
    dual-prefetch volume); the fetch→vote chain that made direct fetch a
    0.915x loss at G=1 (§9j spec-v1) is hidden here by the other groups'
    interleaved test math. The carried-vote pipelining of ``_traverse_spec``
    is kept, so the cursor decision still reads only carries.

    Exactness: each lane's visit sequence is the walk of its own group's
    union in table order — the same subsequence semantics as any packet
    width; per-lane accepts are unchanged and images differ from other
    widths/groupings only in t-tie winners (PERF_NOTES §9d). ``base``
    (octant table choice) is the caller's full-tile majority vote, shared
    by all groups.
    """
    G = groups
    P = ox.shape[1]
    W = P // G

    def split(a):
        return [a[:, g * W : (g + 1) * W] for g in range(G)]

    oxg, oyg, ozg = split(ox), split(oy), split(oz)
    dxg, dyg, dzg = split(dx), split(dy), split(dz)
    tming, tmaxg = split(tmin), split(tmax)
    predg = split(pred) if pred is not None else [None] * G
    # per-group octant table choice: each group votes its OWN majority
    # octant (what a genuinely narrow packet would do; the caller's `base`
    # is the full-tile vote). Init-only cost; table choice never affects
    # correctness (octant tables are alternate orderings of the same tree).
    # with a packed payload section appended, only rows below pay_base are
    # walk tables
    n_walk = packed[0] if packed is not None else total_rows
    ntab = n_walk // tbl_rows
    if group_octant and ntab > 1 and G > 1:
        bases = [
            _octant_base(tmaxg[g] >= 0, dxg[g], dyg[g], dzg[g],
                         tbl_rows, ntab)
            for g in range(G)
        ]
    else:
        bases = [base] * G
    ends = [b + tbl_rows for b in bases]
    invg = [
        (f32(1.0) / dxg[g], f32(1.0) / dyg[g], f32(1.0) / dzg[g])
        for g in range(G)
    ]
    tog = [
        (-oxg[g] * invg[g][0], -oyg[g] * invg[g][1], -ozg[g] * invg[g][2])
        for g in range(G)
    ]

    def slab_vote(g, rows8, best_t, active_s):
        """Descend vote (8,1) for the row in rows8 against group g."""
        inv_dx, inv_dy, inv_dz = invg[g]
        tox, toy, toz = tog[g]
        col = lambda j: jnp.broadcast_to(rows8[:, j : j + 1], (SUBLANES, W))
        v0x, v0y, v0z = col(0), col(1), col(2)
        v1x, v1y, v1z = col(3), col(4), col(5)
        is_prim_s = rows8[:, 9:10] >= f32(0.0)  # (8,1)
        ax = v0x * inv_dx + tox
        bx = v1x * inv_dx + tox
        ay = v0y * inv_dy + toy
        by = v1y * inv_dy + toy
        az = v0z * inv_dz + toz
        bz = v1z * inv_dz + toz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
            jnp.minimum(az, bz),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
            jnp.maximum(az, bz),
        )
        slab = (t0 < t1 + f32(M_EPS)) & (t0 < best_t) & (t1 > tming[g])
        vote = jnp.any(slab & (active_s & ~is_prim_s), axis=1, keepdims=True)
        return jnp.where(vote, f32(1.0), f32(0.0))  # f32 carry (Mosaic-safe)

    def cond(c):
        alive = c["g0"]["cur"] < ends[0]
        for g in range(1, G):
            alive = alive | (c[f"g{g}"]["cur"] < ends[g])
        return jnp.any(alive)

    def body(c):
        out = {"nit": c["nit"] + f32(1.0)}
        curs_n = []
        rows_n = []
        # pass 1: all cursor decisions ((8,1) carries only) + next-row
        # fetches — issued up front so each load's latency is buried under
        # the other groups' pass-2 test math
        for g in range(G):
            cg = c[f"g{g}"]
            rows8 = cg["rows8"]
            nexit = rows8[:, 10:11].astype(jnp.int32)
            is_prim_s = rows8[:, 9:10] >= f32(0.0)
            active = cg["cur"] < ends[g]
            take_exit = is_prim_s | (cg["desc"] < f32(0.5))
            nxt = jnp.where(take_exit, nexit, cg["cur"] + 1)
            if not want_payload:
                nxt = jnp.where(cg["done"] > f32(0.5), ends[g], nxt)
            cur_n = jnp.where(active, nxt, cg["cur"])
            curs_n.append(cur_n)
            rows_n.append(_fetch_rows8(rows_ref, total_rows, cur_n))
        # pass 2: per group, primitive test on the current (carried) row,
        # then the speculative vote for the just-fetched next row
        for g in range(G):
            cg = c[f"g{g}"]
            ng = dict(cg)
            rows8 = cg["rows8"]
            is_prim_s = rows8[:, 9:10] >= f32(0.0)
            active = cg["cur"] < ends[g]
            if want_payload:
                best_t = cg["t"]
            else:
                best_t = jnp.where(cg["hitf"] > 0, tming[g], tmaxg[g])
            phit, pt, pu, pv, pslot = _prim_test(
                rows8, oxg[g], oyg[g], ozg[g], dxg[g], dyg[g], dzg[g],
                tming[g], best_t, analytic,
                packed=packed[2] if packed is not None else 0,
            )
            accept = (active & is_prim_s) & phit & (pt < best_t)
            if want_payload:
                ng["t"] = jnp.where(accept, pt, cg["t"])
                ng["u"] = jnp.where(accept, pu, cg["u"])
                ng["v"] = jnp.where(accept, pv, cg["v"])
                if packed is not None:
                    win = pslot.astype(jnp.int32)
                else:
                    win = jnp.broadcast_to(cg["cur"], (SUBLANES, W))
                ng["wrow"] = jnp.where(accept, win, cg["wrow"])
                bt_next = ng["t"]
            else:
                ng["hitf"] = jnp.where(accept, f32(1.0), cg["hitf"])
                if pred is not None:
                    ng["orow"] = jnp.where(
                        accept,
                        jnp.broadcast_to(cg["cur"], (SUBLANES, W)),
                        cg["orow"],
                    )
                bt_next = jnp.where(ng["hitf"] > 0, tming[g], tmaxg[g])
                done_v = jnp.all(
                    (ng["hitf"] > 0) | (tmaxg[g] < 0), axis=1, keepdims=True
                )
                ng["done"] = jnp.where(done_v, f32(1.0), f32(0.0))
            ng["desc"] = slab_vote(g, rows_n[g], bt_next, curs_n[g] < ends[g])
            ng["cur"] = curs_n[g]
            ng["rows8"] = rows_n[g]
            out[f"g{g}"] = ng
        return out

    init = {"nit": jnp.zeros((SUBLANES, 1), f32)}
    enc = packed[1] if packed is not None else total_rows
    for g in range(G):
        rows0 = _fetch_rows8(rows_ref, total_rows, bases[g])
        gi = dict(cur=bases[g])
        if analytic is not None:
            gi.update(_analytic_pretest(
                analytic, enc, oxg[g], oyg[g], ozg[g],
                dxg[g], dyg[g], dzg[g], tming[g], tmaxg[g], want_payload,
            ))
        elif want_payload:
            gi["t"] = tmaxg[g]
            gi["u"] = jnp.zeros((SUBLANES, W), f32)
            gi["v"] = jnp.zeros((SUBLANES, W), f32)
            gi["wrow"] = jnp.full((SUBLANES, W), enc, jnp.int32)
        else:
            gi["hitf"] = jnp.zeros((SUBLANES, W), f32)
        if not want_payload and pred is not None:
            ph, vrow = _anyhit_pretest(
                rows_ref, total_rows, analytic, predg[g],
                oxg[g], oyg[g], ozg[g], dxg[g], dyg[g], dzg[g],
                tming[g], tmaxg[g], packed=packed,
            )
            gi["hitf"] = jnp.maximum(gi["hitf"], ph)
            gi["orow"] = vrow
        gi["rows8"] = rows0
        if want_payload:
            bt0 = gi["t"]
        else:
            bt0 = jnp.where(gi["hitf"] > 0, tming[g], tmaxg[g])
            done0 = jnp.all(
                (gi["hitf"] > 0) | (tmaxg[g] < 0), axis=1, keepdims=True
            )
            gi["done"] = jnp.where(done0, f32(1.0), f32(0.0))
        gi["desc"] = slab_vote(g, rows0, bt0, bases[g] < ends[g])
        init[f"g{g}"] = gi

    final = jax.lax.while_loop(cond, body, init)
    cat = lambda k: jnp.concatenate(
        [final[f"g{g}"][k] for g in range(G)], axis=1
    )
    if not want_payload:
        outd = dict(hitf=cat("hitf"), nit=final["nit"])
        if pred is not None:
            outd["orow"] = cat("orow")
        return outd
    walk = dict(t=cat("t"), u=cat("u"), v=cat("v"), wrow=cat("wrow"),
                nit=final["nit"])
    return _resolve_winners(rows_ref, total_rows, analytic, walk,
                            hbm_bufs=None, packed=packed,
                            pipelined=spec_resolve)


def _traverse_hbm_grouped(rows_ref, tbl_rows, total_rows, analytic, base,
                          ox, oy, oz, dx, dy, dz, tmin, tmax, want_payload,
                          groups, hbm_bufs, group_octant=True, packed=None,
                          spec_resolve=False, trunk_rows=0):
    """Grouped DMA-pipelined walk of an HBM-resident table: G independent
    cursor groups, each with its own (8, HBM_ROW_WIDTH) scratch slot and
    in-flight row copy.

    The single-cursor HBM walk (in ``_traverse``) hides each row DMA behind
    only ONE group's primitive test (~100-200 ns of math under a ~µs copy
    latency) — the walk is DMA-latency-bound. Here iteration i overlaps all
    G copies: pass 1 (per group: wait for its row, slab-vote, decide the
    cursor, start the NEXT copy) means group g's in-flight copy has the
    remaining groups' pass-1 math plus the whole of pass 2 (all G prim
    tests) to land before its wait at iteration i+1. Group unions also
    shrink exactly as in the VMEM grouped walker (PERF_NOTES §9m).

    ``trunk_rows`` = K > 0 enables the VMEM trunk cache (hbm_bufs[4],
    filled by _with_hbm_bufs with the table's first K rows): the threaded
    walk's cursor is strictly increasing (descend = cur+1, skip = exit >
    cur), so every walk splits exactly into phase A — all fetches from the
    VMEM trunk while cursors are < K — and phase B, the DMA walk below,
    resumed from phase A's cursors/state. Preorder tables put 98-99% of
    row visits below small K (tools/sim_hbm_topcache.py), and for PACKED
    formats the whole WALK section often fits (payload rows stay in HBM
    for the resolve loop), in which case phase B is skipped entirely at
    trace time (K == tbl_rows).

    Exactness: identical per-lane accept semantics to every other walker;
    images differ only in t-tie winners across groupings (the trunk split
    itself changes nothing: per sublane-cursor the visited-row sequence and
    every accept predicate are identical with or without it). The any-hit
    early exit tests the previous iteration's hit flags (one extra
    iteration, exact otherwise) — same as the single-cursor DMA walk.
    """
    G = groups
    P = ox.shape[1]
    W = P // G
    scr_a, sem_a = hbm_bufs[:2]  # (G*8, HBM_ROW_WIDTH) scratch, (G*8,) sems

    def split(a):
        return [a[:, g * W : (g + 1) * W] for g in range(G)]

    oxg, oyg, ozg = split(ox), split(oy), split(oz)
    dxg, dyg, dzg = split(dx), split(dy), split(dz)
    tming, tmaxg = split(tmin), split(tmax)
    n_walk = packed[0] if packed is not None else total_rows
    ntab = n_walk // tbl_rows
    if group_octant and ntab > 1 and G > 1:
        bases = [
            _octant_base(tmaxg[g] >= 0, dxg[g], dyg[g], dzg[g],
                         tbl_rows, ntab)
            for g in range(G)
        ]
    else:
        bases = [base] * G
    ends = [b + tbl_rows for b in bases]
    invg = [
        (f32(1.0) / dxg[g], f32(1.0) / dyg[g], f32(1.0) / dzg[g])
        for g in range(G)
    ]
    tog = [
        (-oxg[g] * invg[g][0], -oyg[g] * invg[g][1], -ozg[g] * invg[g][2])
        for g in range(G)
    ]

    def slab_vote(g, rows8, best_t, active_s):
        inv_dx, inv_dy, inv_dz = invg[g]
        tox, toy, toz = tog[g]
        col = lambda j: jnp.broadcast_to(rows8[:, j : j + 1], (SUBLANES, W))
        v0x, v0y, v0z = col(0), col(1), col(2)
        v1x, v1y, v1z = col(3), col(4), col(5)
        is_prim_s = rows8[:, 9:10] >= f32(0.0)
        ax = v0x * inv_dx + tox
        bx = v1x * inv_dx + tox
        ay = v0y * inv_dy + toy
        by = v1y * inv_dy + toy
        az = v0z * inv_dz + toz
        bz = v1z * inv_dz + toz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
            jnp.minimum(az, bz),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
            jnp.maximum(az, bz),
        )
        slab = (t0 < t1 + f32(M_EPS)) & (t0 < best_t) & (t1 > tming[g])
        return jnp.any(slab & (active_s & ~is_prim_s), axis=1, keepdims=True)

    def cond(c):
        alive = c["g0"]["cur"] < ends[0]
        for g in range(1, G):
            alive = alive | (c[f"g{g}"]["cur"] < ends[g])
        return jnp.any(alive)

    def body(c):
        out = {"nit": c["nit"] + f32(1.0)}
        rows_g = []
        curs_n = []
        # pass 1: per group — wait for its in-flight row, read it, vote,
        # decide the cursor, and start the next copy immediately
        for g in range(G):
            cg = c[f"g{g}"]
            cur = cg["cur"]
            _dma_rows8_wait(rows_ref, total_rows, cur, scr_a, sem_a, slot=g)
            rows8 = scr_a[g * SUBLANES : (g + 1) * SUBLANES, :]
            nexit = rows8[:, 10:11].astype(jnp.int32)
            is_prim_s = rows8[:, 9:10] >= f32(0.0)
            active = cur < ends[g]
            if want_payload:
                best_t = cg["t"]
            else:
                best_t = jnp.where(cg["hitf"] > 0, tming[g], tmaxg[g])
            descend = slab_vote(g, rows8, best_t, active)
            nxt = jnp.where(is_prim_s | ~descend, nexit, cur + 1)
            if not want_payload:
                # early exit on the PREVIOUS iteration's flags (this row's
                # accepts land in pass 2)
                done_prev = jnp.all(
                    (cg["hitf"] > 0) | (tmaxg[g] < 0), axis=1, keepdims=True
                )
                nxt = jnp.where(done_prev, ends[g], nxt)
            nxt = jnp.where(active, nxt, cur)
            _dma_rows8(rows_ref, total_rows, nxt, scr_a, sem_a, slot=g)
            rows_g.append(rows8)
            curs_n.append(nxt)
        # pass 2: per group, primitive test of the current row — overlaps
        # every group's in-flight copy
        for g in range(G):
            cg = c[f"g{g}"]
            ng = dict(cg)
            rows8 = rows_g[g]
            is_prim_s = rows8[:, 9:10] >= f32(0.0)
            active = cg["cur"] < ends[g]
            if want_payload:
                best_t = cg["t"]
            else:
                best_t = jnp.where(cg["hitf"] > 0, tming[g], tmaxg[g])
            phit, pt, pu, pv, pslot = _prim_test(
                rows8, oxg[g], oyg[g], ozg[g], dxg[g], dyg[g], dzg[g],
                tming[g], best_t, analytic,
                packed=packed[2] if packed is not None else 0,
            )
            accept = (active & is_prim_s) & phit & (pt < best_t)
            if want_payload:
                ng["t"] = jnp.where(accept, pt, cg["t"])
                ng["u"] = jnp.where(accept, pu, cg["u"])
                ng["v"] = jnp.where(accept, pv, cg["v"])
                if packed is not None:
                    win = pslot.astype(jnp.int32)
                else:
                    win = jnp.broadcast_to(cg["cur"], (SUBLANES, W))
                ng["wrow"] = jnp.where(accept, win, cg["wrow"])
            else:
                ng["hitf"] = jnp.where(accept, f32(1.0), cg["hitf"])
            ng["cur"] = curs_n[g]
            out[f"g{g}"] = ng
        return out

    use_trunk = trunk_rows > 0 and len(hbm_bufs) > 4
    trunk = hbm_bufs[4] if use_trunk else None

    def cond_a(c):
        alive = c["g0"]["cur"] < trunk_rows
        for g in range(1, G):
            alive = alive | (c[f"g{g}"]["cur"] < trunk_rows)
        return jnp.any(alive)

    def body_a(c):
        # phase A: plain VMEM fetch walk over the trunk (classic-walker
        # structure — fused vote + prim test, fresh-flag any-hit exit);
        # cursors that cross K (or finish) freeze until phase B
        out = {"nit": c["nit"] + f32(1.0)}
        for g in range(G):
            cg = c[f"g{g}"]
            cur = cg["cur"]
            rows8 = _fetch_rows8(trunk, trunk_rows, cur)
            nexit = rows8[:, 10:11].astype(jnp.int32)
            is_prim_s = rows8[:, 9:10] >= f32(0.0)
            active = cur < trunk_rows
            if want_payload:
                best_t = cg["t"]
            else:
                best_t = jnp.where(cg["hitf"] > 0, tming[g], tmaxg[g])
            descend = slab_vote(g, rows8, best_t, active)
            phit, pt, pu, pv, pslot = _prim_test(
                rows8, oxg[g], oyg[g], ozg[g], dxg[g], dyg[g], dzg[g],
                tming[g], best_t, analytic,
                packed=packed[2] if packed is not None else 0,
            )
            accept = (active & is_prim_s) & phit & (pt < best_t)
            ng = dict(cg)
            if want_payload:
                ng["t"] = jnp.where(accept, pt, cg["t"])
                ng["u"] = jnp.where(accept, pu, cg["u"])
                ng["v"] = jnp.where(accept, pv, cg["v"])
                if packed is not None:
                    win = pslot.astype(jnp.int32)
                else:
                    win = jnp.broadcast_to(cur, (SUBLANES, W))
                ng["wrow"] = jnp.where(accept, win, cg["wrow"])
            else:
                ng["hitf"] = jnp.where(accept, f32(1.0), cg["hitf"])
            nxt = jnp.where(is_prim_s | ~descend, nexit, cur + 1)
            if not want_payload:
                done = jnp.all(
                    (ng["hitf"] > 0) | (tmaxg[g] < 0), axis=1, keepdims=True
                )
                nxt = jnp.where(done, ends[g], nxt)
            ng["cur"] = jnp.where(active, nxt, cur)
            out[f"g{g}"] = ng
        return out

    init = {"nit": jnp.zeros((SUBLANES, 1), f32)}
    enc = packed[1] if packed is not None else total_rows
    for g in range(G):
        gi = dict(cur=bases[g])
        if analytic is not None:
            gi.update(_analytic_pretest(
                analytic, enc, oxg[g], oyg[g], ozg[g],
                dxg[g], dyg[g], dzg[g], tming[g], tmaxg[g], want_payload,
            ))
        elif want_payload:
            gi["t"] = tmaxg[g]
            gi["u"] = jnp.zeros((SUBLANES, W), f32)
            gi["v"] = jnp.zeros((SUBLANES, W), f32)
            gi["wrow"] = jnp.full((SUBLANES, W), enc, jnp.int32)
        else:
            gi["hitf"] = jnp.zeros((SUBLANES, W), f32)
        init[f"g{g}"] = gi

    if use_trunk:
        init = jax.lax.while_loop(cond_a, body_a, init)

    if use_trunk and trunk_rows >= tbl_rows:
        # the trunk holds the entire walk section: every cursor is already
        # past its end — the DMA phase has nothing to do (statically known)
        final = init
    else:
        for g in range(G):
            _dma_rows8(
                rows_ref, total_rows, init[f"g{g}"]["cur"], scr_a, sem_a,
                slot=g,
            )
        final = jax.lax.while_loop(cond, body, init)
        for g in range(G):
            # drain the final in-flight copies so the scoped semaphores end
            # at 0
            _dma_rows8_wait(
                rows_ref, total_rows, final[f"g{g}"]["cur"], scr_a, sem_a,
                slot=g,
            )
    cat = lambda k: jnp.concatenate(
        [final[f"g{g}"][k] for g in range(G)], axis=1
    )
    if not want_payload:
        return dict(hitf=cat("hitf"), nit=final["nit"])
    walk = dict(t=cat("t"), u=cat("u"), v=cat("v"), wrow=cat("wrow"),
                nit=final["nit"])
    return _resolve_winners(rows_ref, total_rows, analytic, walk,
                            hbm_bufs=hbm_bufs, packed=packed,
                            pipelined=spec_resolve)


def _traverse_hbm_window(rows_ref, tbl_rows, total_rows, analytic, base,
                         ox, oy, oz, dx, dy, dz, tmin, tmax, want_payload,
                         groups, hbm_bufs, height=2, group_octant=True,
                         packed=None, spec_resolve=False):
    """Window-DMA walk of an HBM-resident table: each sublane cursor's
    descriptor copies ``height`` consecutive rows [cur, cur+h), and every
    visit that lands inside the window is served from VMEM scratch without
    a new descriptor set.

    Motivation (PERF_NOTES §11): the grouped HBM walk's ~636 ns group-step
    is ~2/3 DMA descriptor overhead (429 ns/set measured), while extra
    window rows are nearly free (h=2 set: 450 ns). The threaded walk's
    cursor is strictly increasing and its +1 step rate is ~0.5-0.65 on the
    real cfg4b table (descend = cur+1, AND consecutive leaf rows exit to
    cur+1), so an h-row window serves ~1.5-1.6 visits per descriptor set
    (tools/sim_dma_window.py: h=2 rounds 0.61x/0.67x camera/bounce).

    Body per group: wait the in-flight windows, then run ``height``
    unrolled steps — step j's row data is the scratch window row j, and a
    sublane participates in step j exactly when its running cursor sits at
    window row j (per-sublane (8,1) masks; lanes whose next visit left the
    window idle for the remaining steps) — then start the next window DMA
    at the final cursors.

    Exactness: per sublane-cursor the visited-row sequence and every
    accept predicate are identical to the grouped single-row walk (step
    masks only gate WHERE a row is read from); the any-hit early exit
    tests the previous round's flags (same one-extra-iteration semantics
    as _traverse_hbm_grouped). Images are bitwise-identical to the grouped
    walker at the same G (tests/test_megakernel.py).
    """
    G = groups
    h = height
    P = ox.shape[1]
    W = P // G
    scr_a, sem_a = hbm_bufs[:2]  # (G*8*h, HBM_ROW_WIDTH) scratch

    def split(a):
        return [a[:, g * W : (g + 1) * W] for g in range(G)]

    oxg, oyg, ozg = split(ox), split(oy), split(oz)
    dxg, dyg, dzg = split(dx), split(dy), split(dz)
    tming, tmaxg = split(tmin), split(tmax)
    n_walk = packed[0] if packed is not None else total_rows
    ntab = n_walk // tbl_rows
    if group_octant and ntab > 1 and G > 1:
        bases = [
            _octant_base(tmaxg[g] >= 0, dxg[g], dyg[g], dzg[g],
                         tbl_rows, ntab)
            for g in range(G)
        ]
    else:
        bases = [base] * G
    ends = [b + tbl_rows for b in bases]
    invg = [
        (f32(1.0) / dxg[g], f32(1.0) / dyg[g], f32(1.0) / dzg[g])
        for g in range(G)
    ]
    tog = [
        (-oxg[g] * invg[g][0], -oyg[g] * invg[g][1], -ozg[g] * invg[g][2])
        for g in range(G)
    ]

    def slab_vote(g, rows8, best_t, active_s):
        inv_dx, inv_dy, inv_dz = invg[g]
        tox, toy, toz = tog[g]
        col = lambda j: jnp.broadcast_to(rows8[:, j : j + 1], (SUBLANES, W))
        v0x, v0y, v0z = col(0), col(1), col(2)
        v1x, v1y, v1z = col(3), col(4), col(5)
        is_prim_s = rows8[:, 9:10] >= f32(0.0)
        ax = v0x * inv_dx + tox
        bx = v1x * inv_dx + tox
        ay = v0y * inv_dy + toy
        by = v1y * inv_dy + toy
        az = v0z * inv_dz + toz
        bz = v1z * inv_dz + toz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
            jnp.minimum(az, bz),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
            jnp.maximum(az, bz),
        )
        slab = (t0 < t1 + f32(M_EPS)) & (t0 < best_t) & (t1 > tming[g])
        return jnp.any(slab & (active_s & ~is_prim_s), axis=1, keepdims=True)

    def window_rows(g, j):
        """(8,128) — scratch row j of every sublane window in group g
        (static slices; sublane k's window is scratch rows
        [(g*8+k)*h, +h))."""
        return jnp.concatenate(
            [
                scr_a[(g * SUBLANES + k) * h + j : (g * SUBLANES + k) * h + j + 1, :]
                for k in range(SUBLANES)
            ],
            axis=0,
        )

    def cond(c):
        alive = c["g0"]["cur"] < ends[0]
        for g in range(1, G):
            alive = alive | (c[f"g{g}"]["cur"] < ends[g])
        return jnp.any(alive)

    def body(c):
        out = {"nit": c["nit"] + f32(1.0)}
        for g in range(G):
            cg = c[f"g{g}"]
            ng = dict(cg)
            wb = cg["cur"]  # window base == cursor at round start
            # the DMA clamps its source to total_rows - h; the scratch then
            # holds table rows [fb, fb+h) — step matching must use fb, not
            # wb, or a clamped window would serve mislabeled rows
            fb = jnp.minimum(wb, total_rows - h)
            active0 = wb < ends[g]
            if not want_payload:
                done_prev = jnp.all(
                    (cg["hitf"] > 0) | (tmaxg[g] < 0), axis=1, keepdims=True
                )
                active0 = active0 & ~done_prev
            _dma_rows8_wait(
                rows_ref, total_rows, wb, scr_a, sem_a, slot=g, height=h
            )
            run = wb
            for j in range(h):
                rows8 = window_rows(g, j)
                # per-step end-of-table bound: a cursor that finishes
                # mid-window (the last walk row's exit == ends[g]) must not
                # match a later step whose window row sits at/past ends[g]
                # — for packed formats those are payload rows whose col 9
                # holds arbitrary shading floats, and _prim_test over
                # payload garbage could spuriously accept a hit (round-4
                # advisor finding; boundary case in test_hbm_window_bitwise)
                on = active0 & (run == fb + j) & (run < ends[g])
                nexit = rows8[:, 10:11].astype(jnp.int32)
                is_prim_s = rows8[:, 9:10] >= f32(0.0)
                if want_payload:
                    best_t = ng["t"]
                else:
                    best_t = jnp.where(ng["hitf"] > 0, tming[g], tmaxg[g])
                phit, pt, pu, pv, pslot = _prim_test(
                    rows8, oxg[g], oyg[g], ozg[g], dxg[g], dyg[g], dzg[g],
                    tming[g], best_t, analytic,
                    packed=packed[2] if packed is not None else 0,
                )
                accept = (on & is_prim_s) & phit & (pt < best_t)
                if want_payload:
                    ng["t"] = jnp.where(accept, pt, ng["t"])
                    ng["u"] = jnp.where(accept, pu, ng["u"])
                    ng["v"] = jnp.where(accept, pv, ng["v"])
                    if packed is not None:
                        win = pslot.astype(jnp.int32)
                    else:
                        win = jnp.broadcast_to(run, (SUBLANES, W))
                    ng["wrow"] = jnp.where(accept, win, ng["wrow"])
                    bt_post = ng["t"]
                else:
                    ng["hitf"] = jnp.where(accept, f32(1.0), ng["hitf"])
                    bt_post = jnp.where(ng["hitf"] > 0, tming[g], tmaxg[g])
                descend = slab_vote(g, rows8, bt_post, on)
                nxt = jnp.where(is_prim_s | ~descend, nexit, run + 1)
                # walk-invariant clamp: a valid threaded table always has
                # exit > cur, so max() is an identity on real data — but it
                # is LOAD-BEARING on hardware: without it the crash config
                # (405k-tri table, P>=512, h=2) kills the TPU worker with a
                # kernel fault, and with it the same config completes with
                # the exact h=1 image sum (round-4 repro series). The
                # working theory is a transient early/mismatched window
                # read whose garbage exit column would otherwise drive the
                # cursor backward (unbounded walk) or negative (bad DMA
                # address); the clamp bounds the cursor to strictly
                # increasing, which also bounds every derived DMA index to
                # [wb+1, total_rows - h]. Estimator-exactness is enforced
                # by tests (bitwise vs the h=1 walker in interpret mode)
                # and was verified on hardware at the former crash config.
                nxt = jnp.maximum(nxt, run + 1)
                run = jnp.where(on, nxt, run)
            cur_n = jnp.where(active0, run, wb)
            if not want_payload:
                cur_n = jnp.where(done_prev, ends[g], cur_n)
            _dma_rows8(
                rows_ref, total_rows, cur_n, scr_a, sem_a, slot=g, height=h
            )
            ng["cur"] = cur_n
            out[f"g{g}"] = ng
        return out

    init = {"nit": jnp.zeros((SUBLANES, 1), f32)}
    enc = packed[1] if packed is not None else total_rows
    for g in range(G):
        gi = dict(cur=bases[g])
        if analytic is not None:
            gi.update(_analytic_pretest(
                analytic, enc, oxg[g], oyg[g], ozg[g],
                dxg[g], dyg[g], dzg[g], tming[g], tmaxg[g], want_payload,
            ))
        elif want_payload:
            gi["t"] = tmaxg[g]
            gi["u"] = jnp.zeros((SUBLANES, W), f32)
            gi["v"] = jnp.zeros((SUBLANES, W), f32)
            gi["wrow"] = jnp.full((SUBLANES, W), enc, jnp.int32)
        else:
            gi["hitf"] = jnp.zeros((SUBLANES, W), f32)
        _dma_rows8(
            rows_ref, total_rows, bases[g], scr_a, sem_a, slot=g, height=h
        )
        init[f"g{g}"] = gi

    final = jax.lax.while_loop(cond, body, init)
    # drain the in-flight copies started by the last round (their windows
    # are clamped/valid; the semaphores must not leak into the next walk)
    for g in range(G):
        _dma_rows8_wait(
            rows_ref, total_rows, final[f"g{g}"]["cur"], scr_a, sem_a,
            slot=g, height=h,
        )
    cat = lambda k: jnp.concatenate(
        [final[f"g{g}"][k] for g in range(G)], axis=1
    )
    if not want_payload:
        return dict(hitf=cat("hitf"), nit=final["nit"])
    walk = dict(t=cat("t"), u=cat("u"), v=cat("v"), wrow=cat("wrow"),
                nit=final["nit"])
    return _resolve_winners(rows_ref, total_rows, analytic, walk,
                            hbm_bufs=hbm_bufs, packed=packed,
                            pipelined=spec_resolve)


def _traverse(rows_ref, tbl_rows, total_rows, analytic, base,
              ox, oy, oz, dx, dy, dz, tmin, tmax, want_payload,
              prefetch=False, hbm_bufs=None, spec=False, pred=None,
              groups=1, group_octant=True, packed=None, spec_resolve=False,
              trunk_rows=0, hbm_window=1):
    """Packet walk of the trace-row table. Returns a dict of (8,128) arrays:
    t, hitf (1.0 = hit) [, u, v, kind, tag, midx, pay0..pay14].

    ``base`` is the per-packet (8,1) absolute start row — octant-ordered
    table sets (scene.compile.build_octant_trace_tables) store 8 flattenings
    of the tree and each packet walks the one matching its majority ray
    octant, rows [base, base + tbl_rows). Winner rows are absolute;
    ``total_rows`` (+k) encodes analytic winners and (+len) the miss.

    tmax doubles as the active mask: lanes with tmax < 0 accept nothing and
    never vote a packet into descending.

    The walk itself carries the slimmest possible state (closest hit: t, u, v
    and the winning row index; any-hit: just the hit flag) — every extra
    carried channel costs a select per iteration. For closest-hit queries the
    winner's row payload (kind/material/shading data) is filled in afterwards
    by ``_resolve_winners``, which loops over the *distinct* winning rows per
    packet instead of selecting 18 channels on every traversal step.

    ``spec=True`` routes VMEM-table walks to the software-pipelined variant
    (``_traverse_spec``); HBM-table walks keep their own DMA pipeline.
    """
    if spec and hbm_bufs is None:
        if groups > 1:
            return _traverse_spec_grouped(
                rows_ref, tbl_rows, total_rows, analytic, base,
                ox, oy, oz, dx, dy, dz, tmin, tmax, want_payload,
                groups, pred=pred, group_octant=group_octant, packed=packed,
                spec_resolve=spec_resolve,
            )
        return _traverse_spec(
            rows_ref, tbl_rows, total_rows, analytic, base,
            ox, oy, oz, dx, dy, dz, tmin, tmax, want_payload, pred=pred,
            packed=packed, spec_resolve=spec_resolve,
        )
    if hbm_bufs is not None:
        pred = None  # the pretest fetch path is VMEM-only
        # a window taller than the table would make every DMA slice
        # [0, h) overrun the ref (tiny scene + --mega-window); cap it —
        # the scratch allocated for the uncapped height is simply underused
        hbm_window = min(hbm_window, total_rows)
        if hbm_window > 1:
            if trunk_rows > 0:
                raise ValueError(
                    "hbm_window > 1 and trunk_rows > 0 are mutually "
                    "exclusive (the window walker has no trunk phase)"
                )
            return _traverse_hbm_window(
                rows_ref, tbl_rows, total_rows, analytic, base,
                ox, oy, oz, dx, dy, dz, tmin, tmax, want_payload,
                groups, hbm_bufs, height=hbm_window,
                group_octant=group_octant, packed=packed,
                spec_resolve=spec_resolve,
            )
        if groups > 1 or (trunk_rows > 0 and len(hbm_bufs) > 4):
            return _traverse_hbm_grouped(
                rows_ref, tbl_rows, total_rows, analytic, base,
                ox, oy, oz, dx, dy, dz, tmin, tmax, want_payload,
                groups, hbm_bufs, group_octant=group_octant, packed=packed,
                spec_resolve=spec_resolve, trunk_rows=trunk_rows,
            )
    inv_dx = f32(1.0) / dx
    inv_dy = f32(1.0) / dy
    inv_dz = f32(1.0) / dz
    tox = -ox * inv_dx
    toy = -oy * inv_dy
    toz = -oz * inv_dz
    end = base + tbl_rows  # (8,1) per-packet walk bound

    def cond(c):
        return jnp.any(c["cur"] < end)

    if hbm_bufs is not None:
        scr_a, sem_a = hbm_bufs[:2]

    def body(c):
        cur = c["cur"]  # (8,1)
        if hbm_bufs is not None:
            # the copy for this row was started last iteration (for the then
            # freshly-decided cursor == cur); wait and read it
            _dma_rows8_wait(rows_ref, total_rows, cur, scr_a, sem_a)
            rows8 = scr_a[...]
        elif prefetch:
            rows8 = c["rows8"]
        else:
            rows8 = _fetch_rows8(rows_ref, total_rows, cur)
        # broadcast each used column to (8,128) ONCE — Mosaic re-materializes
        # an (8,1)->(8,128) broadcast at every use site otherwise (~175ns/iter
        # measured), so hoisting these is one of the walker's biggest wins
        col = lambda j: jnp.broadcast_to(rows8[:, j : j + 1], ox.shape)
        col_s = lambda j: rows8[:, j : j + 1]  # (8,1) for per-packet cursor ops
        v0x, v0y, v0z = col(0), col(1), col(2)
        v1x, v1y, v1z = col(3), col(4), col(5)
        if packed is None:
            v2x, v2y, v2z = col(6), col(7), col(8)
        kind_s = col_s(9)
        nexit = col_s(10).astype(jnp.int32)

        if prefetch and hbm_bufs is None:
            # both possible successors are known the moment nexit is read:
            # issue their fetches HERE so the loads' latency overlaps the
            # ~60-op test math below instead of sitting on the serial chain;
            # the winner is selected at the bottom with one (8,32) select
            fetch_a = _fetch_rows8(rows_ref, total_rows, cur + 1)
            fetch_b = _fetch_rows8(rows_ref, total_rows, nexit)

        active = cur < end
        is_prim_s = kind_s >= f32(0.0)  # (8,1): row type is per-packet uniform
        if want_payload:
            best_t = c["t"]
        else:
            # any-hit carries no t; resolved lanes stop voting instead
            best_t = jnp.where(c["hitf"] > 0, tmin, tmax)

        # interior slab test
        ax = v0x * inv_dx + tox
        bx = v1x * inv_dx + tox
        ay = v0y * inv_dy + toy
        by = v1y * inv_dy + toy
        az = v0z * inv_dz + toz
        bz = v1z * inv_dz + toz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)), jnp.minimum(az, bz)
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)), jnp.maximum(az, bz)
        )
        slab = (t0 < t1 + f32(M_EPS)) & (t0 < best_t) & (t1 > tmin)
        # (8,1) scalar masks combine before touching the (8,P) slab
        descend = jnp.any(slab & (active & ~is_prim_s), axis=1, keepdims=True)

        if hbm_bufs is not None:
            # the cursor decision needs only the slab test, so the next row's
            # HBM->VMEM copy starts HERE and flies while the expensive
            # primitive test below runs. The any-hit early exit tests the
            # PREVIOUS iteration's hit flags (one extra iteration, exact
            # otherwise).
            nxt_e = jnp.where(is_prim_s | ~descend, nexit, cur + 1)
            if not want_payload:
                done_prev = jnp.all(
                    (c["hitf"] > 0) | (tmax < 0), axis=1, keepdims=True
                )
                nxt_e = jnp.where(done_prev, end, nxt_e)
            nxt_e = jnp.where(active, nxt_e, cur)
            _dma_rows8(rows_ref, total_rows, nxt_e, scr_a, sem_a)

        if packed is not None:
            phit, pt, pu, pv, pslot = _prim_test(
                rows8, ox, oy, oz, dx, dy, dz, tmin, best_t, analytic,
                packed=packed[2],
            )
        else:
            pslot = None
            # unified primitive test; plane normal v1 x v2 is precomputed per
            # row at scene compile (cols 29-31) — saves 6 ops in the hot loop
            nx, ny, nz = col(29), col(30), col(31)
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
            in_tri = (u >= 0) & (v >= 0) & (u + v <= f32(1.0))
            if analytic is not None:
                # triangle-only table: spheres/quads were pre-tested as baked
                # immediates, so the whole sphere branch and the quad/tri kind
                # selects drop out of the hot loop. (t_pq <= best_t) is implied
                # by the accept's strict (pt < best_t) — not tested twice.
                phit = in_tri & (tmin <= t_pq)
                pt = t_pq
                pu, pv = u, v
            else:
                kind = col(9)
                is_tri = kind == f32(KIND_TRIANGLE)
                in_quad = (u >= 0) & (u <= f32(1.0)) & (v >= 0) & (v <= f32(1.0))
                ok_pq = (is_tri & in_tri) | (~is_tri & in_quad)
                ok_pq &= (tmin <= t_pq) & (t_pq <= best_t)

                radius = v1x
                sb = f32(2.0) * (dx * rx + dy * ry + dz * rz)
                sc = rx * rx + ry * ry + rz * rz - radius * radius
                disc = sb * sb - f32(4.0) * sc
                sq = jnp.sqrt(jnp.maximum(disc, f32(0.0)))
                st0 = f32(-0.5) * (sb + sq)
                st1 = f32(-0.5) * (sb - sq)
                ok0 = (tmin <= st0) & (st0 <= best_t)
                ok1 = (tmin <= st1) & (st1 <= best_t)
                t_s = jnp.where(ok0, st0, st1)
                ok_s = (disc >= f32(0.0)) & (ok0 | ok1)

                is_sphere = kind == f32(KIND_SPHERE)
                phit = (is_sphere & ok_s) | (~is_sphere & ok_pq)
                pt = jnp.where(is_sphere, t_s, t_pq)
                zero = jnp.zeros_like(pt)
                pu = jnp.where(is_sphere, zero, u)
                pv = jnp.where(is_sphere, zero, v)

        accept = (active & is_prim_s) & phit & (pt < best_t)
        out = dict(c)
        if want_payload:
            out["t"] = jnp.where(accept, pt, c["t"])
            out["u"] = jnp.where(accept, pu, c["u"])
            out["v"] = jnp.where(accept, pv, c["v"])
            if packed is not None:
                win = pslot.astype(jnp.int32)
            else:
                win = jnp.broadcast_to(cur, ox.shape)
            out["wrow"] = jnp.where(accept, win, c["wrow"])
        else:
            out["hitf"] = jnp.where(accept, f32(1.0), c["hitf"])
            if pred is not None:
                out["orow"] = jnp.where(
                    accept, jnp.broadcast_to(cur, ox.shape), c["orow"]
                )

        take_exit = is_prim_s | ~descend
        nxt = jnp.where(take_exit, nexit, cur + 1)
        if not want_payload:
            # any-hit: a packet whose lanes all resolved can exit early
            done = jnp.all((out["hitf"] > 0) | (tmax < 0), axis=1, keepdims=True)
            nxt = jnp.where(done, end, nxt)
        out["cur"] = nxt_e if hbm_bufs is not None else jnp.where(
            active, nxt, cur
        )
        if prefetch and hbm_bufs is None:
            # inactive/done packets may select a stale row; harmless — their
            # `active` mask (or the loop cond) discards everything downstream
            sel = jnp.broadcast_to(take_exit, fetch_a.shape)
            out["rows8"] = jnp.where(sel, fetch_b, fetch_a)
        out["nit"] = c["nit"] + f32(1.0)  # row-visit counter (~2 ops/iter)
        return out

    init = dict(
        cur=base,
        # (8,1): the visit count is per-packet uniform; consumers broadcast
        nit=jnp.zeros((SUBLANES, 1), f32),
    )
    if hbm_bufs is not None:
        _dma_rows8(rows_ref, total_rows, base, scr_a, sem_a)
    elif prefetch:
        init["rows8"] = _fetch_rows8(rows_ref, total_rows, base)
    enc = packed[1] if packed is not None else total_rows
    if analytic is not None:
        pre = _analytic_pretest(
            analytic, enc, ox, oy, oz, dx, dy, dz, tmin, tmax, want_payload
        )
        init.update(pre)
    elif want_payload:
        init["t"] = tmax
        init["u"] = jnp.zeros(ox.shape, f32)
        init["v"] = jnp.zeros(ox.shape, f32)
        init["wrow"] = jnp.full(ox.shape, enc, jnp.int32)
    else:
        init["hitf"] = jnp.zeros(ox.shape, f32)
    if not want_payload and pred is not None:
        ph, vrow = _anyhit_pretest(
            rows_ref, total_rows, analytic, pred,
            ox, oy, oz, dx, dy, dz, tmin, tmax, packed=packed,
        )
        init["hitf"] = jnp.maximum(init["hitf"], ph)
        init["orow"] = vrow
    final = jax.lax.while_loop(cond, body, init)
    if hbm_bufs is not None:
        # drain the final iteration's in-flight copy so the scoped semaphore
        # ends the kernel at zero
        _dma_rows8_wait(rows_ref, total_rows, final["cur"], scr_a, sem_a)
    if not want_payload:
        return final
    return _resolve_winners(rows_ref, total_rows, analytic, final,
                            hbm_bufs=hbm_bufs, packed=packed,
                            pipelined=spec_resolve)


def _anyhit_pretest(rows_ref, total_rows, analytic, pred,
                    ox, oy, oz, dx, dy, dz, tmin, tmax, rounds=4,
                    packed=None):
    """Shadow-ray occlusion-cache verification (arXiv 1910.01304's ray-path
    prediction, packet form): ``pred`` holds each lane's predicted occluder
    row (the row that occluded its previous shadow ray; -1 = none). Up to
    ``rounds`` DISTINCT predicted rows per packet are fetched and prim-tested
    before the walk; a verified hit is a sufficient any-hit answer, so the
    lane stops voting in the packet walk (union shrink) and fully-verified
    packets skip the walk outright.

    EXACT by construction: predictions are only ever *verified* — a wrong or
    stale prediction simply fails the test and the lane walks normally.
    Returns (hitf0, vrow): verified-occluded flags and the verifying row
    (-1 where unverified)."""
    shp = ox.shape
    hitf = jnp.zeros(shp, f32)
    vrow = jnp.full(shp, -1, jnp.int32)
    pending = jnp.where((pred >= 0) & (pred < total_rows), pred,
                        jnp.int32(total_rows))
    for _ in range(rounds):
        tgt = jnp.min(pending, axis=1, keepdims=True)  # (8,1)
        rows8 = _fetch_rows8(rows_ref, total_rows, tgt)
        if packed is not None:
            # any-hit on the packed row: the tournament's min-t winner is
            # < tmax iff ANY of the PACKED_N hits is (all others are >= it)
            bhit, bt, _, _, _ = _prim_test(
                rows8, ox, oy, oz, dx, dy, dz, tmin, tmax, analytic,
                packed=packed[2],
            )
            phit = bhit & (bt < tmax)
            tgt_b = jnp.broadcast_to(tgt, shp)
            sel = (pending == tgt_b) & (tgt_b < total_rows)
            verified = sel & phit
            hitf = jnp.where(verified, f32(1.0), hitf)
            vrow = jnp.where(verified, tgt_b, vrow)
            pending = jnp.where(sel, jnp.int32(total_rows), pending)
            continue
        # the WALKER's exact occlusion predicate: _prim_test with
        # best_t = tmax plus the strict accept (pt < best_t). Any inline
        # re-derivation here risks drifting from the walker's accepts,
        # which would break the pretest's exactness contract. (Sphere
        # root-tie equivalence: st1 >= st0 always, so inclusive-vs-strict
        # root selection cannot disagree after the strict compare.)
        phit_r, pt_r, _, _, _ = _prim_test(
            rows8, ox, oy, oz, dx, dy, dz, tmin, tmax, analytic, packed=0
        )
        phit = phit_r & (pt_r < tmax)
        tgt_b = jnp.broadcast_to(tgt, shp)
        sel = (pending == tgt_b) & (tgt_b < total_rows)
        verified = sel & phit
        hitf = jnp.where(verified, f32(1.0), hitf)
        vrow = jnp.where(verified, tgt_b, vrow)
        pending = jnp.where(sel, jnp.int32(total_rows), pending)
    return hitf, vrow


def _resolve_winners(rows_ref, num_rows, analytic, walk, hbm_bufs=None,
                     packed=None, pipelined=False):
    """Fill kind/tag/midx/payload for each lane's winning row.

    Loops over the DISTINCT winning rows per packet (min-first), fetching each
    once and selecting it into the lanes it won — O(unique winners) iterations
    instead of paying 18 selects on every traversal step. Baked-analytic
    winners (wrow == num_rows + k) are filled from compile-time constants.

    With ``packed=(pay_base, n_pay, nper)``, wrow holds payload-ROW slots (not walk
    rows); payload is fetched from the slot-indexed section at
    rows[pay_base + slot] (cols: 0 kind, 1 tag, 2 midx, 3-17 payload) and
    analytic/miss winners encode from n_pay.

    ``pipelined=True`` software-pipelines the loop: the plain body's
    critical chain is ``min(pending) -> row fetch -> selects -> pending
    update``; but the NEXT target is computable WITHOUT this iteration's
    fetch (it is the next-smallest distinct pending value), so the target
    is carried one iteration ahead and both the cross-lane min reduce and
    the row fetch come off the chain — the same trick as the ``spec``
    walker. On HBM tables the row DMA is likewise started one iteration
    early (wait-at-top / start-at-bottom) instead of the sync start+wait.
    Visit order (min-first) and all selects are identical, so outputs are
    bitwise-equal to the sync loop.
    """
    wrow = walk["wrow"]
    if packed is not None:
        pay_base, enc = packed[0], packed[1]
    else:
        pay_base, enc = 0, num_rows
    miss = enc + len(analytic or ())
    shp = walk["t"].shape
    outs = dict(
        t=walk["t"],
        u=walk["u"],
        v=walk["v"],
        hitf=jnp.where(wrow < miss, f32(1.0), f32(0.0)),
        kind=jnp.zeros(shp, f32),
        tag=jnp.zeros(shp, f32),
        midx=jnp.zeros(shp, f32),
    )
    for j in range(15):
        outs[f"pay{j}"] = jnp.zeros(shp, f32)
    outs["pending"] = jnp.where(wrow < enc, wrow, jnp.int32(enc))
    outs["nit"] = walk["nit"]

    slim = packed is not None and packed[2] == 1
    assert not (slim and hbm_bufs is not None), (
        "SLIM tables are VMEM-only (the resolve pay fetch is a direct "
        "slice); use packed_leaf=12 (or 4) for HBM-streamed scenes"
    )

    def fetch_addr(tgt):
        if slim:
            return tgt * SLIM_PAY_STRIDE + pay_base
        if packed is not None:
            return tgt + pay_base
        return tgt

    def apply_row(c, tgt, rows8, rows8b):
        """Select row data into the lanes tgt won + mask tgt out of pending
        (shared by the sync and pipelined bodies — identical selects)."""
        col = lambda j: jnp.broadcast_to(rows8[:, j : j + 1], wrow.shape)
        tgt_b = jnp.broadcast_to(tgt, wrow.shape)
        # the < enc guard keeps miss lanes (wrow == enc) from
        # matching a fully-resolved packet's sentinel target
        sel = (wrow == tgt_b) & (tgt_b < enc)
        out = dict(c)
        if packed is not None:
            out["kind"] = jnp.where(sel, col(0), c["kind"])
            out["tag"] = jnp.where(sel, col(1), c["tag"])
            out["midx"] = jnp.where(sel, col(2), c["midx"])
            if slim:
                colb = lambda j: jnp.broadcast_to(
                    rows8b[:, j : j + 1], wrow.shape
                )
                for j in range(12):
                    out[f"pay{j}"] = jnp.where(sel, col(3 + j), c[f"pay{j}"])
                for j in range(12, 15):
                    out[f"pay{j}"] = jnp.where(
                        sel, colb(j - 12), c[f"pay{j}"]
                    )
            else:
                for j in range(15):
                    out[f"pay{j}"] = jnp.where(sel, col(3 + j), c[f"pay{j}"])
            out["pending"] = jnp.where(sel, jnp.int32(enc), c["pending"])
            out["nit"] = c["nit"] + f32(1.0)
            return out
        kind = col(9)
        is_tri = kind == f32(KIND_TRIANGLE)
        out["kind"] = jnp.where(sel, kind, c["kind"])
        out["tag"] = jnp.where(sel, col(12), c["tag"])
        out["midx"] = jnp.where(sel, col(13), c["midx"])
        for j in range(15):
            # triangles carry rows[14:29]; spheres/quads carry v0,v1,v2
            geo = col(j) if j < 9 else jnp.zeros_like(kind)
            pay = jnp.where(is_tri, col(14 + j), geo)
            out[f"pay{j}"] = jnp.where(sel, pay, c[f"pay{j}"])
        out["pending"] = jnp.where(sel, jnp.int32(enc), c["pending"])
        out["nit"] = c["nit"] + f32(1.0)
        return out

    def next_target(pending, after):
        """Smallest pending value strictly greater than ``after`` (8,1)."""
        a_b = jnp.broadcast_to(after, pending.shape)
        cand = jnp.where(pending > a_b, pending, jnp.int32(enc))
        return jnp.min(cand, axis=1, keepdims=True)

    final = dict(outs)
    if pipelined and hbm_bufs is not None:
        # pipelined HBM resolve: the row copy for THIS iteration's carried
        # target was started last iteration (wait-at-top / start-at-bottom,
        # the plain HBM walker's proven pattern), so the ~µs DMA hides
        # behind the previous iteration's selects + next-target reduce
        scr, sem = hbm_bufs[2], hbm_bufs[3]

        def cond_h(c):
            return jnp.any(c["tgt"] < enc)

        def body_h(c):
            fetch_at = fetch_addr(c["tgt"])
            _dma_rows8_wait(rows_ref, num_rows, fetch_at, scr, sem)
            out = apply_row(c, c["tgt"], scr[...], None)
            out["tgt"] = c["tgt2"]
            out["tgt2"] = next_target(out["pending"], c["tgt2"])
            _dma_rows8(rows_ref, num_rows, fetch_addr(out["tgt"]), scr, sem)
            return out

        tgt0 = jnp.min(final["pending"], axis=1, keepdims=True)
        final["tgt"] = tgt0
        final["tgt2"] = next_target(final["pending"], tgt0)
        _dma_rows8(rows_ref, num_rows, fetch_addr(tgt0), scr, sem)
        resolved = jax.lax.while_loop(cond_h, body_h, final)
        # drain the final iteration's in-flight copy (clamped sentinel
        # fetch) so the scoped semaphore ends the kernel at zero
        _dma_rows8_wait(
            rows_ref, num_rows, fetch_addr(resolved["tgt"]), scr, sem
        )
        for k in ("tgt", "tgt2"):
            resolved.pop(k)
    elif pipelined and hbm_bufs is None:
        # carried-target loop: tgt/rows8 for THIS iteration were produced
        # last iteration; this body only does in-register selects, one
        # off-chain fetch (for the carried next target) and one off-chain
        # reduce (for the target after that)
        def cond_p(c):
            return jnp.any(c["tgt"] < enc)

        def body_p(c):
            out = apply_row(c, c["tgt"], c["rows8"], c.get("rows8b"))
            na = fetch_addr(c["tgt2"])
            out["rows8"] = _fetch_rows8(rows_ref, num_rows, na)
            if slim:
                out["rows8b"] = _fetch_rows8(rows_ref, num_rows, na + 1)
            out["tgt"] = c["tgt2"]
            out["tgt2"] = next_target(out["pending"], c["tgt2"])
            return out

        tgt0 = jnp.min(final["pending"], axis=1, keepdims=True)
        final["tgt"] = tgt0
        final["tgt2"] = next_target(final["pending"], tgt0)
        a0 = fetch_addr(tgt0)
        final["rows8"] = _fetch_rows8(rows_ref, num_rows, a0)
        if slim:
            final["rows8b"] = _fetch_rows8(rows_ref, num_rows, a0 + 1)
        resolved = jax.lax.while_loop(cond_p, body_p, final)
        for k in ("tgt", "tgt2", "rows8", "rows8b"):
            resolved.pop(k, None)
    else:
        def cond(c):
            return jnp.any(c["pending"] < enc)

        def body(c):
            tgt = jnp.min(c["pending"], axis=1, keepdims=True)  # (8,1)
            fetch_at = fetch_addr(tgt)
            if hbm_bufs is not None:
                rows8 = _fetch_rows8_hbm_sync(
                    rows_ref, num_rows, fetch_at, hbm_bufs[2], hbm_bufs[3]
                )
            else:
                rows8 = _fetch_rows8(rows_ref, num_rows, fetch_at)
            rows8b = None
            if slim:
                rows8b = _fetch_rows8(rows_ref, num_rows, fetch_at + 1)
            return apply_row(c, tgt, rows8, rows8b)

        resolved = jax.lax.while_loop(cond, body, final)
    resolved.pop("pending")
    # analytic winners: constants, no fetch needed (payload convention
    # matches the in-table rows: pay0..8 = a,b,c geometry, rest zero)
    for k, entry in enumerate(analytic or ()):
        sel = wrow == jnp.int32(enc + k)
        resolved["kind"] = jnp.where(sel, f32(entry[0]), resolved["kind"])
        resolved["tag"] = jnp.where(sel, f32(entry[1]), resolved["tag"])
        resolved["midx"] = jnp.where(sel, f32(entry[2]), resolved["midx"])
        for j in range(9):
            resolved[f"pay{j}"] = jnp.where(
                sel, f32(entry[3 + j]), resolved[f"pay{j}"]
            )
    return resolved


# ----------------------------------------------------------------------------
# static material parameter selection (baked where-chains)
# ----------------------------------------------------------------------------


def _bake_select(midx, rows, ncols, default=0.0):
    """Select a row of baked python floats by traced index (f32 small ints)."""
    outs = [jnp.full_like(midx, f32(default)) for _ in range(ncols)]
    for k, row in enumerate(rows):
        sel = midx == f32(k)
        for j in range(ncols):
            outs[j] = jnp.where(sel, f32(row[j]), outs[j])
    return outs


def _checkerboard(c1r, c1g, c1b, su, c2r, c2g, c2b, sv, uvx, uvy):
    """materials/diffusecb.glsl:6-13."""
    stx = f32(0.5) * uvx / su
    sty = f32(0.5) * uvy / sv
    stx = stx - jnp.floor(stx)
    sty = sty - jnp.floor(sty)
    flip = (stx < f32(0.5)) ^ (sty < f32(0.5))
    return (
        jnp.where(flip, c2r, c1r),
        jnp.where(flip, c2g, c1g),
        jnp.where(flip, c2b, c1b),
    )


# ----------------------------------------------------------------------------
# the megakernel
# ----------------------------------------------------------------------------


# state channels permuted by the inter-bounce lane sort (u32 state handled
# separately via bitcast)
_SORT_CH = [
    "alive", "bounce", "ox", "oy", "oz", "dx", "dy", "dz", "tmin",
    "tr", "tg", "tb", "er", "eg", "eb", "Lr", "Lg", "Lb", "wd",
    "depth", "n1", "n2", "n3", "rows", "ar", "ag", "ab", "segs", "pid",
    "samp",
]


def _lane_sort(s, cfg, by_pid=False):
    """Permute the tile's lanes: by (dead-last, direction octant, origin cell)
    between bounces for packet coherence, or by ``pid`` to restore the
    original lane order before output. Pure permutation of whole paths —
    estimator untouched (ops/pallas_sort.py)."""
    if s["ox"].shape[1] != 128:
        raise ValueError("lane_sort requires the default 128-lane packets")
    if by_pid:
        key = s["pid"]
    else:
        bb = cfg["bbox"]
        spanx = max(bb[3] - bb[0], 1e-6)
        spany = max(bb[4] - bb[1], 1e-6)
        spanz = max(bb[5] - bb[2], 1e-6)
        qx = jnp.clip(((s["ox"] - f32(bb[0])) * f32(4.0 / spanx)).astype(jnp.int32), 0, 3)
        qy = jnp.clip(((s["oy"] - f32(bb[1])) * f32(4.0 / spany)).astype(jnp.int32), 0, 3)
        qz = jnp.clip(((s["oz"] - f32(bb[2])) * f32(4.0 / spanz)).astype(jnp.int32), 0, 3)
        octant = (
            (s["dx"] > 0).astype(jnp.int32)
            + 2 * (s["dy"] > 0).astype(jnp.int32)
            + 4 * (s["dz"] > 0).astype(jnp.int32)
        )
        key = octant + 8 * (qx + 4 * (qy + 4 * qz))
        key = jnp.where(s["alive"] > 0, key, jnp.int32(1 << 20))
    names = _SORT_CH + (["srow"] if "srow" in s else [])
    chans = [s[c] for c in names] + [s["state"]]
    key, chans = sort_tile_by_key(key, chans)
    out = dict(zip(names, chans[:-1]))
    out["state"] = chans[-1]
    return out


def _octant_base(mask, dx, dy, dz, tbl_rows, ntab):
    """Per-packet majority-octant table base (8,1): each packet walks the
    octant-ordered table matching the sign-vote of its masked lanes'
    directions. With a single table the base is a constant zero."""
    if ntab == 1:
        return jnp.zeros((SUBLANES, 1), jnp.int32)

    def vote(d):
        s = jnp.where(mask, jnp.where(d > 0, f32(1.0), f32(-1.0)), f32(0.0))
        return jnp.sum(s, axis=1, keepdims=True)

    oct_ = (
        (vote(dx) > 0).astype(jnp.int32)
        + 2 * (vote(dy) > 0).astype(jnp.int32)
        + 4 * (vote(dz) > 0).astype(jnp.int32)
    )
    return oct_ * tbl_rows


def _bounce_loop(rows_ref, cfg, init):
    """Run the bounce while-loop from an initial state dict; returns final state."""
    tbl_rows = cfg["tbl_rows"]
    total_rows = cfg["total_rows"]
    ntab = cfg["ntab"]
    packed = cfg.get("packed")
    prefetch = cfg.get("prefetch", False)
    spec = cfg.get("spec", False)
    spec_resolve = cfg.get("spec_resolve", False)
    groups = cfg.get("groups", 1)
    group_octant = cfg.get("group_octant", True)
    hbm_bufs = cfg.get("hbm_bufs")
    trunk_rows = cfg.get("trunk_rows", 0)
    hbm_window = cfg.get("hbm_window", 1)
    max_bounces = cfg["max_bounces"]
    emitters = cfg["emitters"]
    mat_diffuse, mat_cb, mat_diel, mat_emissive = cfg["materials"]
    lane_sort = cfg.get("lane_sort", False)
    # in-kernel sample chaining (chain > 1, phase-0 launches only): a lane
    # whose path dies respawns on the SAME pixel's next sweep sample instead
    # of idling until tile retirement; finished samples flush to per-sweep
    # out images as they die. Estimator-exact: every (pixel, sweep) sample
    # consumes its own seed/jitter/RNG stream exactly as an unchained sweep
    # would. Lanes whose CURRENT path reaches max_bounces freeze per-lane
    # (tmax < 0 masks them out of walks and shading) and exit to the phase
    # system with their in-flight state, so no sample is ever dropped.
    chain = cfg.get("chain", 1)
    chain_refs = cfg.get("chain_refs")
    # shadow-ray occlusion cache (VMEM tables only): per-lane predicted
    # occluder row, verified before each shadow walk (_anyhit_pretest).
    # In-kernel state only — resets at phase boundaries (prediction loss
    # only, exactness unaffected).
    shadow_cache = cfg.get("shadow_cache", False) and not cfg.get("hbm")
    if shadow_cache and cfg.get("shadow_skip_all"):
        # skip-all stubs the shadow result dict without the 'orow' the cache
        # update reads; the combination is meaningless (nothing to predict)
        raise ValueError("shadow_skip_all cannot be combined with shadow_cache")

    init = dict(init)
    pshape = init["ox"].shape
    if shadow_cache:
        init["srow"] = jnp.full(pshape, -1.0, f32)
    init["pid"] = jax.lax.broadcasted_iota(
        jnp.int32, pshape, 0
    ) * pshape[1] + jax.lax.broadcasted_iota(jnp.int32, pshape, 1)

    def cond(s):
        if chain > 1:
            # chained lanes never carry a path at the cap (it is parked to
            # its state slot and the lane respawns — see the chain block),
            # so plain any-alive is the full condition
            return jnp.any(s["alive"] > 0)
        # max over lanes: resumed tiles mix stale dead lanes (smaller bounce)
        # with alive lanes that all share the phase-start bounce count
        return jnp.any(s["alive"] > 0) & (jnp.max(s["bounce"]) < max_bounces)

    def body(s):
        alive = s["alive"] > 0
        tmax = jnp.where(alive, f32(BIG), f32(-1.0))
        h = _traverse(
            rows_ref,
            tbl_rows,
            total_rows,
            cfg["analytic"],
            _octant_base(alive, s["dx"], s["dy"], s["dz"], tbl_rows, ntab),
            s["ox"],
            s["oy"],
            s["oz"],
            s["dx"],
            s["dy"],
            s["dz"],
            s["tmin"],
            tmax,
            want_payload=True,
            prefetch=prefetch,
            hbm_bufs=hbm_bufs,
            spec=spec,
            spec_resolve=spec_resolve,
            groups=groups,
            group_octant=group_octant,
            packed=packed,
            trunk_rows=trunk_rows,
            hbm_window=hbm_window,
        )
        found = alive & (h["hitf"] > 0)
        t = h["t"]
        kind = h["kind"]
        tag = h["tag"]
        midx = h["midx"]
        u, v = h["u"], h["v"]
        pay = [h[f"pay{j}"] for j in range(15)]

        # hit point
        hx = s["ox"] + t * s["dx"]
        hy = s["oy"] + t * s["dy"]
        hz = s["oz"] + t * s["dz"]

        # ---- populate shading data (scalarized populate_intersection) ----
        is_s = kind == f32(KIND_SPHERE)
        is_q = kind == f32(KIND_QUAD)
        is_t = kind == f32(KIND_TRIANGLE)

        # sphere: payload = (center, radius)
        sr_inv = f32(1.0) / jnp.where(is_s, pay[3], f32(1.0))
        snx = (hx - pay[0]) * sr_inv
        sny = (hy - pay[1]) * sr_inv
        snz = (hz - pay[2]) * sr_inv
        st_len = jax.lax.rsqrt(jnp.maximum(snz * snz + snx * snx, f32(1e-30)))
        stx = -snz * st_len
        stz = snx * st_len
        # b = cross(n, t): with t=(stx,0,stz)
        sbx = sny * stz
        sby = snz * stx - snx * stz
        sbz = -sny * stx
        s_uvx = f32(0.5) + _atan2(snz, snx) * f32(1.0 / (2.0 * M_PI))
        s_uvx = jnp.where(jnp.isnan(s_uvx), f32(0.0), s_uvx)
        s_uvy = f32(0.5) + _asin(jnp.clip(sny, -1.0, 1.0)) * f32(1.0 / M_PI)

        # quad: for non-tri rows payload mirrors v0,v1,v2 -> edge1 = pay[3:6],
        # edge2 = pay[6:9] (v0 = origin is unused by the quad frame)
        q1l = jax.lax.rsqrt(
            jnp.maximum(pay[3] * pay[3] + pay[4] * pay[4] + pay[5] * pay[5], f32(1e-30))
        )
        qtx, qty, qtz = pay[3] * q1l, pay[4] * q1l, pay[5] * q1l
        q2l = jax.lax.rsqrt(
            jnp.maximum(pay[6] * pay[6] + pay[7] * pay[7] + pay[8] * pay[8], f32(1e-30))
        )
        qbx, qby, qbz = pay[6] * q2l, pay[7] * q2l, pay[8] * q2l
        qnx = qty * qbz - qtz * qby
        qny = qtz * qbx - qtx * qbz
        qnz = qtx * qby - qty * qbx

        # triangle: payload = (n0,n1,n2, uv0,uv1,uv2)
        lam0 = f32(1.0) - u - v
        tnx = pay[0] * lam0 + pay[3] * u + pay[6] * v
        tny = pay[1] * lam0 + pay[4] * u + pay[7] * v
        tnz = pay[2] * lam0 + pay[5] * u + pay[8] * v
        tn_inv = jax.lax.rsqrt(jnp.maximum(tnx * tnx + tny * tny + tnz * tnz, f32(1e-30)))
        tnx, tny, tnz = tnx * tn_inv, tny * tn_inv, tnz * tn_inv
        t_uvx = pay[9] * lam0 + pay[11] * u + pay[13] * v
        t_uvy = pay[10] * lam0 + pay[12] * u + pay[14] * v
        # tangent: bt_seed = |n.x|>|n.y| ? (0,1,0) : (1,0,0); t = norm(cross(n, bt))
        use_y = jnp.abs(tnx) > jnp.abs(tny)
        # cross(n, (0,1,0)) = (-n.z, 0, n.x); cross(n, (1,0,0)) = (0, n.z, -n.y)
        ttx = jnp.where(use_y, -tnz, f32(0.0))
        tty = jnp.where(use_y, f32(0.0), tnz)
        ttz = jnp.where(use_y, tnx, -tny)
        tt_inv = jax.lax.rsqrt(jnp.maximum(ttx * ttx + tty * tty + ttz * ttz, f32(1e-30)))
        ttx, tty, ttz = ttx * tt_inv, tty * tt_inv, ttz * tt_inv
        tbx = tny * ttz - tnz * tty
        tby = tnz * ttx - tnx * ttz
        tbz = tnx * tty - tny * ttx

        sel3 = lambda a_s, a_q, a_t: jnp.where(is_s, a_s, jnp.where(is_q, a_q, a_t))
        nx = sel3(snx, qnx, tnx)
        ny = sel3(sny, qny, tny)
        nz = sel3(snz, qnz, tnz)
        fx = sel3(stx, qtx, ttx)
        fy = sel3(jnp.zeros_like(stx), qty, tty)
        fz = sel3(stz, qtz, ttz)
        bx_ = sel3(sbx, qbx, tbx)
        by_ = sel3(sby, qby, tby)
        bz_ = sel3(sbz, qbz, tbz)
        uvx = sel3(s_uvx, u, t_uvx)
        uvy = sel3(s_uvy, v, t_uvy)

        # first-hit AOVs
        first = (s["bounce"] == 0) & found
        depth = jnp.where(first, t, s["depth"])
        n1o = jnp.where(first, nx, s["n1"])
        n2o = jnp.where(first, ny, s["n2"])
        n3o = jnp.where(first, nz, s["n3"])

        # Beer-Lambert (render.glsl:111-112); dist = |p - o|
        ddx = hx - s["ox"]
        ddy = hy - s["oy"]
        ddz = hz - s["oz"]
        dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
        tr = jnp.where(found, s["tr"] * jnp.exp(-s["er"] * dist), s["tr"])
        tg = jnp.where(found, s["tg"] * jnp.exp(-s["eg"] * dist), s["tg"])
        tb = jnp.where(found, s["tb"] * jnp.exp(-s["eb"] * dist), s["tb"])

        # emissive accumulation (render.glsl:114-116)
        pw = _bake_select(midx, mat_emissive, 3) if mat_emissive else [
            jnp.zeros_like(midx)
        ] * 3
        em = found & (tag == f32(TAG_EMISSIVE)) & (s["wd"] > 0)
        Lr = jnp.where(em, s["Lr"] + tr * pw[0], s["Lr"])
        Lg = jnp.where(em, s["Lg"] + tg * pw[1], s["Lg"])
        Lb = jnp.where(em, s["Lb"] + tb * pw[2], s["Lb"])

        # ---- NEE (render.glsl:117-126, scene.glsl:54-89) ----
        dif = found & ((tag == f32(TAG_DIFFUSE)) | (tag == f32(TAG_DIFFUSECBOARD)))
        st = s["state"]
        st1, u_pick = _randf(st)
        st2, eu1 = _randf(st1)
        st3, eu2 = _randf(st2)
        new_state = jnp.where(dif, st3, st)

        # emitter select: first e with u_pick < cdf_e; fallback to emitter 0
        # when u_pick >= cdf_{E-1} (scene.glsl:57-64). Because the cdf is
        # increasing, "first e with u < cdf_e" == "u in [cdf_{e-1}, cdf_e)",
        # so candidate 0 is the default and candidate e>0 overrides on its
        # half-open cdf bin.
        candidates = []
        for e, bake in enumerate(emitters):
            ekind, epdf_c, ecdf = bake[0], bake[1], bake[2]
            power = bake[3:6]
            g = bake[6:]
            if ekind == 2:  # triangle (shapes/triangle.glsl:81-102)
                pa, pb_, pc = g[0:3], g[3:6], g[6:9]
                na, nb, nc = g[9:12], g[12:15], g[15:18]
                abx, aby, abz = (pb_[i] - pa[i] for i in range(3))
                acx, acy, acz = (pc[i] - pa[i] for i in range(3))
                crx = aby * acz - abz * acy
                cry = abz * acx - abx * acz
                crz = abx * acy - aby * acx
                area = 0.5 * math.sqrt(crx * crx + cry * cry + crz * crz)
                over = eu1 + eu2 > f32(1.0)
                lu = jnp.where(over, f32(1.0) - eu2, eu1)
                lv = eu2
                lw = f32(1.0) - lu - lv
                cpx = f32(pa[0]) * lu + f32(pb_[0]) * lv + f32(pc[0]) * lw
                cpy = f32(pa[1]) * lu + f32(pb_[1]) * lv + f32(pc[1]) * lw
                cpz = f32(pa[2]) * lu + f32(pb_[2]) * lv + f32(pc[2]) * lw
                cnx = f32(na[0]) * lu + f32(nb[0]) * lv + f32(nc[0]) * lw
                cny = f32(na[1]) * lu + f32(nb[1]) * lv + f32(nc[1]) * lw
                cnz = f32(na[2]) * lu + f32(nb[2]) * lv + f32(nc[2]) * lw
                cn_inv = jax.lax.rsqrt(
                    jnp.maximum(cnx * cnx + cny * cny + cnz * cnz, f32(1e-30))
                )
                cnx, cny, cnz = cnx * cn_inv, cny * cn_inv, cnz * cn_inv
                cpdf = f32(1.0 / area)
                cpdf = jnp.full_like(u_pick, cpdf)
            elif ekind == 1:  # quad (shapes/quad.glsl:34-45)
                qo, e1, e2 = g[0:3], g[3:6], g[6:9]
                crx = e1[1] * e2[2] - e1[2] * e2[1]
                cry = e1[2] * e2[0] - e1[0] * e2[2]
                crz = e1[0] * e2[1] - e1[1] * e2[0]
                area = math.sqrt(crx * crx + cry * cry + crz * crz)
                cnx = jnp.full_like(u_pick, f32(crx / area))
                cny = jnp.full_like(u_pick, f32(cry / area))
                cnz = jnp.full_like(u_pick, f32(crz / area))
                cpx = f32(qo[0]) + eu1 * f32(e1[0]) + eu2 * f32(e2[0])
                cpy = f32(qo[1]) + eu1 * f32(e1[1]) + eu2 * f32(e2[1])
                cpz = f32(qo[2]) + eu1 * f32(e1[2]) + eu2 * f32(e2[2])
                cpdf = jnp.full_like(u_pick, f32(1.0 / area))
            else:  # sphere (shapes/sphere.glsl:54-62)
                scx, scy, scz, rr = g[0], g[1], g[2], g[3]
                z = f32(2.0) * eu1 - f32(1.0)
                theta = f32(2.0 * M_PI) * eu2
                rxy = jnp.sqrt(jnp.maximum(f32(1.0) - z * z, f32(0.0)))
                cnx = rxy * jnp.cos(theta)
                cny = rxy * jnp.sin(theta)
                cnz = z
                cpx = f32(scx) + f32(rr) * cnx
                cpy = f32(scy) + f32(rr) * cny
                cpz = f32(scz) + f32(rr) * cnz
                cpdf = jnp.full_like(u_pick, f32(1.0 / (rr * rr * 4.0 * M_PI)))
            candidates.append(
                dict(
                    px=cpx, py=cpy, pz=cpz, nx=cnx, ny=cny, nz=cnz, pdf=cpdf,
                    pwr=f32(power[0]), pwg=f32(power[1]), pwb=f32(power[2]),
                    em_pdf=f32(epdf_c), cdf_lo=None if e == 0 else f32(emitters[e - 1][2]),
                    cdf_hi=f32(ecdf),
                )
            )

        c0 = candidates[0]
        epx, epy, epz = c0["px"], c0["py"], c0["pz"]
        enx, eny, enz = c0["nx"], c0["ny"], c0["nz"]
        epdf = c0["pdf"]
        epwr = jnp.full_like(u_pick, c0["pwr"])
        epwg = jnp.full_like(u_pick, c0["pwg"])
        epwb = jnp.full_like(u_pick, c0["pwb"])
        em_pdf_sel = jnp.full_like(u_pick, c0["em_pdf"])
        for cand in candidates[1:]:
            sel = (u_pick >= cand["cdf_lo"]) & (u_pick < cand["cdf_hi"])
            epx = jnp.where(sel, cand["px"], epx)
            epy = jnp.where(sel, cand["py"], epy)
            epz = jnp.where(sel, cand["pz"], epz)
            enx = jnp.where(sel, cand["nx"], enx)
            eny = jnp.where(sel, cand["ny"], eny)
            enz = jnp.where(sel, cand["nz"], enz)
            epdf = jnp.where(sel, cand["pdf"], epdf)
            epwr = jnp.where(sel, cand["pwr"], epwr)
            epwg = jnp.where(sel, cand["pwg"], epwg)
            epwb = jnp.where(sel, cand["pwb"], epwb)
            em_pdf_sel = jnp.where(sel, cand["em_pdf"], em_pdf_sel)

        # shadow ray
        svx = epx - hx
        svy = epy - hy
        svz = epz - hz
        sdist = jnp.sqrt(svx * svx + svy * svy + svz * svz)
        sd_inv = f32(1.0) / sdist
        sdx, sdy, sdz = svx * sd_inv, svy * sd_inv, svz * sd_inv
        cos_theta = -(sdx * enx + sdy * eny + sdz * enz)
        pdf = em_pdf_sel * epdf * sdist * sdist / cos_theta
        inv_pdf = jnp.where(cos_theta < f32(0.0), f32(0.0), f32(1.0) / pdf)
        impr = epwr * inv_pdf
        impg = epwg * inv_pdf
        impb = epwb * inv_pdf
        imp_len = jnp.sqrt(impr * impr + impg * impg + impb * impb)
        gate = dif & (imp_len > f32(M_EPS)) & ((sdx * nx + sdy * ny + sdz * nz) > 0)

        # shadow-visibility boxes (scene/lightvis.py): lanes whose NEE
        # origin lies in a compile-time-proven unoccluded region skip the
        # any-hit walk with visibility 1 — exact (the walk would return 0
        # hits bitwise; only rows/nit counters and any-hit traversal order
        # change, neither of which touches the film). ~12 vector ops per
        # box once per bounce vs ~31% of all row visits (PERF_NOTES).
        vis_boxes = cfg.get("shadow_vis") or ()
        walk_gate = gate
        if vis_boxes:
            proven = None
            for k in range(int(vis_boxes[0])):
                x0, y0, z0, x1, y1, z1 = vis_boxes[1 + 6 * k : 7 + 6 * k]
                inb = (
                    (hx >= f32(x0)) & (hx <= f32(x1))
                    & (hy >= f32(y0)) & (hy <= f32(y1))
                    & (hz >= f32(z0)) & (hz <= f32(z1))
                )
                proven = inb if proven is None else (proven | inb)
            walk_gate = gate & ~proven

        if cfg.get("shadow_skip_all"):
            # PERF PROBE ONLY (tools/ab_lightvis.py): skip every shadow walk
            # — biased image; measures the upper bound of any shadow-ray
            # visibility shortcut (e.g. scene/lightvis.py's proven cells).
            sh = {"hitf": jnp.zeros_like(sdist),
                  "nit": jnp.zeros((SUBLANES, 1), f32)}
        elif cfg.get("shadow_ref") is not None:
            # dedicated any-hit shadow table (round-4 verdict #1): a single
            # PACKED3 flattening with no payload section — 3 prims per
            # 32-wide row at the classic row's fetch cost, no winner
            # resolve, no octant set (ordering along the ray does not prune
            # a bounded any-hit query). Occlusion per lane is the same
            # boolean OR over the same prim set as the shared-table walk,
            # so the estimate is unchanged (scene.compile.CompiledScene
            # .shadow_rows_mega; sim: tools/sim_shadow_walk.py).
            s_rows = cfg["shadow_tbl_rows"]
            sh = _traverse(
                cfg["shadow_ref"],
                s_rows,
                s_rows,
                cfg["analytic"],
                jnp.zeros((SUBLANES, 1), jnp.int32),
                hx,
                hy,
                hz,
                sdx,
                sdy,
                sdz,
                jnp.full_like(sdist, f32(2.0 * M_EPS)),
                jnp.where(walk_gate, sdist - f32(M_EPS), f32(-1.0)),
                want_payload=False,
                prefetch=prefetch,
                hbm_bufs=None,
                spec=spec,
                pred=None,
                groups=groups,
                group_octant=False,
                packed=(s_rows, s_rows, 3),  # 3 = PACKED3 prim layout
            )
        else:
            sh = _traverse(
                rows_ref,
                tbl_rows,
                total_rows,
                cfg["analytic"],
                _octant_base(walk_gate, sdx, sdy, sdz, tbl_rows, ntab),
                hx,
                hy,
                hz,
                sdx,
                sdy,
                sdz,
                jnp.full_like(sdist, f32(2.0 * M_EPS)),
                jnp.where(walk_gate, sdist - f32(M_EPS), f32(-1.0)),
                want_payload=False,
                prefetch=prefetch,
                hbm_bufs=hbm_bufs,
                spec=spec,
                pred=s["srow"].astype(jnp.int32) if shadow_cache else None,
                groups=groups,
                group_octant=group_octant,
                packed=packed,
                trunk_rows=trunk_rows,
                hbm_window=hbm_window,
            )
        unoccluded = sh["hitf"] == 0

        # eval BSDF for NEE (material.glsl:18-30)
        dcol = _bake_select(midx, mat_diffuse, 3) if mat_diffuse else [
            jnp.zeros_like(midx)
        ] * 3
        if mat_cb:
            cbp = _bake_select(midx, mat_cb, 8)
            cbr, cbg, cbb = _checkerboard(*cbp, uvx, uvy)
        else:
            cbr = cbg = cbb = jnp.zeros_like(midx)
        cosw = sdx * nx + sdy * ny + sdz * nz
        is_dif = tag == f32(TAG_DIFFUSE)
        is_cb = tag == f32(TAG_DIFFUSECBOARD)
        # first-hit albedo AOV (fixed-albedo mode; zero-cost in parity mode
        # because the channels are simply never read): diffuse/checkerboard
        # reflectance, zero for specular/emissive (ops/bsdf.py::base_color)
        fa = found & (s["bounce"] == 0)
        zero3 = jnp.zeros_like(cbr)
        ar = jnp.where(fa, jnp.where(is_dif, dcol[0], jnp.where(is_cb, cbr, zero3)), s["ar"])
        ag = jnp.where(fa, jnp.where(is_dif, dcol[1], jnp.where(is_cb, cbg, zero3)), s["ag"])
        ab = jnp.where(fa, jnp.where(is_dif, dcol[2], jnp.where(is_cb, cbb, zero3)), s["ab"])
        evr = cosw * jnp.where(is_dif, dcol[0], cbr) * f32(1.0 / M_PI)
        evg = cosw * jnp.where(is_dif, dcol[1], cbg) * f32(1.0 / M_PI)
        evb = cosw * jnp.where(is_dif, dcol[2], cbb) * f32(1.0 / M_PI)
        add = gate & unoccluded
        Lr = jnp.where(add, Lr + tr * evr * impr, Lr)
        Lg = jnp.where(add, Lg + tg * evg * impg, Lg)
        Lb = jnp.where(add, Lb + tb * evb * impb, Lb)

        # ---- BSDF sampling (material.glsl:33-91) ----
        stA, bu1 = _randf(new_state)
        stB, bu2 = _randf(stA)

        # diffuse / checkerboard: cosine hemisphere in the shading frame
        rad = jnp.sqrt(bu1)
        th = f32(2.0 * M_PI) * bu2
        hlx = rad * jnp.cos(th)
        hly = rad * jnp.sin(th)
        hlz = jnp.sqrt(jnp.maximum(f32(0.0), f32(1.0) - bu1))
        wdfx = fx * hlx + bx_ * hly + nx * hlz
        wdfy = fy * hlx + by_ * hly + ny * hlz
        wdfz = fz * hlx + bz_ * hly + nz * hlz

        # mirror
        din = s["dx"] * nx + s["dy"] * ny + s["dz"] * nz
        wmx = s["dx"] - f32(2.0) * din * nx
        wmy = s["dy"] - f32(2.0) * din * ny
        wmz = s["dz"] - f32(2.0) * din * nz

        # dielectric (material.glsl:50-87 verbatim, incl. quirks)
        if mat_diel:
            dl = _bake_select(midx, mat_diel, 4)
            ext_r, ext_g, ext_b, eta0 = dl
        else:
            ext_r = ext_g = ext_b = jnp.zeros_like(midx)
            eta0 = jnp.ones_like(midx)
        eta_inv0 = f32(1.0) / eta0
        cos_i0 = -din
        flip = cos_i0 < f32(0.0)
        eta = jnp.where(flip, eta_inv0, eta0)
        # inside-hit etaInv = fl(1/fl(1/eta)) per the reference (material.
        # glsl:56-58), NOT eta0 — they differ in f32 for non-involutive eta
        eta_inv = jnp.where(flip, f32(1.0) / eta_inv0, eta_inv0)
        nnx = jnp.where(flip, -nx, nx)
        nny = jnp.where(flip, -ny, ny)
        nnz = jnp.where(flip, -nz, nz)
        cos_i = jnp.where(flip, -cos_i0, cos_i0)
        kk = f32(1.0) - eta_inv * eta_inv * (f32(1.0) - cos_i * cos_i)
        tir = kk <= f32(0.0)
        cos_o = jnp.sqrt(jnp.maximum(kk, f32(0.0)))
        rho_par = (eta * cos_i - cos_o) / (eta * cos_i + cos_o)
        rho_orth = (cos_i - eta * cos_o) / (cos_i + eta * cos_o)
        f_r = f32(0.5) * (rho_par * rho_par + rho_orth * rho_orth)
        choose_reflect = bu1 < f_r
        dinn = s["dx"] * nnx + s["dy"] * nny + s["dz"] * nnz
        wrx = s["dx"] - f32(2.0) * dinn * nnx
        wry = s["dy"] - f32(2.0) * dinn * nny
        wrz = s["dz"] - f32(2.0) * dinn * nnz
        prx = s["dx"] - dinn * nnx
        pry = s["dy"] - dinn * nny
        prz = s["dz"] - dinn * nnz
        wtx = eta_inv * prx - cos_o * nnx
        wty = eta_inv * pry - cos_o * nny
        wtz = eta_inv * prz - cos_o * nnz
        refl = tir | choose_reflect
        wdx = jnp.where(refl, wrx, wtx)
        wdy = jnp.where(refl, wry, wty)
        wdz = jnp.where(refl, wrz, wtz)
        inside0 = cos_i0 > f32(0.0)
        refracted = ~tir & ~choose_reflect
        # select on booleans via logic ops (Mosaic can't select i1 vectors)
        inside_final = (refracted & ~inside0) | (~refracted & inside0)

        is_mir = tag == f32(TAG_MIRROR)
        is_dl = tag == f32(TAG_DIELECTRIC)
        is_em = tag == f32(TAG_EMISSIVE)
        difish = is_dif | is_cb

        wox = jnp.where(difish, wdfx, jnp.where(is_mir, wmx, jnp.where(is_dl, wdx, s["dx"])))
        woy = jnp.where(difish, wdfy, jnp.where(is_mir, wmy, jnp.where(is_dl, wdy, s["dy"])))
        woz = jnp.where(difish, wdfz, jnp.where(is_mir, wmz, jnp.where(is_dl, wdz, s["dz"])))
        wr_ = jnp.where(is_dif, dcol[0], jnp.where(is_cb, cbr, jnp.where(is_mir | is_dl, f32(1.0), f32(0.0))))
        wg_ = jnp.where(is_dif, dcol[1], jnp.where(is_cb, cbg, jnp.where(is_mir | is_dl, f32(1.0), f32(0.0))))
        wb_ = jnp.where(is_dif, dcol[2], jnp.where(is_cb, cbb, jnp.where(is_mir | is_dl, f32(1.0), f32(0.0))))
        set_ext = is_dl & found & inside_final
        er = jnp.where(set_ext, ext_r, s["er"])
        eg = jnp.where(set_ext, ext_g, s["eg"])
        eb = jnp.where(set_ext, ext_b, s["eb"])

        consumed2 = found & difish
        consumed1 = found & is_dl & ~tir
        new_state = jnp.where(consumed2, stB, jnp.where(consumed1, stA, new_state))

        tr = jnp.where(found, tr * wr_, tr)
        tg = jnp.where(found, tg * wg_, tg)
        tb = jnp.where(found, tb * wb_, tb)
        oxn = jnp.where(found, hx, s["ox"])
        oyn = jnp.where(found, hy, s["oy"])
        ozn = jnp.where(found, hz, s["oz"])
        dxn = jnp.where(found, wox, s["dx"])
        dyn = jnp.where(found, woy, s["dy"])
        dzn = jnp.where(found, woz, s["dz"])
        tminn = jnp.where(found, f32(2.0 * M_EPS), s["tmin"])
        wd = jnp.where(found, (~difish).astype(jnp.int32), s["wd"])

        # Russian roulette (render.glsl:137-144)
        rr = found & (s["bounce"] > 3)
        stC, u_rr = _randf(new_state)
        new_state = jnp.where(rr, stC, new_state)
        q = jnp.minimum(f32(0.99), jnp.maximum(tr, jnp.maximum(tg, tb)))
        kill = rr & (u_rr > q)
        keepq = rr & ~kill
        tr = jnp.where(keepq, tr / q, tr)
        tg = jnp.where(keepq, tg / q, tg)
        tb = jnp.where(keepq, tb / q, tb)
        alive_n = found & ~kill

        out = dict(
            alive=alive_n.astype(jnp.int32),
            bounce=s["bounce"] + 1,
            # true per-path segment count (f32 masked add: the i32-carry and
            # int-convert forms both hit Mosaic relayout limits)
            segs=jnp.where(alive, s["segs"] + f32(1.0), s["segs"]),
            ox=oxn,
            oy=oyn,
            oz=ozn,
            dx=dxn,
            dy=dyn,
            dz=dzn,
            tmin=tminn,
            state=new_state,
            tr=tr,
            tg=tg,
            tb=tb,
            er=er,
            eg=eg,
            eb=eb,
            Lr=Lr,
            Lg=Lg,
            Lb=Lb,
            wd=wd,
            depth=depth,
            n1=n1o,
            n2=n2o,
            n3=n3o,
            rows=s["rows"] + h["nit"] + sh["nit"],
            ar=ar,
            ag=ag,
            ab=ab,
            pid=s["pid"],
            samp=s["samp"],
        )
        if chain > 1:
            S = chain
            pxs_ref, pys_ref, seeds_ref, co_ref, cst_ref, crng_ref = chain_refs
            samp = s["samp"]
            # park paths that reached the per-sample bounce cap: write the
            # FULL path state to the lane's (sample) state slot — the
            # compaction phases continue it — and free the lane so it can
            # keep chaining. No sample is ever dropped or restarted.
            frz = (out["alive"] > 0) & (out["bounce"] >= max_bounces)
            for si in range(S):
                selp = frz & (samp == f32(si))
                for ci, ch in enumerate(_STATE_CH):
                    v = out[ch]
                    if v.dtype != jnp.float32:
                        v = v.astype(f32)
                    slot = si * N_STATE + ci
                    cst_ref[slot] = jnp.where(selp, v, cst_ref[slot])
                crng_ref[si] = jnp.where(selp, out["state"], crng_ref[si])
            out["alive"] = jnp.where(frz, jnp.int32(0), out["alive"])
            # flush samples that died THIS iteration into their sweep image
            # (parked paths flush later, via the phase commit)
            deadx = out["alive"] == 0
            flushm = alive & deadx & ~frz
            vals = [out["Lr"], out["Lg"], out["Lb"], out["n1"], out["n2"],
                    out["n3"], out["depth"], out["segs"], out["rows"],
                    out["ar"], out["ag"], out["ab"]]
            for si in range(S):
                sel = flushm & (samp == f32(si))
                for ci, v in enumerate(vals):
                    slot = si * CHAIN_OUT_CH + ci
                    co_ref[slot] = jnp.where(sel, v, co_ref[slot])
            # respawn dead lanes that still have sweep samples to trace:
            # fresh camera ray + seed for the SAME pixel's next sample
            resp = deadx & (samp < f32(S - 1))
            sampn = jnp.where(resp, samp + f32(1.0), samp)
            px_n = pxs_ref[1]
            py_n = pys_ref[1]
            seed_n = seeds_ref[1]
            for si in range(2, S):
                m = sampn == f32(si)
                px_n = jnp.where(m, pxs_ref[si], px_n)
                py_n = jnp.where(m, pys_ref[si], py_n)
                seed_n = jnp.where(m, seeds_ref[si], seed_n)
            ndx, ndy, ndz = _camera_ray(px_n, py_n, cfg)
            ccx, ccy, ccz = cfg["camera"][0:3]
            out["samp"] = sampn
            out["alive"] = jnp.where(resp, jnp.int32(1), out["alive"])
            out["bounce"] = jnp.where(resp, jnp.int32(0), out["bounce"])
            out["ox"] = jnp.where(resp, f32(ccx), out["ox"])
            out["oy"] = jnp.where(resp, f32(ccy), out["oy"])
            out["oz"] = jnp.where(resp, f32(ccz), out["oz"])
            out["dx"] = jnp.where(resp, ndx, out["dx"])
            out["dy"] = jnp.where(resp, ndy, out["dy"])
            out["dz"] = jnp.where(resp, ndz, out["dz"])
            out["tmin"] = jnp.where(resp, f32(M_EPS), out["tmin"])
            out["state"] = jnp.where(resp, _wang_hash(seed_n), out["state"])
            one = f32(1.0)
            zero = f32(0.0)
            for ch in ("tr", "tg", "tb"):
                out[ch] = jnp.where(resp, one, out[ch])
            for ch in ("er", "eg", "eb", "Lr", "Lg", "Lb", "depth",
                       "n1", "n2", "n3", "ar", "ag", "ab", "segs", "rows"):
                out[ch] = jnp.where(resp, zero, out[ch])
            out["wd"] = jnp.where(resp, jnp.int32(1), out["wd"])
        if shadow_cache:
            # keep the last verified/accepted occluder as next prediction;
            # lanes that shot no shadow ray keep their previous prediction
            out["srow"] = jnp.where(
                gate, sh["orow"].astype(f32), s["srow"]
            )
        if lane_sort:
            out = _lane_sort(out, cfg)
        return out

    final = jax.lax.while_loop(cond, body, init)
    if lane_sort:
        final = _lane_sort(final, cfg, by_pid=True)
    final.pop("pid")
    return final


def _camera_ray(px, py, cfg):
    """Camera ray direction for jittered pixel coords (render.glsl:26-36),
    quaternion rotation baked to a compile-time matrix. Shared by the tile
    init and the in-kernel sample-chaining respawn."""
    cam = cfg["camera"]  # (pos3, quat4, fov)
    W, H = cfg["width"], cfg["height"]
    cx, cy, cz, qx, qy, qz, qw, fov = cam
    # quaternion -> rotation matrix (python floats)
    R00 = 1 - 2 * (qy * qy + qz * qz)
    R01 = 2 * (qx * qy - qz * qw)
    R02 = 2 * (qx * qz + qy * qw)
    R10 = 2 * (qx * qy + qz * qw)
    R11 = 1 - 2 * (qx * qx + qz * qz)
    R12 = 2 * (qy * qz - qx * qw)
    R20 = 2 * (qx * qz - qy * qw)
    R21 = 2 * (qy * qz + qx * qw)
    R22 = 1 - 2 * (qx * qx + qy * qy)
    scale = math.tan(math.radians(0.5 * fov)) / (0.5 * W)
    lx = (px - f32(0.5 * W)) * f32(scale)
    ly = -(py - f32(0.5 * H)) * f32(scale)
    dxu = f32(R00) * lx + f32(R01) * ly - f32(R02)
    dyu = f32(R10) * lx + f32(R11) * ly - f32(R12)
    dzu = f32(R20) * lx + f32(R21) * ly - f32(R22)
    inv_len = jax.lax.rsqrt(dxu * dxu + dyu * dyu + dzu * dzu)
    return dxu * inv_len, dyu * inv_len, dzu * inv_len


def _camera_init(px, py, seed, cfg):
    """Initial per-tile path state from camera rays (render.glsl:26-36)."""
    cx, cy, cz = cfg["camera"][0:3]
    ndx, ndy, ndz = _camera_ray(px, py, cfg)

    state0 = _wang_hash(seed)

    init = dict(
        alive=jnp.ones(px.shape, jnp.int32),
        bounce=jnp.zeros(px.shape, jnp.int32),
        # px*0, not zeros: gives the segs loop carry a lane-varying layout
        # from the start — Mosaic's carry-layout inference fixes each carry
        # on its first pass, and a splat-initialized carry whose updates turn
        # varying later dies with "invalid relayout ... replicated in
        # destination". x*0.0 is IEEE-unfoldable (NaN*0 = NaN), so the
        # compiler cannot constant-fold it back to a splat.
        segs=px * f32(0.0),
        ox=jnp.full(px.shape, f32(cx)),
        oy=jnp.full(px.shape, f32(cy)),
        oz=jnp.full(px.shape, f32(cz)),
        dx=ndx,
        dy=ndy,
        dz=ndz,
        tmin=jnp.full(px.shape, f32(M_EPS)),
        state=state0,
        tr=jnp.ones(px.shape, f32),
        tg=jnp.ones(px.shape, f32),
        tb=jnp.ones(px.shape, f32),
        er=jnp.zeros(px.shape, f32),
        eg=jnp.zeros(px.shape, f32),
        eb=jnp.zeros(px.shape, f32),
        Lr=jnp.zeros(px.shape, f32),
        Lg=jnp.zeros(px.shape, f32),
        Lb=jnp.zeros(px.shape, f32),
        wd=jnp.ones(px.shape, jnp.int32),  # wasDiscrete
        depth=jnp.zeros(px.shape, f32),
        n1=jnp.zeros(px.shape, f32),
        n2=jnp.zeros(px.shape, f32),
        n3=jnp.zeros(px.shape, f32),
        rows=jnp.zeros(px.shape, f32),
        ar=jnp.zeros(px.shape, f32),
        ag=jnp.zeros(px.shape, f32),
        ab=jnp.zeros(px.shape, f32),
        # current sweep-sample index (chained launches advance it; plain
        # launches carry it at 0). f32 like segs: varying layout + exact
        # small ints without i32 relayout limits
        samp=px * f32(0.0),
    )

    return init


def _megakernel(rows_ref, *args, cfg):
    # optional dedicated any-hit shadow table ref follows the main table
    # (cfg["shadow_tbl_rows"] > 0 — see render_tiles/_bounce_loop NEE site)
    if cfg.get("shadow_tbl_rows"):
        shadow_ref, *args = args
        cfg = dict(cfg, shadow_ref=shadow_ref)
    px_ref, py_ref, seed_ref, out_ref, state_out_ref = args
    # cap the DMA window height at the table size BEFORE scratch allocation
    # (a window taller than the table would make every [0, h) slice overrun
    # the ref, and the h=1 fallback walker reads the whole scratch); tiny
    # scenes with --mega-window collapse to single-row descriptors
    if cfg.get("hbm") and cfg.get("hbm_window", 1) > cfg["total_rows"]:
        cfg = dict(cfg, hbm_window=max(1, cfg["total_rows"]))

    def go(cfg):
        _megakernel_body(rows_ref, px_ref, py_ref, seed_ref, out_ref, state_out_ref, cfg)

    _with_hbm_bufs(cfg, go, rows_ref)


def _megakernel_body(rows_ref, px_ref, py_ref, seed_ref, out_ref, state_out_ref, cfg):
    init = _camera_init(px_ref[...], py_ref[...], seed_ref[...], cfg)
    s = _bounce_loop(rows_ref, cfg, init)
    out_ref[0] = s["Lr"]
    out_ref[1] = s["Lg"]
    out_ref[2] = s["Lb"]
    out_ref[3] = s["n1"]
    out_ref[4] = s["n2"]
    out_ref[5] = s["n3"]
    out_ref[6] = s["depth"]
    state_out_ref[0] = s["state"]


def _check_shadow_tbl(shadow_tbl, scene, table_in_hbm, shadow_cache):
    if not shadow_tbl:
        return
    if scene.shadow_rows_mega is None:
        raise ValueError(
            "shadow_tbl requires a scene compiled with a dedicated shadow "
            "table (scene.compile builds it for analytic VMEM scenes)"
        )
    if table_in_hbm:
        raise ValueError(
            "shadow_tbl is VMEM-only (HBM-streamed scenes keep the "
            "shared-table shadow walk)"
        )
    if shadow_cache:
        raise ValueError(
            "shadow_cache predicts MAIN-table rows; it cannot be combined "
            "with the dedicated shadow table"
        )


def _pad_hbm_rows(rows):
    """Zero-pad trace rows to HBM_ROW_WIDTH lanes: Mosaic DMA row slices
    must be 128-aligned in the lane dimension. HBM capacity is ample."""
    return jnp.pad(rows, ((0, 0), (0, HBM_ROW_WIDTH - rows.shape[1])))


def render_tiles(
    scene: CompiledScene,
    px,  # (N,) f32 sample x (pixel + jitter)
    py,  # (N,) f32
    seeds,  # (N,) u32 per-path seeds
    *,
    width: int,
    height: int,
    max_bounces: int = 1000,
    lane_sort: bool = False,
    interpret: bool = False,
    packet: int = PACKET,
    prefetch: bool = True,
    spec: bool = True,
    spec_resolve: bool = False,
    shadow_cache: bool = False,
    shadow_vis: bool = True,
    table_in_hbm: bool = False,
    groups: int = 1,
    group_octant: bool = True,
    trunk_rows: int = 0,
    hbm_window: int = 1,
    shadow_tbl: bool = False,
):
    """Path-trace N rays with the megakernel; returns (total(N,3), normal(N,3),
    depth(N,), state(N,)). N must be a multiple of 8*packet.

    ``shadow_tbl``: route NEE shadow rays to the scene's dedicated PACKED3
    any-hit table (scene.shadow_rows_mega; round-4 verdict #1)."""
    N = px.shape[0]
    _check_shadow_tbl(shadow_tbl, scene, table_in_hbm, shadow_cache)
    tile = SUBLANES * packet
    if N % tile != 0:
        raise ValueError(f"pad ray count to a multiple of {tile}")
    _check_groups(packet, groups, spec, table_in_hbm)
    n_tiles = N // tile
    rows = scene.trace_rows_mega
    ntab = scene.mega_num_tables_static
    trunk_rows = _clamp_trunk(trunk_rows, table_in_hbm, ntab,
                              scene.mega_tbl_rows)

    cfg = dict(
        tbl_rows=scene.mega_tbl_rows,
        total_rows=rows.shape[0],
        ntab=ntab,
        # packed leaf rows: (pay_base, n_pay, nper) of the slot-indexed payload
        # section appended after the walk tables (see scene.compile)
        packed=(
            (ntab * scene.mega_tbl_rows, scene.mega_pay_rows_static,
             scene.mega_packed_static)
            if scene.mega_packed_static
            else None
        ),
        max_bounces=max_bounces,
        camera=scene.camera_static,
        width=width,
        height=height,
        emitters=scene.emitter_bake_static,
        materials=scene.material_bake_static,
        bbox=scene.bbox_static,
        analytic=(
            scene.analytic_bake_static
            if scene.mega_analytic_mode_static
            else None
        ),
        shadow_vis=scene.shadow_vis_static if shadow_vis else (),
        lane_sort=lane_sort,
        prefetch=prefetch,
        spec=spec,
        spec_resolve=spec_resolve,
        shadow_cache=shadow_cache,
        hbm=table_in_hbm,
        groups=groups,
        group_octant=group_octant,
        trunk_rows=trunk_rows,
        hbm_window=hbm_window,
        shadow_tbl_rows=scene.shadow_tbl_rows_static if shadow_tbl else 0,
    )
    if table_in_hbm:
        rows = _pad_hbm_rows(rows)

    shape = (n_tiles, SUBLANES, packet)
    tbl_args = [rows] + ([scene.shadow_rows_mega] if shadow_tbl else [])
    out, state = pl.pallas_call(
        functools.partial(_megakernel, cfg=cfg),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                memory_space=pl.ANY if table_in_hbm else pltpu.VMEM
            ),
        ] + (
            [pl.BlockSpec(memory_space=pltpu.VMEM)] if shadow_tbl else []
        ) + [
            pl.BlockSpec((None, SUBLANES, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, SUBLANES, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, SUBLANES, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, 7, SUBLANES, packet), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, SUBLANES, packet), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            sds((n_tiles, 7, SUBLANES, packet), jnp.float32, px),
            sds((n_tiles, 1, SUBLANES, packet), jnp.uint32, px),
        ),
        interpret=interpret,
    )(*tbl_args, px.reshape(shape), py.reshape(shape), seeds.reshape(shape))

    total = jnp.stack([out[:, k].reshape(N) for k in range(3)], axis=-1)
    normal = jnp.stack([out[:, 3 + k].reshape(N) for k in range(3)], axis=-1)
    depth = out[:, 6].reshape(N)
    return total, normal, depth, state[:, 0].reshape(N)


# ----------------------------------------------------------------------------
# state-resumable kernels + the phased wavefront driver
# ----------------------------------------------------------------------------

# f32 state-pack channel order (ints stored as exact small floats)
_STATE_CH = [
    "alive", "bounce", "ox", "oy", "oz", "dx", "dy", "dz", "tmin",
    "tr", "tg", "tb", "er", "eg", "eb", "Lr", "Lg", "Lb", "wd",
    "depth", "n1", "n2", "n3", "rows", "ar", "ag", "ab", "segs",
    "samp",
]
N_STATE = len(_STATE_CH)
# result-channel order committed to the (12, N) result buffer (same order
# as CHAIN_OUT_CH: Lr,Lg,Lb, n1,n2,n3, depth, segs, rows, ar,ag,ab) — the
# ONE place the result layout is defined; commits and the phase-0 copy all
# stack through _result_stack
_RESULT_CH = tuple(
    _STATE_CH.index(ch)
    for ch in (
        "Lr", "Lg", "Lb", "n1", "n2", "n3",
        "depth", "segs", "rows", "ar", "ag", "ab",
    )
)


def _result_stack(flat):
    return jnp.stack([flat[i] for i in _RESULT_CH])


def _write_state(st_ref, rng_ref, s):
    for i, ch in enumerate(_STATE_CH):
        val = s[ch]
        if val.dtype != jnp.float32:
            val = val.astype(f32)
        st_ref[i] = val
    rng_ref[0] = s["state"]


def _read_state(st_ref, rng_ref):
    s = {}
    for i, ch in enumerate(_STATE_CH):
        v = st_ref[i]
        if ch in ("alive", "bounce", "wd"):
            v = v.astype(jnp.int32)
        s[ch] = v
    s["state"] = rng_ref[0]
    return s


def _megakernel_start(rows_ref, *args, cfg):
    """Camera launch: raygen + bounce up to cfg['max_bounces'], emit state."""
    if cfg.get("shadow_tbl_rows"):
        shadow_ref, *args = args
        cfg = dict(cfg, shadow_ref=shadow_ref)
    px_ref, py_ref, seed_ref, st_out, rng_out = args

    def go(cfg):
        init = _camera_init(px_ref[...], py_ref[...], seed_ref[...], cfg)
        s = _bounce_loop(rows_ref, cfg, init)
        _write_state(st_out, rng_out, s)

    _with_hbm_bufs(cfg, go, rows_ref)


def _megakernel_start_chained(rows_ref, *args, cfg):
    """Chained camera launch: trace cfg['chain'] sweep samples per lane,
    respawning dead lanes onto the same pixel's next sample (occupancy —
    see _bounce_loop's chain block). Finished samples flush to per-sweep
    images in ``chain_out``; paths that reach the bounce cap are parked to
    their (sample, lane) slot in ``st_out``/``rng_out`` (S state slots per
    lane, zero = no survivor) and the lane keeps chaining. The loop ends
    only when every lane has finished or parked ALL its samples."""
    if cfg.get("shadow_tbl_rows"):
        shadow_ref, *args = args
        cfg = dict(cfg, shadow_ref=shadow_ref)
    pxs_ref, pys_ref, seeds_ref, st_out, rng_out, chain_out = args

    def go(cfg):
        chain_out[...] = jnp.zeros(chain_out.shape, f32)
        st_out[...] = jnp.zeros(st_out.shape, f32)
        rng_out[...] = jnp.zeros(rng_out.shape, jnp.uint32)
        init = _camera_init(pxs_ref[0], pys_ref[0], seeds_ref[0], cfg)
        cfg2 = dict(cfg, chain_refs=(
            pxs_ref, pys_ref, seeds_ref, chain_out, st_out, rng_out
        ))
        _bounce_loop(rows_ref, cfg2, init)

    _with_hbm_bufs(cfg, go, rows_ref)


def _megakernel_resume(rows_ref, *args, cfg):
    """Resume launch: continue paths from a packed state."""
    if cfg.get("shadow_tbl_rows"):
        shadow_ref, *args = args
        cfg = dict(cfg, shadow_ref=shadow_ref)
    st_in, rng_in, st_out, rng_out = args

    def go(cfg):
        init = _read_state(st_in, rng_in)
        s = _bounce_loop(rows_ref, cfg, init)
        _write_state(st_out, rng_out, s)

    _with_hbm_bufs(cfg, go, rows_ref)


def _launch_state_kernel(kernel, cfg, rows, ins, n_tiles, interpret,
                         chain_ch=0, state_slots=1, shadow=None):
    packet = ins[0].shape[-1]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY if cfg.get("hbm") else pltpu.VMEM)
    ]
    tbl_args = [rows]
    if shadow is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        tbl_args.append(shadow)
    for a in ins:
        nch = a.shape[1] if a.ndim == 4 else None
        if a.ndim == 4:
            in_specs.append(
                pl.BlockSpec((None, nch, SUBLANES, packet), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
            )
        else:
            in_specs.append(
                pl.BlockSpec((None, SUBLANES, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            )
    out_specs = [
        pl.BlockSpec((None, state_slots * N_STATE, SUBLANES, packet), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((None, state_slots, SUBLANES, packet), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        sds((n_tiles, state_slots * N_STATE, SUBLANES, packet), jnp.float32, ins[0]),
        sds((n_tiles, state_slots, SUBLANES, packet), jnp.uint32, ins[0]),
    ]
    if chain_ch:
        out_specs.append(
            pl.BlockSpec((None, chain_ch, SUBLANES, packet), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(
            sds((n_tiles, chain_ch, SUBLANES, packet), jnp.float32, ins[0])
        )
    return pl.pallas_call(
        functools.partial(kernel, cfg=cfg),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*tbl_args, *ins)


def _run_compaction_phases(scene, base_cfg, rows, caps, shrinks, flat, rngf,
                           orig, res, res_state, packet, interpret,
                           shadow=None):
    """The wavefront's survivor phases: compact + coherence-sort the alive
    lanes, resume the megakernel at each cap, and scatter finished results
    into ``res``/``res_state`` at ``orig``. Shared by render_waves (orig =
    lane index) and render_waves_chained (orig = samp * N + lane).
    Returns (res, res_state, overflow)."""
    tile = SUBLANES * packet

    def tiles_of(n):
        return n // tile

    def commit(res, res_state, flat, rngf, orig):
        res = res.at[:, orig].set(_result_stack(flat))
        res_state = res_state.at[orig].set(rngf)
        return res, res_state

    def unpack(st, rng_st, n):
        flat = jnp.moveaxis(st, 1, 0).reshape(N_STATE, n)
        return flat, rng_st.reshape(n)

    overflow = jnp.int32(0)
    n_lanes = flat.shape[1]
    root_min = scene.bvh_aabb_min[0]
    root_span = jnp.maximum(scene.bvh_aabb_max[0] - root_min, 1e-6)

    for pi, cap in enumerate(caps):
        n_next = max(tile, -(-(n_lanes // shrinks[pi]) // tile) * tile)
        alive = flat[0] > 0
        alive_i = alive.astype(jnp.int32)
        n_alive = jnp.sum(alive_i)
        overflow = overflow + jnp.maximum(n_alive - n_next, 0)
        if n_lanes > 65536:
            # cumsum-based stable partition (argsort at this size is too slow
            # on this stack): survivors keep order, dead lanes go past the end
            rank_alive = jnp.cumsum(alive_i) - 1
            rank_dead = jnp.cumsum(1 - alive_i) - 1 + n_alive
            pos = jnp.where(alive, rank_alive, rank_dead)
            inv = jnp.zeros(n_lanes, jnp.int32).at[pos].set(
                jnp.arange(n_lanes, dtype=jnp.int32)
            )
            order = inv[:n_next]
        else:
            # small survivor sets: full coherence sort (origin cell + octant)
            qx = jnp.clip(((flat[2] - root_min[0]) / root_span[0] * 8).astype(jnp.int32), 0, 7)
            qy = jnp.clip(((flat[3] - root_min[1]) / root_span[1] * 8).astype(jnp.int32), 0, 7)
            qz = jnp.clip(((flat[4] - root_min[2]) / root_span[2] * 8).astype(jnp.int32), 0, 7)
            octant = (
                (flat[5] > 0).astype(jnp.int32)
                + 2 * (flat[6] > 0).astype(jnp.int32)
                + 4 * (flat[7] > 0).astype(jnp.int32)
            )
            key = jnp.where(alive, octant + 8 * (qx + 8 * (qy + 8 * qz)), jnp.int32(1 << 20))
            order = jnp.argsort(key)[:n_next]
        flat = flat[:, order]
        rngf = rngf[order]
        orig = orig[order]

        st_in = jnp.moveaxis(
            flat.reshape(N_STATE, tiles_of(n_next), SUBLANES, packet), 0, 1
        )
        rng_in = rngf.reshape(tiles_of(n_next), 1, SUBLANES, packet)
        st, rng_st = _launch_state_kernel(
            _megakernel_resume,
            dict(base_cfg, max_bounces=cap),
            rows,
            [st_in, rng_in],
            tiles_of(n_next),
            interpret,
            shadow=shadow,
        )
        flat, rngf = unpack(st, rng_st, n_next)
        res, res_state = commit(res, res_state, flat, rngf, orig)
        n_lanes = n_next
    return res, res_state, overflow


@functools.partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "max_bounces",
        "phase_bounces",
        "phase_shrink",
        "lane_sort",
        "interpret",
        "packet",
        "prefetch",
        "spec",
        "spec_resolve",
        "shadow_cache",
        "shadow_skip_all",
        "table_in_hbm",
        "groups",
        "group_octant",
        "trunk_rows",
        "hbm_window",
        "shadow_vis",
        "shadow_tbl",
    ),
)
def render_waves(
    scene: CompiledScene,
    px,
    py,
    seeds,
    *,
    width: int,
    height: int,
    max_bounces: int = 1000,
    phase_bounces: tuple = (5, 12, 48),
    phase_shrink: tuple = (2, 4, 4),
    lane_sort: bool = False,
    interpret: bool = False,
    packet: int = PACKET,
    prefetch: bool = True,
    spec: bool = True,
    spec_resolve: bool = False,
    shadow_cache: bool = False,
    shadow_vis: bool = True,
    shadow_skip_all: bool = False,
    table_in_hbm: bool = False,
    groups: int = 1,
    group_octant: bool = True,
    trunk_rows: int = 0,
    hbm_window: int = 1,
    shadow_tbl: bool = False,
):
    """Phased wavefront render: megakernel launches with compaction + spatial
    sorting between phases.

    Phase 0 traces every path for up to phase_bounces[0] bounces (tiles retire
    early). Between phases the surviving paths are compacted to a fraction of
    the lane count and sorted by (origin cell, direction octant) so packets
    stay coherent, then resumed with a higher bounce cap; the final phase runs
    to max_bounces. This is the full wavefront architecture: the megakernel is
    the multi-bounce stage, XLA does the inter-stage compaction (it only runs
    once per phase, so its slowness doesn't matter).

    Survivor capacities are N/4 after phase 0 and N/16 after phase 1; paths
    beyond capacity (never observed for the shipped scenes — Russian roulette
    kills ~25%/bounce early on) would be dropped and are counted in the
    returned `overflow` so callers can detect bias.

    Returns (total (N,3), normal (N,3), depth (N,), state (N,), overflow (),
    bounces (N,) — per-path segment count — and rows (N,) — trace-table rows
    visited by the lane's tile (closest + shadow + resolve loops), the
    traversal-work metric (docs/PERF_NOTES.md §9).
    """
    N_req = px.shape[0]
    tile = SUBLANES * packet
    _check_groups(packet, groups, spec, table_in_hbm)
    _check_shadow_tbl(shadow_tbl, scene, table_in_hbm, shadow_cache)
    pad = (-N_req) % tile
    if pad:
        # trace a few dummy rays (duplicates of ray 0) and drop their results:
        # non-multiple-of-1024 images (e.g. the reference's 800x600 default)
        px = jnp.concatenate([px, jnp.broadcast_to(px[0], (pad,))])
        py = jnp.concatenate([py, jnp.broadcast_to(py[0], (pad,))])
        seeds = jnp.concatenate([seeds, jnp.zeros(pad, seeds.dtype)])
    N = px.shape[0]
    rows = scene.trace_rows_mega
    ntab = scene.mega_num_tables_static
    trunk_rows = _clamp_trunk(trunk_rows, table_in_hbm, ntab,
                              scene.mega_tbl_rows)

    base_cfg = dict(
        tbl_rows=scene.mega_tbl_rows,
        total_rows=rows.shape[0],
        ntab=ntab,
        # packed leaf rows: (pay_base, n_pay, nper) of the slot-indexed payload
        # section appended after the walk tables (see scene.compile)
        packed=(
            (ntab * scene.mega_tbl_rows, scene.mega_pay_rows_static,
             scene.mega_packed_static)
            if scene.mega_packed_static
            else None
        ),
        camera=scene.camera_static,
        width=width,
        height=height,
        emitters=scene.emitter_bake_static,
        materials=scene.material_bake_static,
        bbox=scene.bbox_static,
        analytic=(
            scene.analytic_bake_static
            if scene.mega_analytic_mode_static
            else None
        ),
        shadow_vis=scene.shadow_vis_static if shadow_vis else (),
        lane_sort=lane_sort,
        prefetch=prefetch,
        spec=spec,
        spec_resolve=spec_resolve,
        shadow_cache=shadow_cache,
        shadow_skip_all=shadow_skip_all,
        hbm=table_in_hbm,
        groups=groups,
        group_octant=group_octant,
        trunk_rows=trunk_rows,
        hbm_window=hbm_window,
        shadow_tbl_rows=scene.shadow_tbl_rows_static if shadow_tbl else 0,
    )
    shadow = scene.shadow_rows_mega if shadow_tbl else None
    if table_in_hbm:
        rows = _pad_hbm_rows(rows)

    caps = list(phase_bounces) + [max_bounces]
    caps = [min(c, max_bounces) for c in caps]
    shrinks = list(phase_shrink) + [4] * (len(caps) - 1 - len(phase_shrink))
    # drop no-op resume phases (cap <= the bounce budget already spent):
    # a lane parked at cap X gains nothing from a resume capped at <= X —
    # the relaunch would retire it immediately with identical state — but
    # the phase's capacity truncation could still (spuriously) drop lanes
    # and report overflow. max_bounces <= phase_bounces[0] collapses to a
    # single phase. Bitwise-identical: skipped phases commit nothing new.
    kept = [(c, s) for c, s in zip(caps[1:], shrinks) if c > caps[0]]
    inc = []
    for c, s in kept:
        if not inc or c > inc[-1][0]:
            inc.append((c, s))
    caps = [caps[0]] + [c for c, _ in inc]
    shrinks = [s for _, s in inc]

    def tiles_of(n):
        return n // tile

    # ---- phase 0: camera launch over all N lanes ----
    shape3 = (tiles_of(N), SUBLANES, packet)
    st, rng_st = _launch_state_kernel(
        _megakernel_start,
        dict(base_cfg, max_bounces=caps[0]),
        rows,
        [px.reshape(shape3), py.reshape(shape3), seeds.reshape(shape3)],
        tiles_of(N),
        interpret,
        shadow=shadow,
    )

    def unpack(st, rng_st, n):
        flat = jnp.moveaxis(st, 1, 0).reshape(N_STATE, n)
        return flat, rng_st.reshape(n)

    flat, rngf = unpack(st, rng_st, N)

    # result buffers indexed by original lane (layout: Lr,Lg,Lb,n1,n2,n3,depth)
    orig = jnp.arange(N, dtype=jnp.int32)


    # phase 0 covers every lane in order: plain copy, no scatter
    res = _result_stack(flat)
    res_state = rngf

    res, res_state, overflow = _run_compaction_phases(
        scene, base_cfg, rows, caps[1:], shrinks, flat, rngf, orig, res,
        res_state, packet, interpret, shadow=shadow,
    )

    total = jnp.stack([res[0], res[1], res[2]], axis=-1)[:N_req]
    normal = jnp.stack([res[3], res[4], res[5]], axis=-1)[:N_req]
    albedo = jnp.stack([res[9][:N_req], res[10][:N_req], res[11][:N_req]], axis=-1)
    return (total, normal, res[6][:N_req], res_state[:N_req], overflow,
            res[7][:N_req], res[8][:N_req], albedo)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "max_bounces",
        "chain_cap",
        "phase_bounces",
        "phase_shrink",
        "interpret",
        "packet",
        "prefetch",
        "spec",
        "spec_resolve",
        "shadow_cache",
        "table_in_hbm",
        "groups",
        "group_octant",
        "trunk_rows",
        "hbm_window",
        "shadow_vis",
        "shadow_tbl",
    ),
)
def render_waves_chained(
    scene: CompiledScene,
    pxs,  # (S, N) f32 jittered pixel x per sweep
    pys,  # (S, N) f32
    seeds,  # (S, N) u32 per-(sweep, pixel) seeds
    *,
    width: int,
    height: int,
    max_bounces: int = 1000,
    chain_cap: int = 8,
    phase_bounces: tuple = (48,),
    phase_shrink: tuple = (4,),
    interpret: bool = False,
    packet: int = PACKET,
    prefetch: bool = True,
    spec: bool = True,
    spec_resolve: bool = False,
    shadow_cache: bool = False,
    shadow_vis: bool = True,
    table_in_hbm: bool = False,
    groups: int = 1,
    group_octant: bool = True,
    trunk_rows: int = 0,
    hbm_window: int = 1,
    shadow_tbl: bool = False,
):
    """Chained phased render: S sweep samples per pixel in ONE phase-0
    launch with in-kernel lane respawn (occupancy: a dead path's lane
    immediately starts the pixel's next sweep sample instead of idling
    until tile retirement), then the standard compaction phases for the
    rare paths frozen at ``chain_cap`` bounces. No sample is ever dropped:
    frozen lanes exit with full state and continue under
    ``phase_bounces``/``max_bounces`` caps exactly like render_waves
    survivors.

    Estimator-exact vs S separate ``render_waves`` sweeps: every
    (pixel, sweep) sample consumes the identical seed/jitter/RNG stream;
    only the packet composition differs (t-tie class, PERF_NOTES §9d).

    Returns per-sweep images: total (S,N,3), normal (S,N,3), depth (S,N),
    state (S,N) u32 (final lane RNG at each sample's completion slot;
    diagnostics), overflow (), bounces (S,N), rows (N,) (tile-iteration
    counter, whole-launch, returned once), albedo (S,N,3).
    """
    S, N_req = pxs.shape
    if S < 2:
        raise ValueError("render_waves_chained needs >= 2 sweeps; use render_waves")
    _check_groups(packet, groups, spec, table_in_hbm)
    _check_shadow_tbl(shadow_tbl, scene, table_in_hbm, shadow_cache)
    tile = SUBLANES * packet
    pad = (-N_req) % tile
    if pad:
        padf = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:, :1], (S, pad))], axis=1
        )
        pxs, pys, seeds = padf(pxs), padf(pys), padf(seeds)
    N = pxs.shape[1]
    rows = scene.trace_rows_mega
    ntab = scene.mega_num_tables_static
    trunk_rows = _clamp_trunk(trunk_rows, table_in_hbm, ntab,
                              scene.mega_tbl_rows)

    base_cfg = dict(
        tbl_rows=scene.mega_tbl_rows,
        total_rows=rows.shape[0],
        ntab=ntab,
        # packed leaf rows: (pay_base, n_pay, nper) of the slot-indexed payload
        # section appended after the walk tables (see scene.compile)
        packed=(
            (ntab * scene.mega_tbl_rows, scene.mega_pay_rows_static,
             scene.mega_packed_static)
            if scene.mega_packed_static
            else None
        ),
        camera=scene.camera_static,
        width=width,
        height=height,
        emitters=scene.emitter_bake_static,
        materials=scene.material_bake_static,
        bbox=scene.bbox_static,
        analytic=(
            scene.analytic_bake_static
            if scene.mega_analytic_mode_static
            else None
        ),
        shadow_vis=scene.shadow_vis_static if shadow_vis else (),
        lane_sort=False,
        prefetch=prefetch,
        spec=spec,
        spec_resolve=spec_resolve,
        shadow_cache=shadow_cache,
        hbm=table_in_hbm,
        groups=groups,
        group_octant=group_octant,
        trunk_rows=trunk_rows,
        hbm_window=hbm_window,
        shadow_tbl_rows=scene.shadow_tbl_rows_static if shadow_tbl else 0,
        chain=S,
    )
    if table_in_hbm:
        rows = _pad_hbm_rows(rows)

    nt = N // tile

    def to4(a):
        # (S, N) -> (n_tiles, S, 8, P): each tile sees its lanes' S sweeps
        return jnp.moveaxis(a.reshape(S, nt, SUBLANES, packet), 0, 1)

    cap0 = min(chain_cap, max_bounces)
    shadow = scene.shadow_rows_mega if shadow_tbl else None
    st, rng_st, chain_imgs = _launch_state_kernel(
        _megakernel_start_chained,
        dict(base_cfg, max_bounces=cap0),
        rows,
        [to4(pxs), to4(pys), to4(seeds)],
        nt,
        interpret,
        chain_ch=S * CHAIN_OUT_CH,
        state_slots=S,
        shadow=shadow,
    )
    # parked-path pool: (nt, S*N_STATE, 8, P) -> (N_STATE, S*N), slot
    # s*N + lane (matches the res layout below); most slots are dead zeros
    flat = jnp.transpose(
        st.reshape(nt, S, N_STATE, SUBLANES, packet), (2, 1, 0, 3, 4)
    ).reshape(N_STATE, S * N)
    rngf = jnp.moveaxis(rng_st, 1, 0).reshape(S * N)
    # (nt, S*12, 8, P) -> (S, 12, N) -> (12, S*N): slot s*N + lane, channel
    # order already matches _run_compaction_phases' commit layout
    # [Lr,Lg,Lb,n1,n2,n3,depth,segs,rows,ar,ag,ab]
    ci = jnp.moveaxis(chain_imgs, 1, 0).reshape(S, CHAIN_OUT_CH, N)
    res = jnp.moveaxis(ci, 0, 1).reshape(12, S * N)
    # dead pool slots (sample finished in-kernel, flushed via chain_out)
    # must never commit: point them out of bounds — JAX scatter drops OOB
    # updates — so only genuinely parked paths overwrite res
    orig = jnp.where(
        flat[0] > 0,
        jnp.arange(S * N, dtype=jnp.int32),
        jnp.int32(S * N),
    )
    res_state = rngf

    # clamp FIRST, pair each cap with ITS shrink, then drop no-op caps
    # (<= cap0, or <= an earlier cap) — same normalization as render_waves:
    # a filtered-out entry must take its shrink with it, or every later
    # phase runs at the wrong capacity; a non-monotonic resume cap is a
    # pure truncation pass that can only (spuriously) drop parked samples
    raw = [min(x, max_bounces) for x in phase_bounces] + [max_bounces]
    shr = list(phase_shrink) + [4] * (len(raw) - len(phase_shrink))
    kept = []
    for c, s in zip(raw, shr):
        if c > cap0 and (not kept or c > kept[-1][0]):
            kept.append((c, s))
    caps = [c for c, _ in kept]
    shrinks = [s for _, s in kept]
    if caps:
        res, res_state, overflow = _run_compaction_phases(
            scene, base_cfg_nochain(base_cfg), rows, caps, shrinks, flat,
            rngf, orig, res, res_state, packet, interpret, shadow=shadow,
        )
    else:
        # max_bounces <= chain_cap: every parked path already traced its
        # full bounce budget in-kernel — no resume phase exists, so commit
        # the parked pool's final states directly (a resume capped at
        # max_bounces would retire each lane immediately with identical
        # state, but its capacity truncation could spuriously drop — and
        # thus LOSE — parked samples; bitwise-identical without it)
        res = res.at[:, orig].set(_result_stack(flat))
        res_state = res_state.at[orig].set(rngf)
        overflow = jnp.int32(0)

    def per_sweep(ch):
        return res[ch].reshape(S, N)[:, :N_req]

    total = jnp.stack([per_sweep(0), per_sweep(1), per_sweep(2)], axis=-1)
    normal = jnp.stack([per_sweep(3), per_sweep(4), per_sweep(5)], axis=-1)
    albedo = jnp.stack([per_sweep(9), per_sweep(10), per_sweep(11)], axis=-1)
    state = res_state.reshape(S, N)[:, :N_req]
    return (total, normal, per_sweep(6), state, overflow, per_sweep(7),
            res[8].reshape(S, N).sum(axis=0)[:N_req], albedo)


def base_cfg_nochain(cfg):
    """Resume phases run unchained (survivor lanes each finish ONE sample;
    respawn would need per-lane pixel->seed/jitter lookups the compacted
    tiles don't carry — and frozen survivors are rare by construction)."""
    out = dict(cfg)
    out.pop("chain", None)
    return out
