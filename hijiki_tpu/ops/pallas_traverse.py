"""Pallas TPU packet-traversal kernel over the merged trace-row table.

TPU-native replacement for the reference's per-thread stackless BVH walk
(``shader/scene.glsl:99-133``). Mosaic has no per-lane gather from a large
VMEM table (dynamic gathers are limited to one (8,128) tile), so per-ray
cursor walks can't vectorize directly. Instead this kernel uses **packet
traversal**: each sublane of a (8,128) ray tile is a packet of 128 rays
sharing one scalar row cursor. Node rows are fetched with scalar dynamic
slices from the VMEM-resident table (fast and always supported), the
AABB/primitive tests run vectorized across the full (8,128) tile (each
sublane testing its packet's row), and a packet descends when *any* of its
rays hits the interior AABB.

Packet traversal visits the union of rows its rays need, so coherence
matters; the wavefront driver's lane sorting groups rays by direction octant
to keep packets tight. Hit results are identical to the lockstep walks (same
table, same accept rules): a packet visits a superset of each member ray's
rows and per-ray accepts are masked, so extra visits cannot change the
closest hit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hijiki_tpu.utils.vma import sds

M_EPS = 1e-4  # python float: jnp constants can't be captured by kernels
PACKET = 128  # rays per packet (lane dim)
SUBLANES = 8  # packets per kernel tile

KIND_SPHERE = 0
KIND_TRIANGLE = 2


def _traverse_kernel(rows_ref, rays_ref, out_ref, *, num_rows, any_hit):
    """One grid step = one (8,128)-ray tile = 8 packets.

    rays_ref: (8, 8, 128) f32 — fields [ox,oy,oz,dx,dy,dz,tmin,tmax]
    out_ref: (6, 8, 128) f32 — [best_t, slot+1 (0 = miss), u, v, tag, midx]
    rows_ref: (num_rows_padded, 32) f32 — trace rows (scene.compile layout)
    """
    f32 = jnp.float32
    ox = rays_ref[0]
    oy = rays_ref[1]
    oz = rays_ref[2]
    dx = rays_ref[3]
    dy = rays_ref[4]
    dz = rays_ref[5]
    tmin = rays_ref[6]
    tmax = rays_ref[7]

    inv_dx = f32(1.0) / dx
    inv_dy = f32(1.0) / dy
    inv_dz = f32(1.0) / dz
    tox = -ox * inv_dx
    toy = -oy * inv_dy
    toz = -oz * inv_dz

    def cond(c):
        return jnp.any(c["cur"] < num_rows)

    def body(c):
        cur = c["cur"]  # (8,1) i32 packet cursors
        # Fetch each packet's row with a scalar dynamic slice -> (8,32).
        rows8 = jnp.concatenate(
            [
                rows_ref[pl.ds(jnp.minimum(cur[k, 0], num_rows - 1), 1), :]
                for k in range(SUBLANES)
            ],
            axis=0,
        )
        col = lambda j: rows8[:, j : j + 1]  # (8,1), broadcasts over lanes

        v0x, v0y, v0z = col(0), col(1), col(2)
        v1x, v1y, v1z = col(3), col(4), col(5)
        v2x, v2y, v2z = col(6), col(7), col(8)
        kind = col(9)  # (8,1) f32: -1 interior, else prim kind
        nexit = col(10).astype(jnp.int32)  # (8,1)
        slot1 = col(11) + f32(1.0)  # slot+1; 0 reserved for miss
        mtag = col(12)  # material tag (prim rows)
        midx = col(13)  # material per-type index

        active = cur < num_rows  # (8,1)
        is_prim = kind >= f32(0.0)  # (8,1)
        best_t = c["best_t"]

        # --- interior rows: slab test (scene.glsl:118-130) ---
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
        descend = jnp.any(slab & active & ~is_prim, axis=1, keepdims=True)  # (8,1)

        # --- primitive rows: unified test (ops.intersect.intersect_unified) ---
        nx = v1y * v2z - v1z * v2y
        ny = v1z * v2x - v1x * v2z
        nz = v1x * v2y - v1y * v2x
        rox = ox - v0x
        roy = oy - v0y
        roz = oz - v0z
        qx = roy * dz - roz * dy
        qy = roz * dx - rox * dz
        qz = rox * dy - roy * dx
        dd = f32(1.0) / (dx * nx + dy * ny + dz * nz)
        u = -dd * (qx * v2x + qy * v2y + qz * v2z)
        v = dd * (qx * v1x + qy * v1y + qz * v1z)
        t_pq = -dd * (nx * rox + ny * roy + nz * roz)
        is_tri = kind == f32(KIND_TRIANGLE)
        in_tri = (u >= 0) & (v >= 0) & (u + v <= f32(1.0))
        in_quad = (u >= 0) & (u <= f32(1.0)) & (v >= 0) & (v <= f32(1.0))
        # select on booleans via logic ops (Mosaic can't select i1 vectors)
        ok_pq = (is_tri & in_tri) | (~is_tri & in_quad)
        ok_pq &= (tmin <= t_pq) & (t_pq <= best_t)

        radius = v1x
        sb = f32(2.0) * (dx * rox + dy * roy + dz * roz)
        sc = rox * rox + roy * roy + roz * roz - radius * radius
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

        accept = active & is_prim & phit & (pt < best_t)
        best_t = jnp.where(accept, pt, best_t)
        best_slot = jnp.where(accept, slot1, c["best_slot"])
        best_u = jnp.where(accept, pu, c["best_u"])
        best_v = jnp.where(accept, pv, c["best_v"])
        best_tag = jnp.where(accept, mtag, c["best_tag"])
        best_midx = jnp.where(accept, midx, c["best_midx"])

        nxt = jnp.where(is_prim | ~descend, nexit, cur + 1)
        if any_hit:
            # a packet whose every lane already has a hit can exit early
            done = jnp.all(best_slot > f32(0.0), axis=1, keepdims=True)
            nxt = jnp.where(done, num_rows, nxt)
        cur = jnp.where(active, nxt, cur)
        return dict(
            cur=cur,
            best_t=best_t,
            best_slot=best_slot,
            best_u=best_u,
            best_v=best_v,
            best_tag=best_tag,
            best_midx=best_midx,
        )

    init = dict(
        cur=jnp.zeros((SUBLANES, 1), jnp.int32),
        best_t=tmax,
        best_slot=jnp.zeros((SUBLANES, PACKET), f32),
        best_u=jnp.zeros((SUBLANES, PACKET), f32),
        best_v=jnp.zeros((SUBLANES, PACKET), f32),
        best_tag=jnp.zeros((SUBLANES, PACKET), f32),
        best_midx=jnp.zeros((SUBLANES, PACKET), f32),
    )
    c = jax.lax.while_loop(cond, body, init)
    out_ref[0] = c["best_t"]
    out_ref[1] = c["best_slot"]
    out_ref[2] = c["best_u"]
    out_ref[3] = c["best_v"]
    out_ref[4] = c["best_tag"]
    out_ref[5] = c["best_midx"]


def pad_rows_table(rows):
    """Pad trace rows to a multiple-of-8 row count for VMEM tiling."""
    R, W = rows.shape
    R_pad = -(-R // 8) * 8
    if R_pad == R:
        return rows.astype(jnp.float32)
    out = jnp.zeros((R_pad, W), jnp.float32)
    return out.at[:R, :].set(rows.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def traverse_packets(rows, o, d, tmin, tmax, *, any_hit=False, interpret=False):
    """Packet-traverse rays against the trace-row table.

    Args:
      rows: (R,32) f32 trace rows (scene.compile.build_trace_rows).
      o, d: (N,3); tmin/tmax: (N,). N must be a multiple of 1024; callers
        should arrange coherent rays contiguously (each 128 = one packet).

    Returns (best_t, slot, u, v); slot = -1 where missed.
    """
    N = o.shape[0]
    if N % (SUBLANES * PACKET) != 0:
        raise ValueError("pad ray count to a multiple of 1024")
    n_tiles = N // (SUBLANES * PACKET)
    R = rows.shape[0]

    rows_padded = pad_rows_table(rows)

    def pack(x):
        return x.reshape(n_tiles, SUBLANES, PACKET)

    rays = jnp.stack(
        [
            pack(o[:, 0]),
            pack(o[:, 1]),
            pack(o[:, 2]),
            pack(d[:, 0]),
            pack(d[:, 1]),
            pack(d[:, 2]),
            pack(tmin),
            pack(tmax),
        ],
        axis=1,
    )  # (n_tiles, 8, 8, 128)

    out = pl.pallas_call(
        functools.partial(_traverse_kernel, num_rows=R, any_hit=any_hit),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table, VMEM-resident
            pl.BlockSpec(
                (None, 8, SUBLANES, PACKET),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, 6, SUBLANES, PACKET), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=sds((n_tiles, 6, SUBLANES, PACKET), jnp.float32, rays),
        interpret=interpret,
    )(rows_padded, rays)

    unpack = lambda x: x.reshape(N)
    best_t = unpack(out[:, 0])
    slot = unpack(out[:, 1]).astype(jnp.int32) - 1
    u = unpack(out[:, 2])
    v = unpack(out[:, 3])
    tag = unpack(out[:, 4]).astype(jnp.int32)
    midx = unpack(out[:, 5]).astype(jnp.int32)
    return best_t, slot, u, v, tag, midx


TILE = SUBLANES * PACKET


def _flatten_pad(o, d, tmin, tmax):
    shape = o.shape[:-1]
    n = 1
    for s in shape:
        n *= s
    o = o.reshape(n, 3)
    d = d.reshape(n, 3)
    tmin = tmin.reshape(n)
    tmax = tmax.reshape(n)
    pad = (-n) % TILE
    if pad:
        # dummy rays: tmax = -BIG accepts nothing AND fails every slab vote
        # (t0 < best_t is unsatisfiable at scene scale) — a -1 sentinel still
        # let rays whose origin sits >1 unit inside a node AABB vote descend,
        # inflating live packets' unions and blocking the any-hit early exit
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        tmin = jnp.concatenate([tmin, jnp.zeros(pad, tmin.dtype)])
        tmax = jnp.concatenate([tmax, jnp.full(pad, -3.0e38, tmax.dtype)])
    return shape, n, o, d, tmin, tmax


def intersect_packets(o, d, tmin, tmax, active=None, *, scene):
    """Closest-hit via the packet kernel; returns ops.intersect.Hit.

    Inactive lanes get tmax = -3e38 (f32-finite "-inf"): they accept nothing
    and cannot vote a packet into descending (the slab test's t0 < best_t is
    unsatisfiable), so all-dead packets exit in depth-many steps and stale
    rays never inflate a live packet's row union.
    """
    from hijiki_tpu.ops.intersect import Hit

    if active is not None:
        tmax = jnp.where(active, tmax, -3.0e38)
    shape, n, o, d, tmin, tmax = _flatten_pad(o, d, tmin, tmax)
    best_t, slot, u, v, tag, midx = traverse_packets(scene.trace_rows, o, d, tmin, tmax)
    best_t, slot, u, v, tag, midx = (
        x[:n].reshape(shape) for x in (best_t, slot, u, v, tag, midx)
    )
    valid = slot >= 0
    slot = jnp.maximum(slot, 0)
    return Hit(
        valid=valid,
        t=best_t,
        prim_slot=slot,
        shape_id=scene.prim_shape_id[slot],
        u=u,
        v=v,
        tag=tag,
        midx=midx,
    )


def occluded_packets(o, d, tmin, tmax, active=None, *, scene):  # noqa: D401
    """Any-hit via the packet kernel (early packet exit when fully hit)."""
    if active is not None:
        tmax = jnp.where(active, tmax, -3.0e38)  # never hit, never vote
    shape, n, o, d, tmin, tmax = _flatten_pad(o, d, tmin, tmax)
    out = traverse_packets(scene.trace_rows, o, d, tmin, tmax, any_hit=True)
    slot = out[1]
    return (slot[:n] >= 0).reshape(shape)
