"""Walker-body latency attribution by component ablation (in-process A/B).

jax.profiler hangs through the remote-compile tunnel (docs/PERF_NOTES.md
§9i), so this decomposes the traversal iteration cost the only way available:
a standalone kernel that mirrors the production body (_traverse in
ops/pallas_megakernel.py) with a FIXED iteration count and statically
togglable components. The cursor still follows the real table's exit
pointers (wrapping at the end) so fetch addresses stay data-dependent and
the measured chain is honest; iteration count is pinned so every variant
does identical trip counts and the per-iteration delta isolates one
component.

Variants:
  full        the production body (prefetch dual-successor, slab, reduce,
              prim test, counters)
  nofetch     rows8 pinned to row 0 (removes 16 dynamic slices + scalar
              cursor extraction from the chain)
  noreduce    descend vote replaced by a (8,1) column read of slab (removes
              the cross-lane any() reduction from the cursor chain)
  noprim      primitive test + accept updates removed
  noslab      slab test replaced by a constant (cursor takes exit always —
              wrapped, so trip count unchanged)
  nocount     nit counter removed
  onlyloop    empty body: cursor chain + fetch only

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ablate_walker.py
       [iters] [P]
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

from hijiki_tpu.ops.pallas_megakernel import SUBLANES, TRACE_COLS, _fetch_rows8
from hijiki_tpu.scene.compile import compile_scene, scene_to_device
from hijiki_tpu.scene.obj import load_obj_scene

f32 = jnp.float32
M_EPS = 1e-4


def _body_kernel(rows_ref, o_ref, d_ref, out_ref, *, cfg):
    """Fixed-trip-count clone of the production walker body."""
    n_iters = cfg["iters"]
    num_rows = cfg["rows"]
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    tmin = jnp.full(ox.shape, f32(M_EPS))

    inv_dx = f32(1.0) / dx
    inv_dy = f32(1.0) / dy
    inv_dz = f32(1.0) / dz
    tox = -ox * inv_dx
    toy = -oy * inv_dy
    toz = -oz * inv_dz

    fetch = cfg.get("fetch", True)
    prefetch = cfg.get("prefetch", True)
    do_slab = cfg.get("slab", True)
    do_reduce = cfg.get("reduce", True)
    do_prim = cfg.get("prim", True)
    do_count = cfg.get("count", True)

    def body(i, c):
        cur = c["cur"]
        if not fetch:
            rows8 = c["rows8"]
        elif prefetch:
            rows8 = c["rows8"]
        else:
            rows8 = _fetch_rows8(rows_ref, num_rows, cur)
        col = lambda j: jnp.broadcast_to(rows8[:, j : j + 1], ox.shape)
        col_s = lambda j: rows8[:, j : j + 1]
        kind = col(9)
        kind_s = col_s(9)
        nexit = col_s(10).astype(jnp.int32)

        if fetch and prefetch:
            fetch_a = _fetch_rows8(rows_ref, num_rows, cur + 1)
            fetch_b = _fetch_rows8(rows_ref, num_rows, nexit)

        is_prim = kind >= f32(0.0)
        is_prim_s = kind_s >= f32(0.0)
        best_t = c["t"]

        if do_slab:
            v0x, v0y, v0z = col(0), col(1), col(2)
            v1x, v1y, v1z = col(3), col(4), col(5)
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
        else:
            slab = jnp.zeros(ox.shape, bool)

        if do_reduce:
            descend = jnp.any(slab & ~is_prim, axis=1, keepdims=True)
        else:
            # (8,1) column read: same shape, no cross-lane reduction
            descend = slab[:, :1] & ~is_prim_s.astype(bool)

        out = dict(c)
        if do_prim:
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
            ok_pq = in_tri & (tmin <= t_pq) & (t_pq <= best_t)
            accept = is_prim & ok_pq & (t_pq < best_t)
            out["t"] = jnp.where(accept, t_pq, c["t"])
            out["u"] = jnp.where(accept, u, c["u"])
            out["v"] = jnp.where(accept, v, c["v"])
            cur_b = jnp.broadcast_to(cur, ox.shape)
            out["wrow"] = jnp.where(accept, cur_b, c["wrow"])

        take_exit = is_prim_s | ~descend
        nxt = jnp.where(take_exit, nexit, cur + 1)
        # wrap so the trip count is fixed but addresses stay data-dependent
        nxt = jnp.where(nxt >= num_rows, nxt - num_rows, nxt)
        out["cur"] = nxt
        if fetch and prefetch:
            sel = jnp.broadcast_to(take_exit, (SUBLANES, TRACE_COLS))
            out["rows8"] = jnp.where(sel, fetch_b, fetch_a)
        if do_count:
            out["nit"] = c["nit"] + f32(1.0)
        return out

    init = dict(
        cur=jnp.zeros((SUBLANES, 1), jnp.int32),
        t=jnp.full(ox.shape, f32(3.0e38)) + ox * f32(0.0),
        u=ox * f32(0.0),
        v=ox * f32(0.0),
        wrow=jnp.full(ox.shape, num_rows, jnp.int32),
        nit=ox * f32(0.0),
    )
    if fetch:
        init["rows8"] = _fetch_rows8(rows_ref, num_rows, init["cur"])
    else:
        init["rows8"] = _fetch_rows8(rows_ref, num_rows, init["cur"])
    final = jax.lax.fori_loop(0, n_iters, body, init)
    # finite, variant-discriminating outputs: the cursor trajectory and
    # winner rows differ between variants, so identical sums across variants
    # would expose a stale/wrong binary (remote-compile cache sanity check)
    out_ref[0] = jnp.minimum(final["t"], f32(1e6)) + final["nit"] + final["u"]
    out_ref[1] = jnp.minimum(final["wrow"].astype(f32), f32(1e6)) + jnp.broadcast_to(
        final["cur"].astype(f32), ox.shape
    )


def run_variant(rows, o, d, cfg, n_tiles, packet):
    out = pl.pallas_call(
        functools.partial(_body_kernel, cfg=cfg),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (None, 3, SUBLANES, packet), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 3, SUBLANES, packet), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, 2, SUBLANES, packet), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 2, SUBLANES, packet), f32),
    )(rows, o, d)
    return out


VARIANTS = {
    "full": {},
    "nocount": dict(count=False),
    "noreduce": dict(reduce=False),
    "noprim": dict(prim=False),
    "noslab": dict(slab=False),
    "noprefetch": dict(prefetch=False),
    "nofetch": dict(fetch=False),
    "onlyfetch": dict(slab=False, prim=False, reduce=False, count=False),
    "onlyloop": dict(
        fetch=False, slab=False, prim=False, reduce=False, count=False
    ),
    "nofetch_noreduce": dict(fetch=False, reduce=False),
    "noprim_noreduce": dict(prim=False, reduce=False),
}


def main():
    # usage: ablate_walker.py [iters] [P] [variant ...]
    # variant order = compile AND measure order; run twice with different
    # orders to detect process-mode poisoning (PERF_NOTES §1-style: absolute
    # times depend on compile order, deltas between variants may not)
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    packet = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    names = sys.argv[3:] or list(VARIANTS)
    variants = {n: VARIANTS[n] for n in names}
    n_tiles = 8
    reps = 5

    print(f"devices: {jax.devices()}", file=sys.stderr)
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs = scene_to_device(compile_scene(scene))
    rows = cs.trace_rows_mega
    R = rows.shape[0]
    print(f"table rows: {R}", file=sys.stderr)

    rng = np.random.default_rng(0)
    o = jnp.asarray(
        rng.uniform(-1, 1, (n_tiles, 3, SUBLANES, packet)).astype(np.float32)
    )
    d = rng.normal(size=(n_tiles, 3, SUBLANES, packet)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-9
    d = jnp.asarray(np.where(np.abs(d) < 1e-6, 1e-6, d))

    lanes = n_tiles * SUBLANES * packet

    # Two iteration counts per variant; the SLOPE between them is the true
    # per-iteration cost — dispatch fixed costs (~30-120 ms, varies by
    # program; PERF_NOTES §9b) cancel out, which raw totals do not.
    iters_lo, iters_hi = iters, iters * 3

    # warmup/compile all programs first
    for name, kv in variants.items():
        for it in (iters_lo, iters_hi):
            cfg = dict(kv, iters=it, rows=R)
            t0 = time.monotonic()
            r = run_variant(rows, o, d, cfg, n_tiles, packet)
            s = float(jnp.sum(r))  # host materialization
            print(
                f"compile {name}@{it}: {time.monotonic()-t0:.1f}s (sum {s:.3e})",
                file=sys.stderr,
            )

    times = {(n, it): [] for n in variants for it in (iters_lo, iters_hi)}
    for rep in range(reps):
        for name, kv in variants.items():
            for it in (iters_lo, iters_hi):
                cfg = dict(kv, iters=it, rows=R)
                t0 = time.monotonic()
                r = run_variant(rows, o, d, cfg, n_tiles, packet)
                float(jnp.sum(r))
                times[(name, it)].append(time.monotonic() - t0)

    full_ns = None
    for name in variants:
        lo = min(times[(name, iters_lo)])
        hi = min(times[(name, iters_hi)])
        ns_per_iter = (hi - lo) / ((iters_hi - iters_lo) * n_tiles) * 1e9
        if name == "full":
            full_ns = ns_per_iter
        delta = "" if full_ns is None else f"  delta {full_ns - ns_per_iter:+.0f} ns"
        print(
            f"{name:18s} lo {lo*1e3:7.1f} ms  hi {hi*1e3:7.1f} ms  "
            f"slope {ns_per_iter:7.1f} ns/iter{delta}"
        )


if __name__ == "__main__":
    main()
