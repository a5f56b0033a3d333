"""In-process A/B: hoisted-geometry/pre-rolled reconstruction kernel vs the
round-2 baseline kernel (docs/PERF_NOTES.md §9p). Outputs must be BITWISE
equal (pure hoisting, identical accumulation order).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_reconstruct.py [W]
"""

import functools
import math
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

from hijiki_tpu.render.pallas_reconstruct import (
    R,
    STRIP,
    f32,
    reconstruct_pallas,
)
from hijiki_tpu.utils.vma import sds

# ---- the pre-hoisting kernel (verbatim from git history) ----

def _old_kernel(so_ref, prev_ref, cur_ref, next_ref, out_ref, *, cfg):
    H, W, B, stddev = cfg["height"], cfg["width"], cfg["block"], cfg["stddev"]
    i = pl.program_id(0)

    gauss_fac = -1.0 / (2.0 * stddev * stddev)
    curve_offset = math.exp(gauss_fac * R * R)

    sox = so_ref[0, 0]
    soy = so_ref[0, 1]

    # (24, W) vertical window: prev strip rows 0-7, current 8-15, next 16-23
    def slab(c):
        return jnp.concatenate([prev_ref[c], cur_ref[c], next_ref[c]], axis=0)

    cw_r, cw_g, cw_b, cw_w = slab(0), slab(1), slab(2), slab(3)
    n_x, n_y, n_z = slab(4), slab(5), slab(6)

    # global coords of the 8 output rows
    py = i * STRIP + jax.lax.broadcasted_iota(jnp.int32, (STRIP, W), 0)
    px = jax.lax.broadcasted_iota(jnp.int32, (STRIP, W), 1)

    # center features: zero on spill pixels of full blocks (module docstring)
    ncx = cur_ref[4]
    ncy = cur_ref[5]
    ncz = cur_ref[6]

    acc = [jnp.zeros((STRIP, W), f32) for _ in range(4)]

    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            offx = f32(dx) + sox - f32(0.5)
            offy = f32(dy) + soy - f32(0.5)
            w_sp = jnp.exp(f32(gauss_fac) * (offx * offx + offy * offy)) - f32(
                curve_offset
            )

            qx = px + dx
            qy = py + dy
            in_img = (qx >= 0) & (qx < W) & (qy >= 0) & (qy < H)
            ox = (qx // B) * B
            oy = (qy // B) * B
            dw = jnp.minimum(B, W - ox)
            dh = jnp.minimum(B, H - oy)
            lx = px - ox
            ly = py - oy
            in_splat = (lx >= 0) & (ly >= 0) & (lx < dw + R) & (ly < dh + R)
            center_valid = (lx < dw) & (ly < dh)

            # shifted reads: rows are static slices of the 24-row window,
            # columns via roll + wraparound mask (folded into in_img above)
            def sh(a):
                rows = jax.lax.slice_in_dim(a, STRIP + dy, 2 * STRIP + dy, axis=0)
                # pltpu.roll requires non-negative shift: reading q = p + dx
                # is a roll by -dx, i.e. W - dx when dx > 0
                return pltpu.roll(rows, (-dx) % W, 1) if dx else rows

            zero = jnp.zeros((STRIP, W), f32)
            nqx = sh(n_x)
            nqy = sh(n_y)
            nqz = sh(n_z)
            dnx = nqx - jnp.where(center_valid, ncx, zero)
            dny = nqy - jnp.where(center_valid, ncy, zero)
            dnz = nqz - jnp.where(center_valid, ncz, zero)
            w = w_sp * jnp.exp(f32(-2.0) * (dnx * dnx + dny * dny + dnz * dnz))

            cr = w * sh(cw_r)
            cg = w * sh(cw_g)
            cb = w * sh(cw_b)
            cwv = w * sh(cw_w)
            nan = (
                jnp.isnan(cr) | jnp.isnan(cg) | jnp.isnan(cb) | jnp.isnan(cwv)
            )
            valid = (w_sp >= f32(0.0)) & in_img & in_splat & ~nan
            acc[0] = acc[0] + jnp.where(valid, cr, zero)
            acc[1] = acc[1] + jnp.where(valid, cg, zero)
            acc[2] = acc[2] + jnp.where(valid, cb, zero)
            acc[3] = acc[3] + jnp.where(valid, cwv, zero)

    for c in range(4):
        out_ref[c] = acc[c]



@functools.partial(jax.jit, static_argnames=("block_size", "stddev"))
def reconstruct_old(color, normal, sample_offset, *, block_size, stddev=0.5):
    H, W = color.shape[0], color.shape[1]
    Hp = -(-H // STRIP) * STRIP
    wch = jnp.ones((H, W), f32)
    planes = jnp.stack(
        [color[..., 0] * wch, color[..., 1] * wch, color[..., 2] * wch, wch,
         normal[..., 0], normal[..., 1], normal[..., 2]]
    )
    if Hp != H:
        planes = jnp.pad(planes, ((0, 0), (0, Hp - H), (0, 0)))
    n_strips = Hp // STRIP
    cfg = dict(height=H, width=W, block=block_size, stddev=stddev)
    so = sample_offset.reshape(1, 2).astype(f32)
    clamp = lambda j: jnp.clip(j, 0, n_strips - 1)
    out = pl.pallas_call(
        functools.partial(_old_kernel, cfg=cfg),
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((7, STRIP, W), lambda i: (0, clamp(i - 1), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, STRIP, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, STRIP, W), lambda i: (0, clamp(i + 1), 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, STRIP, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=sds((4, Hp, W), jnp.float32, planes),
    )(so, planes, planes, planes)
    return jnp.moveaxis(out[:, :H], 0, -1)


REPS = 6


@functools.partial(jax.jit, static_argnames=("k", "strip"))
def _chain_k(color, normal, so, *, k, strip=8):
    """k reconstruction kernels in ONE dispatch (each consumes the previous
    output, so XLA cannot elide any). Slope timing over k isolates the
    in-stream kernel cost from the ~29 ms/dispatch tunnel RTT (PERF_NOTES
    §9p) — the statistic the cfg5 BASELINE row needs (round-3 review: the
    dispatch-bound end-to-end number drifted 2x with tunnel health and was
    misread as a kernel regression)."""

    def body(i, c):
        out = reconstruct_pallas(c, normal, so, block_size=128, strip=strip)
        return out[..., :3]

    return jnp.sum(jax.lax.fori_loop(0, k, body, color))


def instream(W=1024, H=1024, k_hi=17):
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.random((H, W, 3), np.float32))
    normal = jnp.asarray(rng.random((H, W, 3), np.float32) * 2 - 1)
    so = jnp.asarray(np.float32([0.37, 0.61]))
    for k in (1, k_hi):  # compile both outside the timed region
        float(_chain_k(color, normal, so, k=k))
    t = {}
    for _ in range(REPS):
        for k in (1, k_hi):
            t0 = time.monotonic()
            float(_chain_k(color, normal, so, k=k))
            t.setdefault(k, []).append(time.monotonic() - t0)
    t1, tk = min(t[1]), min(t[k_hi])
    per = (tk - t1) / (k_hi - 1)
    print(
        f"in-stream: k=1 {t1*1e3:.1f} ms, k={k_hi} {tk*1e3:.1f} ms -> "
        f"{per*1e3:.2f} ms/kernel = {W*H/per/1e6:.1f} Mpix/s "
        f"(dispatch floor {max(t1-per,0)*1e3:.1f} ms)"
    )


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "instream":
        W = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
        instream(W, W)
        return
    W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(f"devices: {jax.devices()}, {W}x{H}", file=sys.stderr)
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.random((H, W, 3), np.float32))
    normal = jnp.asarray(rng.random((H, W, 3), np.float32) * 2 - 1)
    so = jnp.asarray(np.float32([0.37, 0.61]))

    variants = {"old": functools.partial(reconstruct_old, block_size=128)}
    for st in (8, 16, 32, 64):
        variants[f"s{st}"] = functools.partial(
            reconstruct_pallas, block_size=128, strip=st
        )
    new = variants["s8"]
    old = variants["old"]

    b = np.asarray(old(color, normal, so))
    for name, fn in variants.items():
        a = np.asarray(fn(color, normal, so))
        print(name, "bitwise equal:", np.array_equal(a, b), file=sys.stderr)

    times = {name: [] for name in variants}
    # sync via an on-device scalar reduction: a full-image np.asarray pulls
    # 16 MB through the tunnel (~900 ms) and swamps the kernel time
    for rep in range(REPS):
        for name, fn in variants.items():
            t0 = time.monotonic()
            float(jnp.sum(fn(color, normal, so)))
            times[name].append(time.monotonic() - t0)
    base = min(times["old"])
    for name in variants:
        print(f"{name}: min {min(times[name])*1e3:.1f} ms  "
              f"speedup {base/min(times[name]):.3f}x")


if __name__ == "__main__":
    main()
