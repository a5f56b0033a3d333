"""Pallas bilateral reconstruction kernel.

The XLA formulation (render/reconstruct.py) roundtrips ~75 full-image
temporaries through HBM, which on this stack's ~20 GB/s effective XLA
bandwidth costs tens of seconds per sweep (docs/PERF_NOTES.md). This kernel
computes the same filter reading each input strip once from VMEM.

Semantics are reconstruction.glsl's, identical to reconstruct_sweep in
reference mode: per output pixel p and offset delta in [-R,R]^2,
  w = [exp(gaussFac*|delta+so-0.5|^2) - curveOffset]_+ gate
      * exp(-2*|n(q)-n_center|^2),   q = p + delta
with the reference's block-splatting rules (no left/top spill, zero center
features on full-block spill pixels) and NaN rejection. The albedo feature
term is omitted because the reference's albedo AOV is identically zero
(render.glsl:84-85,174) — with albedo == 0 the term is exactly 1.

Layout: channel-major (C,H,W) planes; the grid walks 8-row strips, each
kernel instance reading the strip above/below for the vertical halo and
using lane rolls + column masks for the horizontal halo.

Fixed radius R=2 (the reference's compiled-in default, src/main.rs:1284);
stddev is baked per-compile like the reference's RECONSTRUCTION_STDDEV macro.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hijiki_tpu.utils.vma import sds

R = 2  # RECONSTRUCTION_RADIUS (src/main.rs:1284)
STRIP = 8
f32 = jnp.float32


def _reconstruct_kernel(so_ref, prev_ref, cur_ref, next_ref, out_ref, *, cfg):
    H, W, B, stddev = cfg["height"], cfg["width"], cfg["block"], cfg["stddev"]
    STRIP = cfg["strip"]
    i = pl.program_id(0)

    gauss_fac = -1.0 / (2.0 * stddev * stddev)
    curve_offset = math.exp(gauss_fac * R * R)

    sox = so_ref[0, 0]
    soy = so_ref[0, 1]

    # (24, W) vertical window: prev strip rows 0-7, current 8-15, next 16-23
    def slab(c):
        return jnp.concatenate([prev_ref[c], cur_ref[c], next_ref[c]], axis=0)

    slabs = [slab(c) for c in range(7)]

    # global coords of the 8 output rows
    py = i * STRIP + jax.lax.broadcasted_iota(jnp.int32, (STRIP, W), 0)
    px = jax.lax.broadcasted_iota(jnp.int32, (STRIP, W), 1)

    # center features: zero on spill pixels of full blocks (module docstring)
    ncx = cur_ref[4]
    ncy = cur_ref[5]
    ncz = cur_ref[6]

    # block-splat geometry hoisted out of the 25-offset loop: it separates
    # into per-dx column terms and per-dy row terms (10 int divs total
    # instead of 50, and the in-loop mask assembly is two ANDs)
    colgeo = {}
    for dx in range(-R, R + 1):
        qx = px + dx
        ox = (qx // B) * B
        dw = jnp.minimum(B, W - ox)
        lxq = px - ox
        colgeo[dx] = dict(
            in_x=(qx >= 0) & (qx < W),
            splat_x=(lxq >= 0) & (lxq < dw + R),
            center_x=(lxq < dw),
        )
    rowgeo = {}
    for dy in range(-R, R + 1):
        qy = py + dy
        oy = (qy // B) * B
        dh = jnp.minimum(B, H - oy)
        lyq = py - oy
        rowgeo[dy] = dict(
            in_y=(qy >= 0) & (qy < H),
            splat_y=(lyq >= 0) & (lyq < dh + R),
            center_y=(lyq < dh),
        )

    # pre-roll each slab once per dx (35 rolls of the 24-row window instead
    # of 140 in-loop rolls of 8-row slices); sh() below is then a free
    # static row slice. pltpu.roll needs a non-negative shift: reading
    # q = p + dx is a roll by -dx, i.e. W - dx when dx > 0
    rolled = {
        dx: [pltpu.roll(a, (-dx) % W, 1) if dx else a for a in slabs]
        for dx in range(-R, R + 1)
    }

    acc = [jnp.zeros((STRIP, W), f32) for _ in range(4)]

    for dy in range(-R, R + 1):
        rg = rowgeo[dy]
        for dx in range(-R, R + 1):
            cg_ = colgeo[dx]
            offx = f32(dx) + sox - f32(0.5)
            offy = f32(dy) + soy - f32(0.5)
            w_sp = jnp.exp(f32(gauss_fac) * (offx * offx + offy * offy)) - f32(
                curve_offset
            )

            in_img = cg_["in_x"] & rg["in_y"]
            in_splat = cg_["splat_x"] & rg["splat_y"]
            center_valid = cg_["center_x"] & rg["center_y"]

            def sh(c):
                return jax.lax.slice_in_dim(
                    rolled[dx][c], STRIP + dy, 2 * STRIP + dy, axis=0
                )

            zero = jnp.zeros((STRIP, W), f32)
            dnx = sh(4) - jnp.where(center_valid, ncx, zero)
            dny = sh(5) - jnp.where(center_valid, ncy, zero)
            dnz = sh(6) - jnp.where(center_valid, ncz, zero)
            w = w_sp * jnp.exp(f32(-2.0) * (dnx * dnx + dny * dny + dnz * dnz))

            cr = w * sh(0)
            cg2 = w * sh(1)
            cb = w * sh(2)
            cwv = w * sh(3)
            nan = (
                jnp.isnan(cr) | jnp.isnan(cg2) | jnp.isnan(cb) | jnp.isnan(cwv)
            )
            valid = (w_sp >= f32(0.0)) & in_img & in_splat & ~nan
            acc[0] = acc[0] + jnp.where(valid, cr, zero)
            acc[1] = acc[1] + jnp.where(valid, cg2, zero)
            acc[2] = acc[2] + jnp.where(valid, cb, zero)
            acc[3] = acc[3] + jnp.where(valid, cwv, zero)

    for c in range(4):
        out_ref[c] = acc[c]


@functools.partial(
    jax.jit, static_argnames=("block_size", "stddev", "interpret", "strip")
)
def reconstruct_pallas(
    color,  # (H,W,3)
    normal,  # (H,W,3)
    sample_offset,  # (2,)
    sample_weight=None,  # (H,W) or None
    *,
    block_size: int,
    stddev: float = 0.5,
    interpret: bool = False,
    strip: int = STRIP,
):
    """Pallas reconstruction; returns the (H,W,4) framebuffer delta."""
    H, W = color.shape[0], color.shape[1]
    STRIP_ = strip
    Hp = -(-H // STRIP_) * STRIP_
    if sample_weight is None:
        wch = jnp.ones((H, W), f32)
    else:
        wch = sample_weight.astype(f32)
    planes = jnp.stack(
        [
            color[..., 0] * wch,
            color[..., 1] * wch,
            color[..., 2] * wch,
            wch,
            normal[..., 0],
            normal[..., 1],
            normal[..., 2],
        ]
    )
    if Hp != H:
        planes = jnp.pad(planes, ((0, 0), (0, Hp - H), (0, 0)))
    n_strips = Hp // STRIP_

    cfg = dict(height=H, width=W, block=block_size, stddev=stddev, strip=STRIP_)
    so = sample_offset.reshape(1, 2).astype(f32)

    clamp = lambda j: jnp.clip(j, 0, n_strips - 1)
    out = pl.pallas_call(
        functools.partial(_reconstruct_kernel, cfg=cfg),
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((7, STRIP_, W), lambda i: (0, clamp(i - 1), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, STRIP_, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, STRIP_, W), lambda i: (0, clamp(i + 1), 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, STRIP_, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=sds((4, Hp, W), jnp.float32, planes),
        interpret=interpret,
    )(so, planes, planes, planes)

    return jnp.moveaxis(out[:, :H], 0, -1)
