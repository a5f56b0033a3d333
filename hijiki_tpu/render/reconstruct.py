"""Bilateral feature-buffer reconstruction filter + progressive accumulation.

Reimplements the reference's ``shader/reconstruction.glsl`` semantics exactly,
but as one vectorized full-image stencil per sweep instead of per-block
dispatches. For every output pixel p and window offset delta (|delta|<=R):

* spatial weight  = exp(gaussFac*|delta + sampleOffset - 0.5|^2) - curveOffset,
  skipped when negative (reconstruction.glsl:43-46),
* feature weight  = exp(-(2*|n(q)-n_center|^2 + |a(q)-a_center|^2)) with
  q = p + delta (reconstruction.glsl:47-54),
* the contribution w * (rgb, 1) is accumulated into the persistent
  (rgb*weight, weight) framebuffer; normalization by .w happens only at
  preview/save (reconstruction.glsl:59,65, preview.glsl:11).

Reference block-boundary quirks are reproduced faithfully:

* a sample q only splats to output pixels p inside or right/below of q's own
  block: p >= block_origin(q) and p - block_origin(q) < block_dim(q) + R —
  the left/top spill never happens because the reconstruction dispatch starts
  at the block origin (gid - RADIUS underflows unsigned and is discarded,
  reconstruction.glsl:23,36-39),
* for spill pixels (p outside q's block interior) the *center* features read
  out of bounds and return 0 (GLSL robust image access), so their feature
  weight uses n_center = 0,
* NaN contributions are rejected per (p, delta) pair (reconstruction.glsl:55-58).

The reference's albedo AOV is always zero (render.glsl:84-85,174) making the
albedo term inert; we keep the term (with the always-zero AOV) for parity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def reconstruct_sweep(
    color,  # (H,W,3) per-pixel radiance of this sweep
    normal,  # (H,W,3) first-hit normal AOV
    albedo,  # (H,W,3) albedo AOV (always zero in reference mode)
    sample_offset,  # (2,) f32, this sweep's subpixel jitter
    *,
    block_size: int,
    radius: int = 2,
    stddev: float = 0.5,
    sample_weight=None,  # (H,W) mask of locally-rendered pixels, default all-1
):
    """One sweep's reconstruction: returns the (H,W,4) framebuffer delta.

    ``sample_weight`` supports multi-chip partial films: pixels a device did
    not render carry weight 0, so their (rgb*w, w) contribution vanishes and
    the psum of per-device partials equals the single-device result.
    """
    f32 = jnp.float32
    H, W = color.shape[0], color.shape[1]
    R, B = radius, block_size

    gauss_fac = f32(-1.0 / (2.0 * stddev * stddev))
    curve_offset = jnp.exp(gauss_fac * f32(R * R))

    # Input sample value (rgb, 1) — the integrator's vec4(total, 1).
    if sample_weight is None:
        w_ch = jnp.ones((H, W, 1), f32)
    else:
        w_ch = sample_weight.astype(f32)[..., None]
    cw = jnp.concatenate([color * w_ch, w_ch], axis=-1)

    py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    # Zero-pad inputs by R so shifted reads are plain slices.
    def pad(img):
        return jnp.pad(img, ((R, R), (R, R), (0, 0)))

    cw_p, n_p, a_p = pad(cw), pad(normal), pad(albedo)

    out = jnp.zeros((H, W, 4), f32)
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            so = sample_offset - f32(0.5)
            off = jnp.stack([f32(dx) + so[0], f32(dy) + so[1]])
            w_sp = jnp.exp(gauss_fac * jnp.sum(off * off)) - curve_offset

            qx, qy = px + dx, py + dy
            in_img = (qx >= 0) & (qx < W) & (qy >= 0) & (qy < H)
            # q's block geometry (per-axis origin + clipped dim).
            ox = (qx // B) * B
            oy = (qy // B) * B
            dw = jnp.minimum(B, W - ox)
            dh = jnp.minimum(B, H - oy)
            # p must be within [origin, origin + dim + R) of q's block and not
            # left/above it (no left/top spill, see module docstring).
            lx, ly = px - ox, py - oy
            in_splat = (lx >= 0) & (ly >= 0) & (lx < dw + R) & (ly < dh + R)
            # center features read at p within q's block: OOB -> 0
            center_valid = ((lx < dw) & (ly < dh))[..., None]
            n_center = jnp.where(center_valid, normal, f32(0.0))
            a_center = jnp.where(center_valid, albedo, f32(0.0))

            # shifted sample reads (zero-padded outside the image)
            sl = lambda img: jax.lax.dynamic_slice(
                img, (R + dy, R + dx, 0), (H, W, img.shape[-1])
            )
            cw_q, n_q, a_q = sl(cw_p), sl(n_p), sl(a_p)

            dn = n_q - n_center
            da = a_q - a_center
            w_feat = jnp.exp(
                -(
                    jnp.sum(dn * dn, axis=-1) * f32(2.0)
                    + jnp.sum(da * da, axis=-1)
                )
            )
            w = w_sp * w_feat
            contrib = w[..., None] * cw_q
            valid = (
                (w_sp >= f32(0.0))
                & in_img
                & in_splat
                & ~jnp.any(jnp.isnan(contrib), axis=-1)
            )
            out = out + jnp.where(valid[..., None], contrib, f32(0.0))
    return out


def normalize_film(film):
    """rgb / weight — the preview/save normalization (preview.glsl:11,
    src/main.rs:1399)."""
    return film[..., :3] / film[..., 3:4]
