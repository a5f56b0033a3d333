"""In-kernel bitonic sort of a (8,128) tile's lanes by a per-lane key.

TPUs have no per-lane shuffle, so wavefront ray reordering is normally
impossible on-chip. This module implements a full 1024-lane bitonic sorting
network using only `pltpu.roll` and selects: an XOR-j butterfly exchange is
expressed as two cyclic rolls (+j and -j) with a position-mask select (lanes
whose j-bit is 0 take the +j roll, others the -j roll). Lane-dim XOR stages
(j < 128) use rolls on axis 1; sublane-dim stages (j = 128,256,512 when the
flat index is sublane*128 + lane) use rolls on axis 0.

All payload channels ride as ONE stacked (C,8,128) int32 array (float/uint
channels bitcast), so each butterfly stage is 2 rolls + 1 select on the whole
state regardless of channel count — the network is 55 stages x ~8 vector ops
total, small enough to unroll inside a bounce loop.

Sorting a tile's rays by direction octant + origin cell between bounces makes
each 128-lane packet nearly direction-pure, which collapses the packet
traversal's union-of-rows blowup (docs/PERF_NOTES.md §3/§8); dead lanes sort
to the end, compacting live work into fewer packets. Applying one permutation
to every state channel keeps paths intact — the estimator is untouched, rays
just execute in a different lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8
PACKET = 128
i32 = jnp.int32


def _partner(x, j, lane_axis, sub_axis):
    """Both roll directions for the XOR-j butterfly on array ``x``.

    Flat index = sublane*PACKET + lane. j must be a power of two < 1024.
    Returns (value-from-lane+j, value-from-lane-j).
    """
    if j < PACKET:
        fwd = pltpu.roll(x, (PACKET - j) % PACKET, lane_axis)
        bwd = pltpu.roll(x, j, lane_axis)
    else:
        sj = j // PACKET
        fwd = pltpu.roll(x, (SUBLANES - sj) % SUBLANES, sub_axis)
        bwd = pltpu.roll(x, sj, sub_axis)
    return fwd, bwd


def sort_tile_by_key(key, channels):
    """Sort the 1024 flat lanes of an (8,128) tile ascending by ``key``.

    Args:
      key: (8,128) int32 sort key.
      channels: list of (8,128) arrays (int32/uint32/float32) permuted
        alongside the key.

    Returns (sorted_key, sorted_channels) with original dtypes restored.
    """
    n = SUBLANES * PACKET
    lane = jax.lax.broadcasted_iota(i32, (SUBLANES, PACKET), 1)
    sub = jax.lax.broadcasted_iota(i32, (SUBLANES, PACKET), 0)

    dtypes = [c.dtype for c in channels]
    big = jnp.stack(
        [c if c.dtype == jnp.int32 else pltpu.bitcast(c, i32) for c in channels]
    )

    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            if j < PACKET:
                bit0 = (lane & j) == 0
            else:
                bit0 = (sub & (j // PACKET)) == 0
            kfwd, kbwd = _partner(key, j, 1, 0)
            pkey = jnp.where(bit0, kfwd, kbwd)
            # ascending if the k-bit of the flat index is 0
            if k < PACKET:
                ascending = (lane & k) == 0
            elif k < n:
                ascending = (sub & (k // PACKET)) == 0
            else:
                ascending = jnp.full((SUBLANES, PACKET), True)
            bigger = key > pkey
            equal = key == pkey
            # pair-consistent keep rule (equal keys must both-keep or
            # both-swap, else one value is duplicated and its partner lost)
            keep_self = (bit0 & ~bigger) | (~bit0 & (bigger | equal))
            # descending regions mirror the keep rule; bool select would hit
            # Mosaic's unsupported i8->i1 truncation, so use XOR
            swap = ascending ^ keep_self
            key = jnp.where(swap, pkey, key)
            bfwd, bbwd = _partner(big, j, 2, 1)
            pbig = jnp.where(bit0[None], bfwd, bbwd)
            big = jnp.where(swap[None], pbig, big)
            j //= 2
        k *= 2

    out = []
    for idx, dt in enumerate(dtypes):
        ch = big[idx]
        out.append(ch if dt == jnp.int32 else pltpu.bitcast(ch, dt))
    return key, out
