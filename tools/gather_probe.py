"""Per-lane gather feasibility probe (round-3 two-level-walk groundwork).

ROADMAP: a per-lane (gather-based) top-of-tree walk is the main remaining
single-chip lever (packet unions cost ~4.6x on incoherent bounces), bounded
by Mosaic's constraint that a dynamic per-lane gather only lowers within one
(8,128) tile. This probe measures, in a fixed-trip kernel (slope timing per
PERF_NOTES §8b):

  v1  take_along_axis within a single (8,128) f32 table (the one supported
      shape) — per-lane node fetch for a <=1024-entry table channel
  v2  the same via K stacked tiles + select (tables up to K*1024 entries)
  v3  baseline: the same loop with the gather replaced by a constant read

Cost per gathered channel decides the two-level design's budget: a per-lane
interior walk needs ~8 channels/step (aabb 6 + exit + kind).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/gather_probe.py
       [iters] [K]
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

f32 = jnp.float32


def _kernel(tbl_ref, idx_ref, out_ref, *, iters, mode, K):
    idx0 = idx_ref[...]  # (8,128) i32 in [0, K*1024)
    tbl = tbl_ref[...]  # (K, 8, 128) f32: channel data, 1024 entries per tile

    def body(i, c):
        # data-dependent per-lane index chain: idx -> gathered value -> idx
        idx = c["idx"]
        if mode == "const":
            v = tbl[0, 0, 0] + idx.astype(f32)
        elif mode == "gather1":
            # single-tile gather: row-major entry id e = r*128 + l lives at
            # [e // 128, e % 128]; take_along_axis along lanes after a
            # sublane roll... use the supported within-tile form:
            flat = idx & 1023
            r = flat // 128
            l = flat % 128
            # gather along sublanes then lanes via one take_along_axis each
            g1 = jnp.take_along_axis(tbl[0], r, axis=0)  # (8,128)? r is (8,128)
            v = jnp.take_along_axis(g1, l, axis=1)
        else:  # gatherK
            flat = idx & 1023
            r = flat // 128
            l = flat % 128
            tile = (idx >> 10) & (K - 1)
            v = jnp.zeros(idx.shape, f32)
            for k in range(K):
                gk = jnp.take_along_axis(tbl[k], r, axis=0)
                gk = jnp.take_along_axis(gk, l, axis=1)
                v = jnp.where(tile == k, gk, v)
        nxt = (idx + v.astype(jnp.int32) + i) & (K * 1024 - 1)
        return dict(idx=nxt, acc=c["acc"] + v)

    final = jax.lax.fori_loop(
        0, iters, body, dict(idx=idx0, acc=jnp.zeros(idx0.shape, f32))
    )
    out_ref[0] = final["acc"]
    out_ref[1] = final["idx"].astype(f32)


def build(iters, mode, K):
    """One pallas_call callable per (iters, mode, K) — rebuilt partials
    defeat the executable cache and time COMPILES instead of runs
    (measured: negative slopes, PERF_NOTES §8b symptom)."""
    return pl.pallas_call(
        functools.partial(_kernel, iters=iters, mode=mode, K=K),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 8, 128), f32),
    )


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(1, 7, (K, 8, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, K * 1024, (8, 128)).astype(np.int32))

    for mode in ("const", "gather1", "gatherK"):
        try:
            fns = {it: build(it, mode, K) for it in (iters, iters * 3)}
            lo = hi = None
            for it, fn in fns.items():
                t_best = 1e9
                float(jnp.sum(fn(tbl, idx)))  # compile+warm
                for _ in range(5):
                    t0 = time.monotonic()
                    float(jnp.sum(fn(tbl, idx)))
                    t_best = min(t_best, time.monotonic() - t0)
                if it == iters:
                    lo = t_best
                else:
                    hi = t_best
            slope = (hi - lo) / (iters * 2) * 1e9
            print(f"{mode:8s} slope {slope:7.2f} ns/iter (lo {lo*1e3:.1f} ms hi {hi*1e3:.1f} ms)")
        except Exception as e:
            print(f"{mode:8s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
