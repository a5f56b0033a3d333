"""Does the v5e VPU issue packed bf16 elementwise ops faster than f32?

If Mosaic packs bf16 two-sublanes-per-register and issues ALU ops on the
packed form, a bf16 slab test would halve the walker's dominant issue cost
(docs/PERF_NOTES.md §9j: the walk is ISSUE-bound at P=1024). If Mosaic
instead widens bf16 to f32 per op, bf16 LOSES (extra converts). This probe
settles it empirically before any kernel work.

Body: W independent multiply-add chains on (8, P) arrays of the probed
dtype inside a fori_loop; slope between two trip counts is the
per-iteration cost (dispatch cost cancels; PERF_NOTES §8/§9b discipline).
Independent chains measure ISSUE throughput, not op latency.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/vpu_dtype_probe.py [P] [chains]
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

SUBLANES = 8


def _slab_kernel(x_ref, row_ref, out_ref, *, iters, dtype):
    """Slab-test-shaped body: (8,1) col broadcasts, 6 FMA, 10 min/max,
    compares, boolean combine, select — the walker's descend-vote mix."""
    P = x_ref.shape[-1]
    dt = dtype
    inv_dx = x_ref[0].astype(dt)
    inv_dy = x_ref[1].astype(dt)
    inv_dz = x_ref[2].astype(dt)
    tox = x_ref[3].astype(dt)
    toy = x_ref[4].astype(dt)
    toz = x_ref[5].astype(dt)
    f32c = lambda v: jnp.asarray(v, jnp.float32)

    def body(i, c):
        acc, best_t = c
        col = lambda j: jnp.broadcast_to(
            row_ref[:, j : j + 1].astype(dt), (SUBLANES, P)
        )
        ax = col(0) * inv_dx + tox
        bx = col(3) * inv_dx + tox
        ay = col(1) * inv_dy + toy
        by = col(4) * inv_dy + toy
        az = col(2) * inv_dz + toz
        bz = col(5) * inv_dz + toz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
            jnp.minimum(az, bz),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
            jnp.maximum(az, bz),
        )
        # predicates/selects stay f32 (bf16 i1 masks hit Mosaic relayout
        # walls); only the broadcast+FMA+min/max chain runs in dt
        t0f = t0.astype(jnp.float32)
        t1f = t1.astype(jnp.float32)
        slab = (t0f < t1f + f32c(1e-4)) & (t0f < best_t) & (t1f > f32c(1e-4))
        vote = jnp.any(slab, axis=1, keepdims=True)
        best_t = jnp.where(slab, best_t * f32c(0.9999), best_t)
        acc = acc + jnp.where(vote, f32c(1.0), f32c(0.0))
        return acc, best_t

    # lane-varying carry inits (splat-init carries hit Mosaic's one-pass
    # relayout inference when the body makes them lane-varying)
    acc0 = (x_ref[0] * f32c(0.0))[:, :1]
    bt0 = x_ref[0] * f32c(0.0) + f32c(1e6)
    acc, bt = jax.lax.fori_loop(0, iters, body, (acc0, bt0))
    out_ref[...] = (
        jnp.broadcast_to(acc, (SUBLANES, P)) + bt.astype(jnp.float32)
    )


def make_slab_fn(P, dtype, iters):
    call = pl.pallas_call(
        functools.partial(_slab_kernel, iters=iters, dtype=dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUBLANES, P), jnp.float32),
    )
    return jax.jit(lambda x, row: jnp.sum(call(x, row)))


def _kernel(x_ref, out_ref, *, iters, chains, dtype):
    xs = [x_ref[k] for k in range(chains)]
    c1 = jnp.asarray(1.0009765625, dtype)  # exactly representable in bf16
    c2 = jnp.asarray(0.9990234375, dtype)

    def body(i, c):
        # chains independent a*c+b-style ops per iteration (2 ops/chain)
        return tuple(
            (x * c1 + jnp.asarray(0.125, dtype)) * c2 for x in c
        )

    final = jax.lax.fori_loop(0, iters, body, tuple(xs))
    acc = final[0].astype(jnp.float32)
    for x in final[1:]:
        acc = acc + x.astype(jnp.float32)
    out_ref[...] = acc


def make_fn(P, chains, dtype, iters):
    """Stable compiled callable (rebuilding pallas_call per call defeats the
    executable cache and times re-dispatch, not the kernel)."""
    call = pl.pallas_call(
        functools.partial(_kernel, iters=iters, chains=chains, dtype=dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUBLANES, P), jnp.float32),
    )
    return jax.jit(lambda x: jnp.sum(call(x)))


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    chains = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters_lo, iters_hi = 400000, 1200000
    reps = 5
    print(f"devices: {jax.devices()}  P={P} chains={chains}", file=sys.stderr)

    import os

    dtypes = [jnp.float32, jnp.bfloat16]
    fns = {}
    xs = {}
    if os.environ.get("SKIP_EW"):
        dtypes_ew = []
    else:
        dtypes_ew = dtypes
    for dt in dtypes_ew:
        xs[dt] = jnp.asarray(
            np.random.default_rng(0).uniform(0.5, 1.0, (chains, SUBLANES, P)),
            dt,
        )
        for it in (iters_lo, iters_hi):
            fns[(dt, it)] = make_fn(P, chains, dt, it)
            t0 = time.monotonic()
            s = float(fns[(dt, it)](xs[dt]))
            print(
                f"compile {jnp.dtype(dt).name}@{it}: {time.monotonic()-t0:.1f}s"
                f" (sum {s:.3e})",
                file=sys.stderr,
            )

    times = {(dt, it): [] for dt in dtypes_ew for it in (iters_lo, iters_hi)}
    for rep in range(reps):
        for dt in dtypes_ew:
            for it in (iters_lo, iters_hi):
                t0 = time.monotonic()
                float(fns[(dt, it)](xs[dt]))
                times[(dt, it)].append(time.monotonic() - t0)

    for dt in dtypes_ew:
        lo = min(times[(dt, iters_lo)])
        hi = min(times[(dt, iters_hi)])
        ns = (hi - lo) / (iters_hi - iters_lo) * 1e9
        per_op = ns / (2 * chains)
        print(
            f"{jnp.dtype(dt).name:9s} lo {lo*1e3:7.1f} ms  hi {hi*1e3:7.1f} ms"
            f"  slope {ns:7.1f} ns/iter  ({per_op:.2f} ns per vector op)"
        )

    # slab-shaped body
    s_lo, s_hi = iters_lo // 4, iters_hi // 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0.5, 1.5, (6, SUBLANES, P)), jnp.float32)
    row = jnp.asarray(rng.uniform(-1, 1, (SUBLANES, 32)), jnp.float32)
    sfns = {}
    for dt in dtypes:
        for it in (s_lo, s_hi):
            sfns[(dt, it)] = make_slab_fn(P, dt, it)
            t0 = time.monotonic()
            s = float(sfns[(dt, it)](x, row))
            print(
                f"compile slab {jnp.dtype(dt).name}@{it}: "
                f"{time.monotonic()-t0:.1f}s (sum {s:.3e})",
                file=sys.stderr,
            )
    stimes = {k: [] for k in sfns}
    for rep in range(reps):
        for k, fn in sfns.items():
            t0 = time.monotonic()
            float(fn(x, row))
            stimes[k].append(time.monotonic() - t0)
    for dt in dtypes:
        lo = min(stimes[(dt, s_lo)])
        hi = min(stimes[(dt, s_hi)])
        ns = (hi - lo) / (s_hi - s_lo) * 1e9
        print(
            f"slab {jnp.dtype(dt).name:9s} lo {lo*1e3:7.1f} ms  "
            f"hi {hi*1e3:7.1f} ms  slope {ns:7.1f} ns/iter"
        )


if __name__ == "__main__":
    main()
