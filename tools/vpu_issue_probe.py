"""Independent corroboration of the walker's issue-bound cost model
(VERDICT r2 item 6): a Pallas micro-kernel whose loop body is K pure
vector ops on an (8, 1024) f32 block (= 8 VREGs on the v5e's 8x128 VPU),
with NO memory traffic in the loop — timing it against K and the iteration
count measures the VPU's sustained VREG-ops/cycle directly.

The cost model under test (PERF_NOTES §9j/§9s, BASELINE.md speed-of-light):
the measured 333 ns walker iteration is issue-bound at ~75 vector ops x
8 VREGs / ~2.9 issue/cycle. If that is right, this probe's per-VREG-op
slope should come out near 1 / (2.9 issue/cycle x ~0.94 GHz) ~ 0.37 ns —
i.e. ~600 VREG-ops of the walker body ~ 220 ns, the rest being its
partially-hidden fetch + vote terms. If the probe instead measures, say,
1 op/cycle, the walker is NOT near its issue floor and per-chip structure
work should reopen.

Ops are a walker-like mix (fma-ish mul+add, min, compare+select) arranged
as 4 independent chains so the issue window is never dependency-starved.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/vpu_issue_probe.py
"""

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


def make_kernel(iters: int, k_rounds: int):
    """k_rounds rounds x 16 VREG-wide vector ops per round, iters times."""

    def kernel(x_ref, o_ref):
        a = x_ref[...]
        b = a * 1.0001 + 0.25
        c = a * 0.9999 - 0.125
        d = a + 0.5

        def body(i, carry):
            a, b, c, d = carry
            f = i.astype(jnp.float32) * 1e-9
            for _ in range(k_rounds):
                # 16 vector ops per round, 4 independent chains of 4
                a = a * 1.000001 + f          # 2 (mul, add)
                b = jnp.minimum(b + 0.75, a)   # 2 (add, min)
                c = jnp.where(c > a, c * 0.5, c + 0.125)  # 3 (cmp, mul~select fold, add)
                d = d + c * 0.000001           # 2 (mul, add)
                a = jnp.maximum(a, 0.0)        # 1
                b = b * 0.999999               # 1
                c = jnp.abs(c - b)             # 2 (sub, abs)
                d = jnp.minimum(d, 8192.0)     # 1
                # ~14 VPU ops x 8 VREGs per round (count conservatively)
            return a, b, c, d

        a, b, c, d = jax.lax.fori_loop(0, iters, body, (a, b, c, d))
        o_ref[...] = a + b + c + d

    return kernel


OPS_PER_ROUND = 14  # conservative static count of the body above


def run(iters, k_rounds, x):
    f = pl.pallas_call(
        make_kernel(iters, k_rounds),
        out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.float32),
    )
    # default VMEM block specs: one (8,1024) operand, loaded once before
    # the loop — the fori_loop body itself touches no memory

    def timed():
        t0 = time.monotonic()
        r = f(x)
        s = float(jnp.sum(r))  # host read = real sync on this stack
        return time.monotonic() - t0, s

    timed()  # compile
    best = min(timed()[0] for _ in range(5))
    return best


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    x = jnp.asarray(np.random.default_rng(0).random((8, 1024), np.float32))

    # two iteration counts per K: the difference cancels fixed launch cost
    ks = (2, 4, 8, 16)
    for a in sys.argv[1:]:
        if a.startswith("--ks="):
            ks = tuple(int(x) for x in a.split("=", 1)[1].split(","))
    rows = []
    for k_rounds in ks:
        t_lo = run(200_000, k_rounds, x)
        t_hi = run(400_000, k_rounds, x)
        per_iter = (t_hi - t_lo) / 200_000
        vreg_ops = OPS_PER_ROUND * k_rounds * 8  # 8 VREGs per (8,1024) op
        ns_per_vreg_op = per_iter * 1e9 / vreg_ops
        rows.append((k_rounds, per_iter * 1e9, ns_per_vreg_op))
        print(
            f"K={k_rounds:2d} rounds ({vreg_ops:4d} VREG-ops/iter): "
            f"{per_iter * 1e9:8.1f} ns/iter  {ns_per_vreg_op:.3f} ns/VREG-op",
            file=sys.stderr,
            flush=True,
        )

    # marginal cost between the two largest K cancels per-iteration loop
    # overhead: the asymptotic ns/VREG-op
    (k_a, t_a, _), (k_b, t_b, _) = rows[-2], rows[-1]
    ns = (t_b - t_a) / (OPS_PER_ROUND * (k_b - k_a) * 8)
    clock_ghz = 0.94  # v5e nominal
    issues_per_cycle = 1.0 / (ns * clock_ghz)
    print(
        f"marginal: {ns:.3f} ns/VREG-op ~ {issues_per_cycle:.2f} VREG-ops/cycle "
        f"@ {clock_ghz} GHz (cost model claimed ~2.9; walker body = ~600 "
        f"VREG-ops -> {600 * ns:.0f} ns of its measured 333 ns/iter)"
    )


if __name__ == "__main__":
    main()
