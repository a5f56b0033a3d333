"""Measure the walker's serial-chain term latencies on-chip (round-4,
VERDICT r3 item 3): the round-3 vpu_issue_probe corrected the cost model to
LATENCY-bound (~0.20 ns/VREG-op marginal issue means the walker's ~600
VREG-ops explain only ~120 ns of its 333 ns/iter), so the per-chip floor
must be re-derived from the latencies of the actual dependency chain

    carried vote -> cursor select -> row fetch -> slab test -> vote

op class by op class, each measured with the same slope method as
tools/vpu_issue_probe.py (two loop trip counts cancel launch cost; host
idle per PERF_NOTES §8b). The probes:

  alu    dependent ALU chain (1 chain, every op feeds the next): ns/op
         latency of a VPU op, vs the 0.20 ns issue marginal.
  vote   cross-lane (8,W)->(8,1) any() + broadcast back into the next
         iteration's lane math — the walker's descend-vote recurrence —
         at W in {128, 256, 512, 1024}.
  fetch  (a) independent-address 8-slice row fetch (cursor advances by
         carried arithmetic, fetched data feeds only an accumulator):
         fetch ISSUE cost with latency overlapped across iterations;
         (b) pointer-chase (next cursor = a column of the fetched row,
         exactly the walker's exit pointer): issue + EXPOSED latency;
         (c) like (a) but fetching (2,ncols) per sublane slice: does
         doubling bytes-per-slice cost anything?
  chain  the assembled walker-shaped recurrence (fetch -> slab ALU ->
         vote -> select -> fetch) with NO primitive-test filler: the
         empty-chain floor a grouped walker body interleaves against.

Each probe prints ns/iter; the budget table is assembled in
docs/PERF_NOTES.md §9aa and BASELINE.md's speed-of-light section.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/chain_latency_probe.py [alu|vote|fetch|chain|all]
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

SUBLANES = 8


def _timed(f, *args):
    def once():
        t0 = time.monotonic()
        r = f(*args)
        float(jnp.sum(r))  # host read = real sync on this stack
        return time.monotonic() - t0

    once()  # compile
    return min(once() for _ in range(5))


# Two-phase execution: tunnel compiles run ~1-3 min per kernel and don't
# need an idle host, while the timings themselves are milliseconds and DO
# (PERF_NOTES §8b). Probes therefore REGISTER (label, fn, args, lo, hi)
# rows; main() compiles everything first (background CPU load fine), then
# pauses the process named by $ORACLE_PID (SIGSTOP) for the short timing
# phase and resumes it after.
_PENDING = []


def slope(make, lo=100_000, hi=300_000, label="", report=None, **kw):
    f_lo, args_lo = make(lo, **kw)
    f_hi, args_hi = make(hi, **kw)
    _PENDING.append((label, f_lo, args_lo, f_hi, args_hi, lo, hi, report))


def _run_pending():
    import os
    import signal

    for label, f_lo, args_lo, f_hi, args_hi, lo, hi, report in _PENDING:
        print(f"compiling {label} ...", file=sys.stderr, flush=True)
        _timed_once(f_lo, *args_lo)
        _timed_once(f_hi, *args_hi)
    pid = os.environ.get("ORACLE_PID")
    if pid:
        os.kill(int(pid), signal.SIGSTOP)
        print(f"paused pid {pid} for timing", file=sys.stderr, flush=True)
    try:
        for label, f_lo, args_lo, f_hi, args_hi, lo, hi, report in _PENDING:
            t_lo = _timed(f_lo, *args_lo)
            t_hi = _timed(f_hi, *args_hi)
            ns = (t_hi - t_lo) / (hi - lo) * 1e9
            print(report(ns) if report else f"{label}: {ns:7.1f} ns/iter",
                  flush=True)
    finally:
        if pid:
            os.kill(int(pid), signal.SIGCONT)
            print(f"resumed pid {pid}", file=sys.stderr, flush=True)
    _PENDING.clear()


def _timed_once(f, *args):
    r = f(*args)
    float(jnp.sum(r))


# ---------------------------------------------------------------------------
# alu: one dependent chain, K ops per iteration
# ---------------------------------------------------------------------------


def make_alu(iters, k_ops=16, width=1024):
    def kernel(x_ref, o_ref):
        a = x_ref[...]

        def body(i, a):
            f = i.astype(jnp.float32) * 1e-12
            for j in range(k_ops // 2):
                # 2 dependent ops per round (mul feeds add feeds next mul)
                a = a * jnp.float32(1.000001) + f
            return a

        o_ref[...] = jax.lax.fori_loop(0, iters, body, a)

    f = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((SUBLANES, width), jnp.float32)
    )
    x = jnp.asarray(np.random.default_rng(0).random((SUBLANES, width), np.float32))
    return f, (x,)


def probe_alu():
    for k in (8, 16, 32):
        slope(
            make_alu, k_ops=k, label=f"alu k={k}",
            report=lambda ns, k=k: (
                f"alu   dependent chain k={k:2d}: {ns:7.1f} ns/iter  "
                f"{ns / k:.2f} ns/op latency"
            ),
        )


# ---------------------------------------------------------------------------
# vote: (8,W) compare -> any -> (8,1) -> broadcast back (the descend-vote
# recurrence)
# ---------------------------------------------------------------------------


def make_vote(iters, width=1024):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        v0 = jnp.zeros((SUBLANES, 1), jnp.float32)

        def body(i, v):
            f = i.astype(jnp.float32) * 1e-9
            # broadcast the carried (8,1) vote into lane math (1 op), then
            # reduce back: the chain is bcast -> mul -> cmp -> any
            y = x * (v + jnp.float32(1.0)) + f
            s = jnp.any(y > jnp.float32(0.5), axis=1, keepdims=True)
            return jnp.where(s, v * jnp.float32(0.5), v + jnp.float32(0.25))

        v = jax.lax.fori_loop(0, iters, body, v0)
        o_ref[...] = jnp.broadcast_to(v, x.shape) + x

    f = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((SUBLANES, width), jnp.float32)
    )
    x = jnp.asarray(
        np.random.default_rng(0).random((SUBLANES, width), np.float32) * 0.4
    )
    return f, (x,)


def probe_vote():
    for w in (128, 256, 512, 1024):
        slope(
            make_vote, width=w, label=f"vote W={w}",
            report=lambda ns, w=w: (
                f"vote  W={w:4d}: {ns:7.1f} ns/iter (bcast+mul+cmp+any chain)"
            ),
        )


# ---------------------------------------------------------------------------
# fetch: 8 dynamic slices from a VMEM table
# ---------------------------------------------------------------------------


def make_fetch(iters, mode="indep", rows=4096, ncols=128, height=1):
    """mode: indep (carried-arith addresses), chase (address = fetched col)."""

    def kernel(tbl_ref, o_ref):
        cur0 = jnp.arange(SUBLANES, dtype=jnp.int32).reshape(SUBLANES, 1) * 7
        acc0 = jnp.zeros((SUBLANES, ncols), jnp.float32)

        def fetch(cur):
            return jnp.concatenate(
                [
                    tbl_ref[
                        pl.ds(
                            jnp.minimum(cur[k, 0], rows - height), height
                        ),
                        :,
                    ]
                    for k in range(SUBLANES)
                ],
                axis=0,
            )

        def body(i, c):
            cur, acc = c
            r = fetch(cur)  # (8*height, ncols)
            acc = acc + r[:SUBLANES, :]
            if mode == "chase":
                # next address = column 10 of the fetched row (the exit
                # pointer pattern): fetch latency lands on the chain
                cur_n = r[:SUBLANES, 10:11].astype(jnp.int32)
            else:
                # carried arithmetic: next fetch's address never waits on
                # the current fetch's data
                cur_n = jnp.where(
                    cur + 131 < rows, cur + 131, cur - (rows - 131)
                )
            return cur_n, acc

        cur, acc = jax.lax.fori_loop(0, iters, body, (cur0, acc0))
        o_ref[...] = acc + cur.astype(jnp.float32)

    f = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((SUBLANES, ncols), jnp.float32)
    )
    rng = np.random.default_rng(0)
    tbl = rng.random((rows, ncols), np.float32)
    # col 10 = a valid next row index (uniform walk over the table)
    tbl[:, 10] = rng.integers(0, rows - 2, rows).astype(np.float32)
    return f, (jnp.asarray(tbl),)


def probe_fetch():
    for mode, height in (("indep", 1), ("indep", 2), ("chase", 1)):
        slope(
            make_fetch, lo=50_000, hi=150_000, mode=mode, height=height,
            label=f"fetch {mode} h={height}",
            report=lambda ns, mode=mode, height=height: (
                f"fetch mode={mode:5s} h={height}: {ns:7.1f} ns/iter "
                f"(8 slices of ({height},128))"
            ),
        )


# ---------------------------------------------------------------------------
# chain: the walker-shaped recurrence without primitive-test filler
# ---------------------------------------------------------------------------


def make_chain(iters, width=1024, rows=4096, ncols=128):
    """fetch -> slab-ish ALU -> cross-lane vote -> cursor select -> fetch:
    the full recurrence of _traverse_spec_grouped's per-group chain, with
    the off-chain primitive test removed. Its ns/iter is the empty-chain
    floor a G-group body interleaves against."""

    def kernel(tbl_ref, x_ref, o_ref):
        x = x_ref[...]
        cur0 = jnp.arange(SUBLANES, dtype=jnp.int32).reshape(SUBLANES, 1) * 5
        desc0 = jnp.zeros((SUBLANES, 1), jnp.float32)

        def fetch(cur):
            return jnp.concatenate(
                [
                    tbl_ref[pl.ds(jnp.minimum(cur[k, 0], rows - 1), 1), :]
                    for k in range(SUBLANES)
                ],
                axis=0,
            )

        def body(i, c):
            cur, desc, rows8, acc = c
            # cursor decision from carries (walker pass 1)
            nexit = rows8[:, 10:11].astype(jnp.int32)
            take_exit = desc < jnp.float32(0.5)
            cur_n = jnp.where(take_exit, nexit, cur + 1)
            cur_n = jnp.where(cur_n < rows, cur_n, cur_n - rows)
            rows_n = fetch(cur_n)
            # slab-ish vote on the fetched row (walker pass 2): 6 bcast
            # cols, min/max tree, compare, cross-lane any
            col = lambda j: jnp.broadcast_to(rows_n[:, j : j + 1], x.shape)
            ax, bx = col(0) * x, col(3) * x
            ay, by = col(1) * x, col(4) * x
            az, bz = col(2) * x, col(5) * x
            t0 = jnp.maximum(
                jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
                jnp.minimum(az, bz),
            )
            t1 = jnp.minimum(
                jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
                jnp.maximum(az, bz),
            )
            vote = jnp.any(t0 < t1, axis=1, keepdims=True)
            desc_n = jnp.where(vote, jnp.float32(1.0), jnp.float32(0.0))
            return cur_n, desc_n, rows_n, acc + t0[:, :1]

        cur0_r = fetch(cur0)
        acc0 = jnp.zeros((SUBLANES, 1), jnp.float32)
        cur, desc, r8, acc = jax.lax.fori_loop(
            0, iters, body, (cur0, desc0, cur0_r, acc0)
        )
        o_ref[...] = x + acc + cur.astype(jnp.float32)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SUBLANES, width), jnp.float32),
    )
    rng = np.random.default_rng(0)
    tbl = rng.random((rows, ncols), np.float32)
    tbl[:, 10] = rng.integers(0, rows - 1, rows).astype(np.float32)
    x = rng.random((SUBLANES, width), np.float32) + 0.5
    return f, (jnp.asarray(tbl), jnp.asarray(x))


# ---------------------------------------------------------------------------
# dma: HBM->VMEM async-copy descriptor cost (the HBM walker's per-iteration
# "slot overhead": 8 starts + 8 waits per cursor group)
# ---------------------------------------------------------------------------


def make_dma_multi(iters, nchains=2, rows=65536, ncols=128, spec=False):
    """G independent pointer-chase DMA chains interleaved (the grouped HBM
    walker's overlap structure): per-SET cost when other chains' sets are in
    flight. spec=True: dual-candidate prefetch — as soon as a chain's row
    lands, BOTH next-cursor candidates (exit column and cur+1) are started
    into two slots, so the next copy is never gated on the vote; the reader
    selects the slot by the emulated vote bit (row parity)."""
    from jax.experimental.pallas import tpu as pltpu

    nslot = 2 if spec else 1

    def kernel(tbl_ref, o_ref, scratch, sems):
        cur0 = [
            jnp.full((SUBLANES, 1), 97 * (g + 1), jnp.int32)
            for g in range(nchains)
        ]

        def start(g, s, cur):
            for k in range(SUBLANES):
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(jnp.minimum(cur[k, 0], rows - 1), 1), :],
                    scratch.at[pl.ds(((g * nslot + s) * SUBLANES + k), 1), :],
                    sems.at[(g * nslot + s) * SUBLANES + k],
                ).start()

        def wait(g, s, cur):
            for k in range(SUBLANES):
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(jnp.minimum(cur[k, 0], rows - 1), 1), :],
                    scratch.at[pl.ds(((g * nslot + s) * SUBLANES + k), 1), :],
                    sems.at[(g * nslot + s) * SUBLANES + k],
                ).wait()

        def body(i, c):
            curs, accs = c
            ncurs, naccs = [], []
            for g in range(nchains):
                cur = curs[g]
                if spec:
                    # both slots were started last iteration for candidates
                    # (chase, cur+1); drain both, pick by the vote bit
                    wait(g, 0, cur)
                    wait(g, 1, cur)
                    r0 = scratch[(g * 2) * SUBLANES : (g * 2 + 1) * SUBLANES, :]
                    r1 = scratch[(g * 2 + 1) * SUBLANES : (g * 2 + 2) * SUBLANES, :]
                    vote = (r0[:, :1].astype(jnp.int32) & 1) > 0  # emulated
                    r = jnp.where(vote, r1, r0)
                    chase = r[:SUBLANES, 10:11].astype(jnp.int32)
                    # candidates known straight from the fetched row — the
                    # next copies start BEFORE any vote-shaped math
                    start(g, 0, chase)
                    start(g, 1, jnp.where(chase + 1 < rows, chase + 1, 0))
                    acc = accs[g] + r[:SUBLANES, :1]
                    ncurs.append(chase)
                else:
                    wait(g, 0, cur)
                    r = scratch[g * SUBLANES : (g + 1) * SUBLANES, :]
                    acc = accs[g] + r[:SUBLANES, :1]
                    chase = r[:SUBLANES, 10:11].astype(jnp.int32)
                    start(g, 0, chase)
                    ncurs.append(chase)
                naccs.append(acc)
            return ncurs, naccs

        for g in range(nchains):
            start(g, 0, cur0[g])
            if spec:
                start(g, 1, cur0[g])
        curs, accs = jax.lax.fori_loop(
            0, iters, body,
            (cur0, [jnp.zeros((SUBLANES, 1), jnp.float32)] * nchains),
        )
        for g in range(nchains):
            wait(g, 0, curs[g])
            if spec:
                wait(g, 1, curs[g])
        tot = accs[0]
        for g in range(1, nchains):
            tot = tot + accs[g]
        o_ref[...] = jnp.broadcast_to(
            tot + curs[0].astype(jnp.float32), o_ref.shape
        )

    from jax.experimental.pallas import tpu as _pt

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=jax.ShapeDtypeStruct((SUBLANES, 128), jnp.float32),
        scratch_shapes=[
            _pt.VMEM((nchains * nslot * SUBLANES, ncols), jnp.float32),
            _pt.SemaphoreType.DMA((nchains * nslot * SUBLANES,)),
        ],
    )
    rng = np.random.default_rng(0)
    tbl = rng.random((rows, ncols), np.float32)
    tbl[:, 10] = rng.integers(0, rows - 2, rows).astype(np.float32)
    return f, (jnp.asarray(tbl),)


def make_dma(iters, mode="indep", rows=65536, ncols=128, height=1):
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tbl_ref, o_ref, scratch, sems):
        cur0 = jnp.arange(SUBLANES, dtype=jnp.int32).reshape(SUBLANES, 1) * 97
        # sharedsem*: all 8 copies signal ONE semaphore; the wait is a single
        # descriptor for the total byte count (an (8h, W) copy object on the
        # same semaphore — only sem + size matter to a wait). noclamp: the
        # carried cursor is kept in-bounds by construction, so the 8x2
        # scalar min ops vanish from BOTH start and wait. dedup: the
        # all-equal fast path — 1 start + 1 wait + sublane broadcast.
        shared = mode.startswith("sharedsem") or mode == "dedup"
        clamp = "noclamp" not in mode and mode != "dedup"

        def src(cur, k):
            idx = cur[k, 0]
            if clamp:
                idx = jnp.minimum(idx, rows - height)
            return tbl_ref.at[pl.ds(idx, height), :]

        def start(cur):
            if mode == "dedup":
                pltpu.make_async_copy(
                    src(cur, 0), scratch.at[pl.ds(0, height), :], sems.at[0]
                ).start()
                return
            for k in range(SUBLANES):
                pltpu.make_async_copy(
                    src(cur, k),
                    scratch.at[pl.ds(k * height, height), :],
                    sems.at[0 if shared else k],
                ).start()

        def wait(cur):
            if mode == "dedup":
                pltpu.make_async_copy(
                    src(cur, 0), scratch.at[pl.ds(0, height), :], sems.at[0]
                ).wait()
                return
            if shared:
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(0, SUBLANES * height), :],
                    scratch.at[pl.ds(0, SUBLANES * height), :],
                    sems.at[0],
                ).wait()
                return
            for k in range(SUBLANES):
                pltpu.make_async_copy(
                    src(cur, k),
                    scratch.at[pl.ds(k * height, height), :],
                    sems.at[k],
                ).wait()

        def body(i, c):
            cur, acc = c
            wait(cur)
            r = scratch[...]
            if mode == "dedup":
                r = jnp.broadcast_to(scratch[0:1, :], (SUBLANES * height, ncols))
            acc = acc + r[:SUBLANES, :1]
            if mode == "chase":
                cur_n = r[:SUBLANES, 10:11].astype(jnp.int32)
            else:
                cur_n = jnp.where(
                    cur + 997 < rows, cur + 997, cur - (rows - 997)
                )
            start(cur_n)
            return cur_n, acc

        start(cur0)
        cur, acc = jax.lax.fori_loop(
            0, iters, body, (cur0, jnp.zeros((SUBLANES, 1), jnp.float32))
        )
        wait(cur)
        o_ref[...] = jnp.broadcast_to(acc + cur.astype(jnp.float32), o_ref.shape)

    from jax.experimental.pallas import tpu as _pt

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=jax.ShapeDtypeStruct((SUBLANES, 128), jnp.float32),
        scratch_shapes=[
            _pt.VMEM((SUBLANES * height, ncols), jnp.float32),
            _pt.SemaphoreType.DMA((SUBLANES,)),
        ],
    )
    rng = np.random.default_rng(0)
    tbl = rng.random((rows, ncols), np.float32)
    tbl[:, 10] = rng.integers(0, rows - height, rows).astype(np.float32)
    return f, (jnp.asarray(tbl),)


def probe_dma():
    for mode, height in (
        ("indep", 1),
        ("indep", 2),
        ("indep", 4),
        ("chase", 1),
        ("sharedsem", 1),
        ("sharedsem+noclamp", 1),
        ("dedup", 1),
    ):
        slope(
            make_dma, lo=20_000, hi=60_000, mode=mode, height=height,
            label=f"dma {mode} h={height}",
            report=lambda ns, mode=mode, height=height: (
                f"dma   mode={mode:5s} h={height}: {ns:7.1f} ns/iter "
                f"(8 HBM->VMEM copies of ({height},128), start+wait)"
            ),
        )


def probe_dma_multi():
    for nchains, spec in ((1, False), (2, False), (4, False), (1, True), (2, True)):
        slope(
            make_dma_multi, lo=20_000, hi=60_000, nchains=nchains, spec=spec,
            label=f"dmaG G={nchains} spec={spec}",
            report=lambda ns, n=nchains, s=spec: (
                f"dmaG  G={n} spec={int(s)}: {ns / n:7.1f} ns/set "
                f"({ns:7.1f} ns/iter; pointer-chase, "
                f"{'2x8' if s else '8'} copies/set)"
            ),
        )


def probe_chain():
    for w in (256, 1024):
        slope(
            make_chain, lo=50_000, hi=150_000, width=w,
            label=f"chain W={w}",
            report=lambda ns, w=w: (
                f"chain W={w:4d}: {ns:7.1f} ns/iter "
                "(fetch->slab->vote->select recurrence, no prim test)"
            ),
        )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", file=sys.stderr)
    if which in ("alu", "all"):
        probe_alu()
    if which in ("vote", "all"):
        probe_vote()
    if which in ("fetch", "all"):
        probe_fetch()
    if which in ("dma", "all"):
        probe_dma()
    if which in ("dmag", "all"):
        probe_dma_multi()
    if which in ("chain", "all"):
        probe_chain()
    _run_pending()


if __name__ == "__main__":
    main()
