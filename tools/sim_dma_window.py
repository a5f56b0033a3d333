"""Host-side visit sim: h-row WINDOW DMA for the HBM-streamed walker
(round-4 cfg4b lever, VERDICT r3 item 7).

Today the HBM grouped walker (_traverse_hbm_grouped) issues one (1,128)
async copy per sublane cursor per iteration — 8 starts + 8 waits per
group-iteration, and every row visit pays that descriptor set. The
threaded walk's cursor is STRICTLY INCREASING (descend = cur+1, skip =
exit > cur), so a descriptor that copies rows [cur, cur+h) serves every
visit that lands inside the window for free (a VMEM scratch read): descend
chains (p(+1) ~ 0.5, PERF_NOTES §9) and multi-row leaf runs both stay
in-window.

This sim walks the real cfg4b table (405k-tri bigcbox, PACKED4) with
production-shaped cursor groups (8 sublane cursors x W lanes each, joint
lockstep) and counts, per window height h:

  rounds       DMA rounds (the descriptor-set cost D is per round)
  steps        lockstep inner steps (max over the 8 sublanes per round —
               a sublane whose window holds fewer visits idles masked);
               each step pays the compute cost C (scratch fetch + vote +
               prim test), same as today's per-iteration compute
  iters_now    today's cost basis: max over sublanes of visit count

and prices cost(h) = rounds*D + steps*C against cost_now = iters_now*(D+C)
for a grid of D/C ratios; the real D comes from
tools/chain_latency_probe.py's dma probe, C from the measured HBM
group-step cost (~636 ns, PERF_NOTES §9z) minus D.

Usage: python tools/sim_dma_window.py [scene.obj] [n_groups] [lanes_per_cursor]
"""

import os
import subprocess
import sys

import numpy as np

from hijiki_tpu.scene.compile import compile_scene
from hijiki_tpu.scene.obj import load_obj_scene

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sim_twolevel import M_EPS, Table, camera_rays, octant_base, slab, tri_test

SUBLANES = 8


def tbl_base(cs, p, d):
    return octant_base(p, d) if cs.mega_num_tables_static > 1 else 0


def walk_visits(p, o, d, tmin, base):
    """Union walk of one cursor over lanes (o, d): visited row indices."""
    inv_d = 1.0 / d
    best_t = np.full(o.shape[0], np.inf)
    cur = base
    end = base + p.R
    visits = []
    while cur < end:
        visits.append(cur)
        if p.is_prim[cur]:
            best_t = np.minimum(best_t, tri_test(p, cur, o, d, tmin))
            cur = p.exit[cur]
        else:
            if slab(p, cur, o, d, inv_d, best_t, tmin).any():
                cur += 1
            else:
                cur = p.exit[cur]
    return np.asarray(visits, np.int64), best_t


def window_rounds(seqs, h):
    """Joint lockstep window sim over the 8 sublane visit sequences.

    Returns (rounds, steps): every round each live sublane gets a fresh
    [cur, cur+h) window; the inner unrolled steps run to the MAX in-window
    visit count across sublanes (others idle masked)."""
    pos = [0] * len(seqs)  # next unconsumed visit per sublane
    rounds = 0
    steps = 0
    while any(pos[k] < len(seqs[k]) for k in range(len(seqs))):
        rounds += 1
        consumed = []
        for k, s in enumerate(seqs):
            if pos[k] >= len(s):
                consumed.append(0)
                continue
            w0 = s[pos[k]]
            n = 0
            while pos[k] + n < len(s) and s[pos[k] + n] < w0 + h:
                n += 1
            consumed.append(n)
        step = max(consumed)
        steps += step
        for k in range(len(seqs)):
            pos[k] += consumed[k]
    return rounds, steps


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bigcbox405.obj"
    n_groups = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 512  # P=1024, G=2
    if not os.path.exists(path) and "bigcbox405" in path:
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_bigscene.py"),
             "3", path],
            check=True,
        )
    scene = load_obj_scene(path)
    cs = compile_scene(scene, packed_leaf=4, shadow_vis_boxes=False)
    p = Table(cs)
    print(f"table: {p.R} rows/table x {cs.mega_num_tables_static} tables, "
          f"{int(p.is_prim.sum())} prim rows")
    W = H = 512
    rng = np.random.default_rng(0)
    HS = [1, 2, 4, 8]
    for gen in ("camera", "bounce"):
        tot = {h: [0, 0] for h in HS}
        tot_iters = 0
        tot_visits = 0
        for gi in range(n_groups):
            s0 = int(rng.integers(0, W * H - SUBLANES * lanes))
            seqs = []
            for k in range(SUBLANES):
                idx = np.arange(s0 + k * lanes, s0 + (k + 1) * lanes)
                px = (idx % W) + 0.5
                py = (idx // W) + 0.5
                o, d = camera_rays(cs, px, py, W, H)
                tmin = M_EPS
                if gen == "bounce":
                    _, bt = walk_visits(p, o, d, tmin, tbl_base(cs, p, d))
                    hit = np.isfinite(bt)
                    if hit.sum() < 8:
                        seqs.append(np.zeros(0, np.int64))
                        continue
                    o = o[hit] + bt[hit, None] * d[hit]
                    u1, u2 = rng.random(hit.sum()), rng.random(hit.sum())
                    r = np.sqrt(u1)
                    phi = 2 * np.pi * u2
                    d = np.stack(
                        [r * np.cos(phi), r * np.sin(phi), np.sqrt(1 - u1)],
                        -1,
                    )
                    d /= np.linalg.norm(d, axis=-1, keepdims=True)
                    o = o + 1e-4 * d
                vis, _ = walk_visits(p, o, d, tmin, tbl_base(cs, p, d))
                seqs.append(vis)
            tot_iters += max(len(s) for s in seqs)
            tot_visits += sum(len(s) for s in seqs)
            for h in HS:
                r, st = window_rounds(seqs, h)
                tot[h][0] += r
                tot[h][1] += st
        print(f"\n{gen}: iters_now={tot_iters} "
              f"(visits {tot_visits}, {n_groups} groups x 8 sublanes x "
              f"{lanes} lanes)")
        print("  h | rounds (vs iters) | steps (vs iters) | "
              "cost ratio at D/C = 0.25 / 0.5 / 1.0")
        for h in HS:
            r, st = tot[h]
            rr = r / tot_iters
            sr = st / tot_iters
            ratios = []
            for dc in (0.25, 0.5, 1.0):
                # cost_now = iters*(D+C); cost_h = rounds*D + steps*C
                now = tot_iters * (dc + 1.0)
                new = r * dc + st * 1.0
                ratios.append(now / new)
            print(f"  {h} | {r:8d} ({rr:4.2f}x) | {st:8d} ({sr:4.2f}x) | "
                  + " / ".join(f"{x:4.2f}x" for x in ratios))


if __name__ == "__main__":
    main()
