"""Host-side visit sim: VMEM top-of-tree cache for HBM-streamed tables.

The HBM walker is DMA-latency-bound (~1 us/row vs 333 ns in VMEM). Preorder
trace tables put the top of the tree at LOW row indices, so a hybrid walker
could serve rows with index < K from a VMEM-resident copy of the table's
first K rows (one dynamic-slice fetch) and DMA the rest. The win is bounded
by the fraction of row VISITS that land below K. This sim walks real
bigcbox camera/bounce packets and reports that fraction for VMEM-budget-
sized K (per octant table when octants are on; bigcbox HBM mode uses a
single table — want_octants skips HBM scenes).

Usage: python tools/sim_hbm_topcache.py [scene.obj] [n_walks] [lanes]
"""

import os
import subprocess
import sys

import numpy as np

from hijiki_tpu.scene.compile import compile_scene
from hijiki_tpu.scene.obj import load_obj_scene

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sim_twolevel import M_EPS, Table, camera_rays, octant_base, slab, tri_test


def tbl_base(cs, p, d):
    # HBM scenes skip octant tables (want_octants); single table -> base 0
    return octant_base(p, d) if cs.mega_num_tables_static > 1 else 0


def walk_depths(p, o, d, tmin, base):
    """One-level walk recording every visited row's table-relative index."""
    inv_d = 1.0 / d
    best_t = np.full(o.shape[0], np.inf)
    cur = base
    end = base + p.R
    visits = []
    while cur < end:
        visits.append(cur - base)
        if p.is_prim[cur]:
            best_t = np.minimum(best_t, tri_test(p, cur, o, d, tmin))
            cur = p.exit[cur]
        else:
            if slab(p, cur, o, d, inv_d, best_t, tmin).any():
                cur += 1
            else:
                cur = p.exit[cur]
    return np.asarray(visits), best_t


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bigcbox.obj"
    n_walks = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    if not os.path.exists(path) and path == "/tmp/bigcbox.obj":
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_bigscene.py"),
             "2", path],
            check=True,
        )
    scene = load_obj_scene(path)
    cs = compile_scene(scene, packed_leaf=12)
    p = Table(cs)
    print(f"table: {p.R} rows/table x {cs.mega_num_tables_static} tables")
    W = H = 512
    rng = np.random.default_rng(0)
    starts = rng.integers(0, W * H - lanes, n_walks)

    # K values: rows that fit typical VMEM budgets at the HBM row width
    # (128 lanes * 4 B = 512 B/row): 2 MiB -> 4096 rows, 4 MiB -> 8192,
    # 8 MiB -> 16384
    KS = [4096, 8192, 16384, 32768]
    for gen in ("camera", "bounce"):
        hist = np.zeros(len(KS), np.int64)
        total = 0
        for s in starts:
            idx = np.arange(s, s + lanes)
            px = (idx % W) + 0.5
            py = (idx // W) + 0.5
            o, d = camera_rays(cs, px, py, W, H)
            tmin = M_EPS
            if gen == "bounce":
                _, bt = walk_depths(p, o, d, tmin, tbl_base(cs, p, d))
                hit = np.isfinite(bt)
                if hit.sum() < 8:
                    continue
                o = o[hit] + bt[hit, None] * d[hit]
                u1, u2 = rng.random(hit.sum()), rng.random(hit.sum())
                r = np.sqrt(u1)
                phi = 2 * np.pi * u2
                d = np.stack(
                    [r * np.cos(phi), r * np.sin(phi), np.sqrt(1 - u1)], -1
                )
                d /= np.linalg.norm(d, axis=-1, keepdims=True)
                o = o + 1e-4 * d
            vis, _ = walk_depths(p, o, d, tmin, tbl_base(cs, p, d))
            total += len(vis)
            for i, K in enumerate(KS):
                hist[i] += int((vis < K).sum())
        frac = ", ".join(
            f"K={K}: {100.0 * h / max(total, 1):5.1f}%"
            for K, h in zip(KS, hist)
        )
        print(f"{gen:7s} visits/walk={total / max(n_walks, 1):8.1f}  "
              f"VMEM-cached visit share: {frac}")
    print(
        "\nhybrid ceiling: speedup <= 1 / (1 - share * (1 - vmem/hbm cost))"
        "\nwith vmem/hbm ~ 0.33 (333 ns vs ~1 us single-cursor)."
    )


if __name__ == "__main__":
    main()
