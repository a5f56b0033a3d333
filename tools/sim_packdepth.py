"""Host-side visit simulator: packed-leaf DEPTH economics for HBM streaming.

HBM-streamed trace rows are padded to 128 lanes (Mosaic DMA alignment), so
every format pays the same 512 B per row DMA — iteration count is the whole
game there. This sim walks real packed tables (PACKED4 64-wide vs PACKED12
128-wide, both at their matching leaf size) with real camera-ray packets and
counts interior/prim row visits per packet, pricing the formats at equal
per-iteration cost (the HBM walker is DMA-bound; PERF_NOTES §9s).

Usage: PYTHONPATH=/root/repo python tools/sim_packdepth.py [scene.obj]
                                   [n_walks] [lanes_per_walk]
  default scene: /tmp/bigcbox.obj (tools/make_bigscene.py)
"""

import os
import sys

import numpy as np

from hijiki_tpu.scene.compile import (
    PACKED3_BASES,
    PACKED3_N,
    PACKED3_SLOT_COL,
    PACKED12_BASES,
    PACKED12_N,
    PACKED12_SLOT_COL,
    PACKED_BASE,
    PACKED_N,
    PACKED_STRIDE,
    compile_scene,
)
from hijiki_tpu.scene.obj import load_obj_scene

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sim_twolevel import camera_rays  # noqa: E402

M_EPS = 1e-4


class PackedTable:
    def __init__(self, cs):
        rows = np.asarray(cs.trace_rows_mega, np.float32)
        nper = cs.mega_packed_static
        assert nper
        self.nper = nper
        self.R = cs.mega_tbl_rows
        self.rows = rows
        self.is_prim = rows[:, 9] > 0
        self.exit = rows[:, 10].astype(np.int64)
        if nper == PACKED3_N:
            bases = PACKED3_BASES
        elif nper == PACKED12_N:
            bases = PACKED12_BASES
        else:
            bases = tuple(PACKED_BASE + PACKED_STRIDE * k for k in range(nper))
        self.prims = []
        for B in bases:
            v1 = rows[:, B + 3 : B + 6]
            v2 = rows[:, B + 6 : B + 9]
            self.prims.append(
                dict(
                    v0=rows[:, B : B + 3],
                    v1=v1,
                    v2=v2,
                    n=np.cross(v1, v2),
                )
            )


def tri_test(p, r, o, d, tmin):
    hits_t = np.full(o.shape[0], np.inf, np.float64)
    for k in range(p.nper):
        v0 = p.prims[k]["v0"][r]
        n = p.prims[k]["n"][r]
        dn = d @ n
        if not np.any(dn):
            continue  # degenerate zero-pad prim
        rr = o - v0
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.cross(rr, d)
            dd = 1.0 / dn
            u = -dd * (q @ p.prims[k]["v2"][r])
            v = dd * (q @ p.prims[k]["v1"][r])
            t = -dd * (rr @ n)
        ok = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= tmin)
        hits_t = np.minimum(hits_t, np.where(ok, t, np.inf))
    return hits_t


def slab(p, r, o, d, inv_d, best_t, tmin):
    v0 = p.rows[r, 0:3]
    v1 = p.rows[r, 3:6]
    a = (v0 - o) * inv_d
    b = (v1 - o) * inv_d
    t0 = np.max(np.minimum(a, b), axis=-1)
    t1 = np.min(np.maximum(a, b), axis=-1)
    return (t0 < t1 + M_EPS) & (t0 < best_t) & (t1 > tmin)


def walk(p, o, d, tmin):
    inv_d = 1.0 / d
    best_t = np.full(o.shape[0], np.inf)
    cur, end = 0, p.R
    n_int = n_prim = 0
    while cur < end:
        if p.is_prim[cur]:
            n_prim += 1
            best_t = np.minimum(best_t, tri_test(p, cur, o, d, tmin))
            cur = p.exit[cur]
        else:
            n_int += 1
            if slab(p, cur, o, d, inv_d, best_t, tmin).any():
                cur += 1
            else:
                cur = p.exit[cur]
    return best_t, n_int, n_prim


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bigcbox.obj"
    n_walks = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    if not os.path.exists(path) and path == "/tmp/bigcbox.obj":
        os.system(f"{sys.executable} {os.path.dirname(__file__)}/make_bigscene.py 2 {path}")
    scene = load_obj_scene(path)
    W = H = 512

    results = {}
    for nper in (4, 12):
        rng = np.random.default_rng(0)  # identical rays per format
        cs = compile_scene(scene, packed_leaf=nper, octant_tables="never")
        p = PackedTable(cs)
        tot_int = tot_prim = 0
        best_ts = []
        for w in range(n_walks):
            px = rng.uniform(0, W, lanes) // 16 * 16 + rng.uniform(0, 16, lanes)
            py = rng.uniform(0, H, lanes) // 16 * 16 + rng.uniform(0, 16, lanes)
            o, d = camera_rays(cs, px, py, W, H)
            bt, ni, npr = walk(p, o, d, M_EPS)
            tot_int += ni
            tot_prim += npr
            best_ts.append(bt)
        results[nper] = (p.R, tot_int, tot_prim, np.concatenate(best_ts))
        print(
            f"packed_leaf={nper:2d}: rows={p.R:7d} "
            f"interior visits={tot_int:7d} prim visits={tot_prim:7d} "
            f"total={tot_int + tot_prim:7d}"
        )

    r4, r12 = results[4], results[12]
    hit4 = np.isfinite(r4[3])
    hit12 = np.isfinite(r12[3])
    assert np.array_equal(hit4, hit12), "formats must hit the same rays"
    ok = np.allclose(r4[3][hit4], r12[3][hit12], rtol=1e-5)
    tot4 = r4[1] + r4[2]
    tot12 = r12[1] + r12[2]
    print(f"best_t agreement (same tree family, rtol 1e-5): {ok}")
    print(
        f"iteration ratio 12/4: {tot12 / tot4:.3f} "
        f"(expected HBM wall ~{tot4 / tot12:.2f}x if DMA-bound)"
    )


if __name__ == "__main__":
    main()
