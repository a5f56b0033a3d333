"""Host-side sim: per-SUBLANE majority-octant table bases.

The walker's octant tables (8 near-to-far flattenings) are currently
selected once per packet by the all-lane majority octant (PERF_NOTES §9e:
+4%, ordering weakened by the union vote). But the tile runs 8 independent
sublane-cursors and ``cur`` is (8,1) — each cursor can start from ITS OWN
majority table at zero extra kernel cost (the base lands in the same
per-sublane init).  Camera packets are octant-uniform (no change); bounce
packets mix octants across the tile, so per-cursor majorities are sharper.

This sim walks real cbox bounce tiles and compares row visits (max over
the 8 co-scheduled cursors = tile cost) for: single area-ordered table,
tile-majority octant table, per-cursor majority octant table.

Usage: PYTHONPATH=/root/repo python tools/sim_subbase.py [P] [n_tiles]
"""

import sys

import numpy as np

from hijiki_tpu.scene.compile import compile_scene
from hijiki_tpu.scene.obj import load_obj_scene

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from sim_dense import M_EPS  # noqa: E402
from sim_twolevel import camera_rays  # noqa: E402


class OctTbl:
    def __init__(self, cs):
        rows = np.asarray(cs.trace_rows_mega, np.float32)
        self.ntab = cs.mega_num_tables_static
        self.R = cs.mega_tbl_rows
        self.rows = rows
        self.is_prim = rows[:, 9] >= 0
        self.exit = rows[:, 10].astype(np.int64)
        self.v0 = rows[:, 0:3]
        self.e1 = rows[:, 3:6]
        self.e2 = rows[:, 6:9]
        self.n = np.cross(self.e1, self.e2)
        self.nper = 1


def walk(t, o, d, base):
    inv = 1.0 / d
    best_t = np.full(o.shape[0], np.inf)
    cur, end = base, base + t.R
    visits = 0
    while cur < end:
        visits += 1
        if t.is_prim[cur]:
            # single-prim rows: inline Moller test (sim_dense.tri_t semantics)
            n = t.n[cur]
            rr = o - t.v0[cur]
            with np.errstate(divide="ignore", invalid="ignore"):
                q = np.cross(rr, d)
                dd = 1.0 / (d @ n)
                u = -dd * (q @ t.e2[cur])
                v = dd * (q @ t.e1[cur])
                tt = -dd * (rr @ n)
            ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (tt >= M_EPS) & (tt < best_t)
            best_t = np.where(ok, tt, best_t)
            cur = t.exit[cur]
        else:
            a = (t.v0[cur] - o) * inv
            b = (t.e1[cur] - o) * inv
            t0 = np.minimum(a, b).max(-1)
            t1 = np.maximum(a, b).min(-1)
            if ((t0 < t1 + M_EPS) & (t0 < best_t) & (t1 > M_EPS)).any():
                cur += 1
            else:
                cur = t.exit[cur]
    return visits


def majority_base(t, d):
    oc = (d[:, 0] < 0) * 1 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0) * 4
    return int(np.bincount(oc, minlength=8).argmax()) * t.R


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs8 = compile_scene(scene, packed_leaf=0, octant_tables="always")
    t = OctTbl(cs8)
    W = H = 512
    rng = np.random.default_rng(3)
    T = 8 * P

    agg = {"tilemaj": [], "subuma": []}
    for w in range(n_tiles):
        s = int(rng.integers(0, W * H - T))
        idx = np.arange(s, s + T)
        px = (idx % W) + 0.5
        py = (idx // W) + 0.5
        o, d = camera_rays(cs8, px, py, W, H)
        # get first-hit t with a per-tile walk (direction-uniform: base 0)
        from sim_dense import Tbl as DTbl, walker_union

        cs1 = getattr(main, "_cs1", None)
        if cs1 is None:
            cs1 = compile_scene(scene, packed_leaf=0, octant_tables="never")
            main._cs1 = cs1
            main._t1 = DTbl(cs1)
        _, bt, _ = walker_union(main._t1, o, d, M_EPS)
        m = np.isfinite(bt)
        o = o + np.where(m, bt, 1.0)[:, None] * d
        nd = rng.normal(size=(T, 3))
        d = nd / np.linalg.norm(nd, axis=-1, keepdims=True)
        o = o + 1e-3 * d

        base_tile = majority_base(t, d)
        Vt, Vs = [], []
        for k in range(8):
            sl = slice(k * P, (k + 1) * P)
            Vt.append(walk(t, o[sl], d[sl], base_tile))
            Vs.append(walk(t, o[sl], d[sl], majority_base(t, d[sl])))
        agg["tilemaj"].append((max(Vt), np.mean(Vt)))
        agg["subuma"].append((max(Vs), np.mean(Vs)))

    for name, label in (
        ("tilemaj", "tile-majority octant base"),
        ("subuma", "per-cursor majority base"),
    ):
        mx = np.mean([r[0] for r in agg[name]])
        mn = np.mean([r[1] for r in agg[name]])
        b = np.mean([r[0] for r in agg["tilemaj"]])
        print(f"{label:28s} max V = {mx:7.0f} mean V = {mn:7.0f} x{b/mx:.3f}")


if __name__ == "__main__":
    main()
