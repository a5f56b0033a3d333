"""Host-side packet-union walk simulator: tree-QUALITY sensitivity.

The walker's cost is iteration count x per-iteration cost; iteration count
is the per-packet UNION of the lanes' traversals (PERF_NOTES §9d). This sim
asks how much iteration count moves with BUILD quality — SAH bin count,
leaf size, collapse rounds, child ordering — on the walker's real duty mix:
coherent camera packets AND incoherent bounce packets (the dominant cost:
~400 union visits/packet incoherent vs ~87 coherent, §9).

A big spread between build variants ⇒ tree optimization (e.g. Bittner-style
re-insertion) is worth building; a flat response ⇒ packet unions wash out
tree quality and the lever is dead. Walks the FlatBVH directly (own-box
threaded rows, the classic format).

Usage: PYTHONPATH=/root/repo python tools/bvh_quality.py [scene.obj]
                                   [n_walks] [lanes]
"""

import sys

import numpy as np

import hijiki_tpu.accel.bvh as bvh_mod
from hijiki_tpu.accel.bvh import build_bvh, collapse_bvh, order_children_by_area
from hijiki_tpu.scene.compile import compile_scene
from hijiki_tpu.scene.obj import load_obj_scene

sys.path.insert(0, "/root/repo/tools")
from sim_twolevel import camera_rays  # noqa: E402

M_EPS = 1e-4


def tri_geom(scene):
    """(v0, e1, e2) arrays for all triangles, reference winding."""
    cs = compile_scene(scene, octant_tables="never", packed_leaf=0)
    pos = np.asarray(scene.positions, np.float32)
    tris, _ = scene.triangles()
    v0 = pos[tris[:, 0]]
    e1 = pos[tris[:, 1]] - v0
    e2 = pos[tris[:, 2]] - v0
    return v0, e1, e2, cs


def tri_aabbs(v0, e1, e2):
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    return pts.min(axis=1), pts.max(axis=1)


def intersect_all(v0, e1, e2, o, d, tmin):
    """Brute-force closest hit of each lane against all tris.
    Returns (t, tri_idx) with inf/-1 for misses."""
    n = np.cross(e1, e2)  # (T,3)
    best_t = np.full(o.shape[0], np.inf)
    best_i = np.full(o.shape[0], -1, np.int64)
    for i in range(v0.shape[0]):
        rr = o - v0[i]
        q = np.cross(rr, d)
        dn = d @ n[i]
        with np.errstate(divide="ignore", invalid="ignore"):
            dd = 1.0 / dn
            u = -dd * (q @ e2[i])
            v = dd * (q @ e1[i])
            t = -dd * (rr @ n[i])
        ok = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= tmin) & (t < best_t)
        best_t = np.where(ok, t, best_t)
        best_i = np.where(ok, i, best_i)
    return best_t, best_i


def walk_union(b, prim_v0, prim_e1, prim_e2, o, d, tmin):
    """Threaded own-box packet walk; union descends. Returns visit count."""
    inv_d = 1.0 / d
    best_t = np.full(o.shape[0], np.inf)
    cur, visits = 0, 0
    n = b.num_nodes
    while cur < n:
        visits += 1
        mn, mx = b.aabb_min[cur], b.aabb_max[cur]
        a = (mn - o) * inv_d
        bb = (mx - o) * inv_d
        t0 = np.max(np.minimum(a, bb), axis=-1)
        t1 = np.min(np.maximum(a, bb), axis=-1)
        slab = (t0 < t1 + M_EPS) & (t0 < best_t) & (t1 > tmin)
        if b.count[cur] > 0:
            for s in range(b.first[cur], b.first[cur] + b.count[cur]):
                i = b.prim_order[s]
                rr = o - prim_v0[i]
                nrm = np.cross(prim_e1[i], prim_e2[i])
                q = np.cross(rr, d)
                dn = d @ nrm
                with np.errstate(divide="ignore", invalid="ignore"):
                    dd = 1.0 / dn
                    u = -dd * (q @ prim_e2[i])
                    v = dd * (q @ prim_e1[i])
                    t = -dd * (rr @ nrm)
                ok = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= tmin)
                best_t = np.where(ok & (t < best_t), t, best_t)
            cur = int(b.exit[cur])
        elif slab.any():
            cur += 1
        else:
            cur = int(b.exit[cur])
    return visits, best_t


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/scenes/cbox/cbox.obj"
    n_walks = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    scene = load_obj_scene(path)
    v0, e1, e2, cs = tri_geom(scene)
    amin, amax = tri_aabbs(v0, e1, e2)
    W = H = 512
    rng = np.random.default_rng(7)

    # ray duty mix: camera packets (16x16-tile raster coherent) + bounce
    # packets (cosine hemisphere from the camera hits — incoherent)
    packs = []
    for w in range(n_walks):
        px = rng.uniform(0, W, lanes) // 16 * 16 + rng.uniform(0, 16, lanes)
        py = rng.uniform(0, H, lanes) // 16 * 16 + rng.uniform(0, 16, lanes)
        o, d = camera_rays(cs, px, py, W, H)
        packs.append(("camera", o, d))
    for w in range(n_walks):
        px = rng.uniform(0, W, lanes) // 16 * 16 + rng.uniform(0, 16, lanes)
        py = rng.uniform(0, H, lanes) // 16 * 16 + rng.uniform(0, 16, lanes)
        o, d = camera_rays(cs, px, py, W, H)
        t, ti = intersect_all(v0, e1, e2, o, d, M_EPS)
        hit = np.isfinite(t)
        hp = o + d * np.where(hit, t, 1.0)[:, None]
        nrm = np.cross(e1, e2)[np.maximum(ti, 0)]
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-30
        # cosine hemisphere about the (unoriented) normal
        r1, r2 = rng.uniform(size=lanes), rng.uniform(size=lanes)
        st = np.sqrt(r1)
        lx, ly = st * np.cos(2 * np.pi * r2), st * np.sin(2 * np.pi * r2)
        lz = np.sqrt(np.maximum(0, 1 - r1))
        up = np.where(np.abs(nrm[:, 2:3]) < 0.9, [0.0, 0.0, 1.0], [1.0, 0.0, 0.0])
        tx = np.cross(up, nrm)
        tx /= np.linalg.norm(tx, axis=-1, keepdims=True) + 1e-30
        ty = np.cross(nrm, tx)
        nd = lx[:, None] * tx + ly[:, None] * ty + lz[:, None] * nrm
        packs.append(("bounce", hp[hit] + 1e-3 * nd[hit], nd[hit]))

    variants = {
        "sah16-l1-c1-area (current)": dict(bins=16, leaf=1, collapse=1, area=True),
        "sah16-l1-c0": dict(bins=16, leaf=1, collapse=0, area=True),
        "sah16-l1-c2": dict(bins=16, leaf=1, collapse=2, area=True),
        "sah16-l1-noorder": dict(bins=16, leaf=1, collapse=1, area=False),
        "sah64-l1-c1-area": dict(bins=64, leaf=1, collapse=1, area=True),
        "sah4-l1-c1-area": dict(bins=4, leaf=1, collapse=1, area=True),
        "sah2-l1-c1-area (poor)": dict(bins=2, leaf=1, collapse=1, area=True),
    }
    base_t = None
    for name, kw in variants.items():
        bvh_mod.N_BINS = kw["bins"]
        b = build_bvh(amin, amax, leaf_size=kw["leaf"], backend="numpy")
        if kw["collapse"]:
            b = collapse_bvh(b, rounds=kw["collapse"])
        if kw["area"]:
            b = order_children_by_area(b)
        tot = {"camera": 0, "bounce": 0}
        ts = []
        for kind, o, d in packs:
            vis, bt = walk_union(b, v0, e1, e2, o, d, M_EPS)
            tot[kind] += vis
            ts.append(bt)
        ts = np.concatenate(ts)
        if base_t is None:
            base_t = ts
        agree = np.allclose(
            np.where(np.isfinite(ts), ts, 0),
            np.where(np.isfinite(base_t), base_t, 0), rtol=1e-5,
        ) and np.array_equal(np.isfinite(ts), np.isfinite(base_t))
        print(
            f"{name:28s} nodes={b.num_nodes:6d} camera={tot['camera']:7d} "
            f"bounce={tot['bounce']:7d} total={tot['camera']+tot['bounce']:7d}"
            f"  hits-agree={agree}"
        )
    bvh_mod.N_BINS = 16


if __name__ == "__main__":
    main()
