"""Host-side visit simulator: two-level (deferred prim test) walker economics.

Question: post-packing, ~80% of walker iterations are interior rows that
still pay the (4-way) prim test as dead weight. A two-level scheme makes
every iteration type-uniform:

  inner step (cheap, ~slab+cursor only): interior rows vote/descend as
    today; a PRIM row is PARKED into a per-sublane buffer slot and the
    cursor jumps through its static exit immediately (no test!).
  drain step (packed 4-wide test): when a parking buffer fills (policy A:
    all sublanes full, frozen sublanes idle; policy B: any full, partial
    drains), the parked rows are fetched again and prim-tested, tightening
    best_t.

Cost: deferring tests means interior slab votes prune with a STALE best_t
— strictly more row visits (estimator exact: extra tests cannot change a
min). This sim walks real cbox tables with real camera/bounce rays and
counts inner/drain steps vs the current one-level walk, then prices both
with measured per-iteration costs. Decides whether to build the kernel.

Usage: python tools/sim_twolevel.py [n_walks] [lanes_per_walk]
"""

import sys

import numpy as np

from hijiki_tpu.scene.compile import (
    PACKED_BASE,
    PACKED_N,
    PACKED_STRIDE,
    compile_scene,
)
from hijiki_tpu.scene.obj import load_obj_scene

M_EPS = 1e-4


def camera_rays(cs, px, py, W, H):
    # camera_static = (pos3, quat4, fov) — ops/pallas_megakernel._camera_ray
    import math

    cx, cy, cz, qx, qy, qz, qw, fov = cs.camera_static
    R = np.array(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
            [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
            [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
        ]
    )
    scale = math.tan(math.radians(0.5 * fov)) / (0.5 * W)
    lx = (px - 0.5 * W) * scale
    ly = -(py - 0.5 * H) * scale
    local = np.stack([lx, ly, -np.ones_like(lx)], -1)
    d = local @ R.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(np.array([cx, cy, cz]), d.shape).copy()
    return o, d


class Table:
    def __init__(self, cs):
        rows = np.asarray(cs.trace_rows_mega, np.float32)
        assert cs.mega_packed_static
        ntab = cs.mega_num_tables_static
        self.R = cs.mega_tbl_rows
        self.pay_base = ntab * self.R
        self.rows = rows
        self.is_prim = rows[:, 9] > 0
        self.exit = rows[:, 10].astype(np.int64)
        # per-row packed prim data (PACKED_N, 4 vec3 + slot)
        self.prims = []
        for k in range(PACKED_N):
            B = PACKED_BASE + PACKED_STRIDE * k
            self.prims.append(
                dict(
                    v0=rows[:, B : B + 3],
                    v1=rows[:, B + 3 : B + 6],
                    v2=rows[:, B + 6 : B + 9],
                    n=rows[:, B + 9 : B + 12],
                )
            )


def tri_test(p, r, o, d, tmin):
    """Vectorized packed-prim test of table row r against lanes (o, d)."""
    hits_t = np.full(o.shape[0], np.inf, np.float64)
    for k in range(PACKED_N):
        v0 = p.prims[k]["v0"][r]
        v1 = p.prims[k]["v1"][r]
        v2 = p.prims[k]["v2"][r]
        n = p.prims[k]["n"][r]
        rr = o - v0
        q = np.cross(rr, d)
        dd = 1.0 / (d @ n)
        u = -dd * (q @ v2)
        v = dd * (q @ v1)
        t = -dd * (rr @ n)
        ok = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= tmin)
        tk = np.where(ok, t, np.inf)
        hits_t = np.minimum(hits_t, tk)
    return hits_t


def slab(p, r, o, d, inv_d, best_t, tmin):
    v0 = p.rows[r, 0:3]
    v1 = p.rows[r, 3:6]
    a = (v0 - o) * inv_d
    b = (v1 - o) * inv_d
    t0 = np.max(np.minimum(a, b), axis=-1)
    t1 = np.min(np.maximum(a, b), axis=-1)
    return (t0 < t1 + M_EPS) & (t0 < best_t) & (t1 > tmin)


def walk_oneLevel(p, o, d, tmin, base):
    inv_d = 1.0 / d
    best_t = np.full(o.shape[0], np.inf)
    cur = base
    end = base + p.R
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


def walk_twolevel(p, o, d, tmin, base, B):
    """Deferred prim tests: park up to B rows, drain when full. Counts
    inner steps (all visits) and drain test-steps."""
    inv_d = 1.0 / d
    best_t = np.full(o.shape[0], np.inf)
    cur = base
    end = base + p.R
    park = []
    n_inner = n_drain = 0
    while cur < end:
        n_inner += 1
        if p.is_prim[cur]:
            park.append(cur)
            cur = p.exit[cur]
            if len(park) >= B:
                for r in park:
                    n_drain += 1
                    best_t = np.minimum(best_t, tri_test(p, r, o, d, tmin))
                park = []
        else:
            if slab(p, cur, o, d, inv_d, best_t, tmin).any():
                cur += 1
            else:
                cur = p.exit[cur]
    for r in park:
        n_drain += 1
        best_t = np.minimum(best_t, tri_test(p, r, o, d, tmin))
    return best_t, n_inner, n_drain


def octant_base(p, d):
    # majority octant over lanes (near-to-far table choice)
    oct_l = (d[:, 0] < 0) * 1 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0) * 4
    counts = np.bincount(oct_l, minlength=8)
    return int(np.argmax(counts)) * p.R


def main():
    n_walks = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs = compile_scene(scene, packed_leaf=4)
    p = Table(cs)
    W = H = 512
    rng = np.random.default_rng(0)

    # camera walks: contiguous raster strips (the real lane->pixel map)
    starts = rng.integers(0, W * H - lanes, n_walks)
    gen_stats = {}
    for gen in ("camera", "bounce"):
        tot = dict(i1=0, p1=0, inner={1: 0, 2: 0, 4: 0, 8: 0},
                   drain={1: 0, 2: 0, 4: 0, 8: 0})
        for s in starts:
            idx = np.arange(s, s + lanes)
            px = (idx % W) + 0.5
            py = (idx // W) + 0.5
            o, d = camera_rays(cs, px, py, W, H)
            tmin = 1e-4
            if gen == "bounce":
                # advance to first hit, then cosine-hemisphere bounce
                t, _, _ = walk_oneLevel(p, o, d, tmin, octant_base(p, d))
                hit = np.isfinite(t)
                if hit.sum() < 8:
                    continue
                o = o[hit] + t[hit, None] * d[hit]
                # random hemisphere around +z then flip by surface-ish normal
                # (approx: random unit dirs — incoherence is what matters)
                nd = rng.normal(size=(hit.sum(), 3))
                d = nd / np.linalg.norm(nd, axis=-1, keepdims=True)
                o = o + 1e-3 * d
            base = octant_base(p, d)
            bt_ref, n_i, n_p = walk_oneLevel(p, o, d, tmin, base)
            tot["i1"] += n_i
            tot["p1"] += n_p
            for B in (1, 2, 4, 8):
                bt2, n_in, n_dr = walk_twolevel(p, o, d, tmin, base, B)
                assert np.allclose(
                    np.where(np.isinf(bt_ref), -1, bt_ref),
                    np.where(np.isinf(bt2), -1, bt2),
                ), "two-level walk changed the closest hit!"
                tot["inner"][B] += n_in
                tot["drain"][B] += n_dr
        gen_stats[gen] = tot

    # cost model from measured per-iteration times (G=4, P=1024, §9s):
    # one-level packed body = 1.88 us/k-iter, unpacked = 1.18. The packed
    # body is ~(slab 0.5 + 4-way test 1.1 + glue 0.28); inner step =
    # slab + glue + park logic ~= 0.9; drain step = fetch + 4-way test +
    # select ~= 1.4.
    C_ONE = 1.88
    C_INNER = 0.95
    C_DRAIN = 1.45
    C_UNPACKED = 1.18
    for gen, t in gen_stats.items():
        one = (t["i1"] + t["p1"]) * C_ONE
        print(f"\n[{gen}] one-level packed: {t['i1']} interior + {t['p1']} "
              f"prim visits, cost {one:.0f}")
        print(f"[{gen}] unpacked-leaf1 reference cost "
              f"~{(t['i1'] + t['p1'] * 2.9) * C_UNPACKED:.0f} "
              "(prim rows unpacked ~2.9x)")
        for B in (1, 2, 4, 8):
            cost = t["inner"][B] * C_INNER + t["drain"][B] * C_DRAIN
            infl = t["inner"][B] / (t["i1"] + t["p1"])
            print(f"[{gen}] two-level B={B}: inner {t['inner'][B]} "
                  f"(inflation {infl:.3f}) + drains {t['drain'][B]} "
                  f"-> cost {cost:.0f} ({one/cost:.2f}x vs one-level)")


if __name__ == "__main__":
    main()
