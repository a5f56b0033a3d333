"""Host-side visit simulator: dedicated any-hit shadow walk (round-4
verdict #1 — sim-price before building, house rule).

The NEE shadow walk is ~31% of all row visits (PERF_NOTES §9r) yet runs on
the SAME trace table as the closest-hit walk. A dedicated shadow table can
be packed (3 prims per 32-wide row — the PACKED3 format) because the
objections that killed packing for closest-hit do not apply to any-hit:
  * no winner-resolve loop (the 0.935x PACKED3 loss came from payload
    resolve + pslot bookkeeping, §9y) — any-hit carries a hit flag only;
  * no payload section needed at all (walk rows only);
  * row width stays 32 (the per-iteration cost is fetch-width-bound, §9s,
    so a PACKED3 row costs the same as a classic row).

This sim walks REAL cbox shadow-ray distributions (first-hit and
second-bounce NEE segments toward the light, bounded t) through
  (a) the production classic 1-prim table   (today's shadow walk),
  (b) a dedicated PACKED3 3-prim table      (the candidate),
  (c) PACKED4 (64-wide, 4-prim)             (priced at +20%/row, §9s),
with any-hit semantics (a lane resolves on its first occluding hit; the
packet union drives the cursor; optional early exit when every lane is
resolved or inactive) and reports visits/walk + the projected end-to-end
factor at the measured 31% shadow share.

Usage: PYTHONPATH=/root/repo python tools/sim_shadow_walk.py [n_walks]
                                                             [lanes_per_walk]
"""

import sys

import numpy as np

from hijiki_tpu.scene.compile import (
    PACKED3_BASES,
    PACKED3_N,
    PACKED_BASE,
    PACKED_N,
    PACKED_STRIDE,
    compile_scene,
)
from hijiki_tpu.scene.obj import load_obj_scene

sys.path.insert(0, "/root/repo/tools")
from sim_hcut import light_points  # noqa: E402
from sim_twolevel import M_EPS, camera_rays  # noqa: E402


class AnyTable:
    """Walk table in classic (nper=1), PACKED3, or PACKED4 format."""

    def __init__(self, cs, nper):
        rows = np.asarray(cs.trace_rows_mega, np.float32)
        self.R = cs.mega_tbl_rows
        self.ntab = cs.mega_num_tables_static
        self.rows = rows
        self.nper = nper
        self.is_prim = rows[:, 9] > 0
        self.exit = rows[:, 10].astype(np.int64)
        if nper == 1:
            bases = (0,)
        elif nper == PACKED3_N:
            bases = PACKED3_BASES
        else:
            bases = tuple(PACKED_BASE + PACKED_STRIDE * k for k in range(nper))
        self.prims = [
            dict(
                v0=rows[:, B : B + 3],
                e1=rows[:, B + 3 : B + 6],
                e2=rows[:, B + 6 : B + 9],
                n=np.cross(rows[:, B + 3 : B + 6], rows[:, B + 6 : B + 9]),
            )
            for B in bases
        ]

    def octant_base(self, d):
        if self.ntab == 1:
            return 0
        dm = d.mean(axis=0)
        o = (dm[0] < 0) | ((dm[1] < 0) << 1) | ((dm[2] < 0) << 2)
        return int(o) * self.R


def anyhit_test(p, r, o, d, tmin, tmax):
    """True per lane if ANY prim of row r occludes the bounded segment."""
    occ = np.zeros(o.shape[0], bool)
    for prim in p.prims:
        v0, e1, e2, n = (prim[k][r] for k in ("v0", "e1", "e2", "n"))
        rr = o - v0
        q = np.cross(rr, d)
        denom = d @ n
        with np.errstate(divide="ignore", invalid="ignore"):
            dd = 1.0 / denom
            u = -dd * (q @ e2)
            v = dd * (q @ e1)
            t = -dd * (rr @ n)
        ok = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= tmin) & (t < tmax)
        occ |= np.nan_to_num(ok, nan=False)
    return occ


def slab_vote(p, r, o, inv_d, eff_t, tmin, active):
    v0 = p.rows[r, 0:3]
    v1 = p.rows[r, 3:6]
    a = (v0 - o) * inv_d
    b = (v1 - o) * inv_d
    t0 = np.max(np.minimum(a, b), axis=-1)
    t1 = np.min(np.maximum(a, b), axis=-1)
    return ((t0 < t1 + M_EPS) & (t0 < eff_t) & (t1 > tmin) & active).any()


def shadow_walk(p, o, d, tmin, tmax, early_exit):
    """Any-hit union walk; returns (visits, visits_wo_early_exit,
    occluded mask). Resolved lanes (occluded) stop voting (production
    semantics: best_t collapses to tmin); early_exit ends the walk when
    every lane is resolved."""
    inv_d = 1.0 / d
    occ = np.zeros(o.shape[0], bool)
    active = tmax > 0
    base = p.octant_base(d)
    cur, end = base, base + p.R
    visits = visits_all = 0
    while cur < end:
        visits_all += 1
        live = active & ~occ
        if early_exit and not live.any():
            break
        visits += 1
        if p.is_prim[cur]:
            hit = anyhit_test(p, cur, o, d, tmin, tmax)
            occ |= hit & live
            cur = p.exit[cur]
        else:
            eff_t = np.where(occ, tmin, tmax)
            if slab_vote(p, cur, o, inv_d, eff_t, tmin, active):
                cur += 1
            else:
                cur = p.exit[cur]
    # finish counting the no-early-exit walk length
    while cur < end:
        visits_all += 1
        if p.is_prim[cur]:
            cur = p.exit[cur]
        else:
            eff_t = np.where(occ, tmin, tmax)
            if slab_vote(p, cur, o, inv_d, eff_t, tmin, active):
                cur += 1
            else:
                cur = p.exit[cur]
    return visits, visits_all, occ


def closest_hit_t(p, o, d, tmin):
    """Closest-hit t per lane on the classic table (hit-point generator)."""
    inv_d = 1.0 / d
    best = np.full(o.shape[0], np.inf)
    base = p.octant_base(d)
    cur, end = base, base + p.R
    while cur < end:
        if p.is_prim[cur]:
            prim = p.prims[0]
            v0, e1, e2, n = (prim[k][cur] for k in ("v0", "e1", "e2", "n"))
            rr = o - v0
            q = np.cross(rr, d)
            denom = d @ n
            with np.errstate(divide="ignore", invalid="ignore"):
                dd = 1.0 / denom
                u = -dd * (q @ e2)
                v = dd * (q @ e1)
                t = -dd * (rr @ n)
            ok = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= tmin) & (t < best)
            best = np.where(np.nan_to_num(ok, nan=False), t, best)
            cur = p.exit[cur]
        else:
            v0 = p.rows[cur, 0:3]
            v1 = p.rows[cur, 3:6]
            a = (v0 - o) * inv_d
            b = (v1 - o) * inv_d
            t0 = np.max(np.minimum(a, b), axis=-1)
            t1 = np.min(np.maximum(a, b), axis=-1)
            if ((t0 < t1 + M_EPS) & (t0 < best) & (t1 > tmin)).any():
                cur += 1
            else:
                cur = p.exit[cur]
    return best


def main():
    n_walks = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()

    cs_classic = compile_scene(scene)
    tables = {
        "classic": AnyTable(cs_classic, 1),
        "packed3": AnyTable(compile_scene(scene, packed_leaf=3), PACKED3_N),
        "packed4": AnyTable(compile_scene(scene, packed_leaf=4), PACKED_N),
    }
    # per-row cost relative to a 32-wide fetch (PERF_NOTES §9s: 64-wide
    # rows cost ~+20%/iteration; 32-wide formats are equal-cost)
    row_cost = {"classic": 1.0, "packed3": 1.0, "packed4": 1.2}

    W = H = 512
    rng = np.random.default_rng(0)
    starts = rng.integers(0, W * H - lanes, n_walks)

    print(f"walks={n_walks} lanes/walk={lanes} (cbox+spheres, octant tables)")
    for gen in ("first-hit", "bounce-1"):
        stats = {k: [0, 0, 0] for k in tables}  # visits, visits_noexit, n
        occ_share = 0.0
        nseen = 0
        for s in starts:
            idx = np.arange(s, s + lanes)
            px = (idx % W) + 0.5
            py = (idx // W) + 0.5
            o, d = camera_rays(cs_classic, px, py, W, H)
            t = closest_hit_t(tables["classic"], o, d, M_EPS)
            hit = np.isfinite(t)
            if hit.sum() < 8:
                continue
            o = o[hit] + t[hit, None] * d[hit]
            d = d[hit]
            if gen == "bounce-1":
                # one diffuse bounce before NEE (direction spread is what
                # matters; frame orientation is second-order, sim_hcut)
                u1, u2 = rng.random(len(o)), rng.random(len(o))
                r_ = np.sqrt(u1)
                phi = 2 * np.pi * u2
                nd = np.stack(
                    [r_ * np.cos(phi), r_ * np.sin(phi), np.sqrt(1 - u1)], -1
                )
                nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
                o2 = o + 1e-4 * nd
                t2 = closest_hit_t(tables["classic"], o2, nd, M_EPS)
                hit2 = np.isfinite(t2)
                if hit2.sum() < 8:
                    continue
                o = o2[hit2] + t2[hit2, None] * nd[hit2]
            # production NEE segment (pallas_megakernel.py NEE site): origin
            # is the raw hit point, tmin=2*M_EPS excludes the surface,
            # tmax=dist-M_EPS excludes the light itself
            lp = light_points(scene, rng, len(o))
            seg = lp - o
            dist = np.linalg.norm(seg, axis=-1)
            sd = seg / dist[:, None]
            so = o
            tmax = dist - M_EPS
            occ_ref = None
            for name, p in tables.items():
                v, va, occ = shadow_walk(p, so, sd, 2 * M_EPS, tmax, True)
                stats[name][0] += v
                stats[name][1] += va
                stats[name][2] += 1
                if occ_ref is None:
                    occ_ref = occ
                    occ_share += occ.mean()
                    nseen += 1
                else:
                    assert (occ == occ_ref).all(), (
                        f"{name} disagrees with classic occlusion"
                    )
        base_cost = None
        print(f"\n[{gen} NEE] occluded-lane share {occ_share / nseen:.2f}")
        for name, (v, va, n) in stats.items():
            cost = row_cost[name] * v / n
            if base_cost is None:
                base_cost = cost
            factor = base_cost / cost
            print(
                f"  {name:8s} visits/walk={v / n:7.1f} "
                f"(no-early-exit {va / n:7.1f})  priced-cost/walk "
                f"{cost:7.1f}  shadow-walk speedup x{factor:4.2f}  "
                f"end-to-end (31% share) x{1.0 / (1.0 - 0.31 * (1 - 1 / factor)):4.3f}"
            )


if __name__ == "__main__":
    main()
