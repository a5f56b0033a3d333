"""Host-side visit simulator: dense cluster-candidate traversal economics.

The measured cost model (PERF_NOTES §9s/§9j) says the packet walker is
scalar-fetch/issue-bound at ~333 ns per iteration (8 sublane-cursors x 1 row)
and vector ALU is nearly free.  A *dense* traversal exploits that directly:

  stage 1 (dense cull): test ALL cluster AABBs against the packet —
    static unrolled batches of 8 clusters (one per sublane), no dynamic
    fetch, one cross-lane any-vote per batch -> per-cluster wanted bits
    (+ per-lane entry t0 for near-to-far ordering).
  stage 2 (candidate drain): iterate the wanted clusters near-to-far;
    each iteration fetches one cluster block (M prims) and tests all of
    them against all lanes (pure ALU); stop when every lane's best_t is
    closer than the nearest remaining cluster.

No per-row serial fetch->vote chain remains; the only dynamic loop is over
candidate clusters (fat bodies, ~M prim tests each).  Exactness: accepts
keep the reference predicate (tmin <= t < best_t, strict <), the final
winner is (min t, then min preorder slot) — order-independent, identical
to the sequential walk (over-visited clusters cannot accept: their AABB
rejected every lane in range; ULP-class caveat as for packet widths).

This sim cuts the real cbox/bigcbox BVH into clusters of <=M prims, walks
real camera/bounce/shadow packets, and prices walker vs dense with the
measured constants.  Decides whether to build the kernel.

Usage: PYTHONPATH=/root/repo python tools/sim_dense.py [scene.obj]
"""

import sys

import numpy as np

from hijiki_tpu.scene.compile import compile_scene
from hijiki_tpu.scene.obj import load_obj_scene

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from sim_twolevel import camera_rays  # noqa: E402

M_EPS = 1e-4

# measured cost constants (ns), PERF_NOTES §9j/§9s
IT_WALK = 333.0  # walker iteration: 8 sublane-cursors x 1 row each, P=1024
OP = 2.8  # one elementwise op over 1024 lanes (8 VREGs x 0.35 ns/issue)
VOTE = 130.0  # (8,P)->(8,1) cross-lane reduce
SLAB_OPS = 12  # AABB slab test op count
PRIM_OPS = 47  # full tri test (u,v,t + accept/select), _prim_test
FETCH8 = 30.0  # one 8-slice dynamic row/block fetch set
SCAN = 40.0  # next-candidate argmin scan on carries (pipelined; extra ops)


class Tbl:
    def __init__(self, cs):
        rows = np.asarray(cs.trace_rows_mega, np.float32)
        self.R = cs.mega_tbl_rows
        self.rows = rows[: self.R]
        self.is_prim = self.rows[:, 9] >= 0
        self.exit = self.rows[:, 10].astype(np.int64)
        self.v0 = self.rows[:, 0:3]
        self.e1 = self.rows[:, 3:6]
        self.e2 = self.rows[:, 6:9]
        self.n = np.cross(self.e1, self.e2)
        # prim AABBs (prim rows store v0/e1/e2, interiors store min/max)
        p0 = self.v0
        p1 = self.v0 + self.e1
        p2 = self.v0 + self.e2
        self.pmin = np.where(
            self.is_prim[:, None], np.minimum(np.minimum(p0, p1), p2), self.v0
        )
        self.pmax = np.where(
            self.is_prim[:, None], np.maximum(np.maximum(p0, p1), p2), self.e1
        )


def children(t, r):
    out = []
    c = r + 1
    while c < t.exit[r]:
        out.append(c)
        c = t.exit[c]
    return out


def cut_clusters(t, M):
    """Cut the threaded preorder tree into treelets of <= M prims each.
    Returns (aabb_min (C,3), aabb_max (C,3), prim_rows: list of arrays)."""
    nprim = np.cumsum(t.is_prim)

    def prims_in(r):
        e = t.exit[r]
        return nprim[e - 1] - (nprim[r - 1] if r > 0 else 0)

    roots = []
    stack = [0]
    while stack:
        r = stack.pop()
        if t.is_prim[r] or prims_in(r) <= M:
            roots.append(r)
        else:
            stack.extend(reversed(children(t, r)))
    roots.sort()
    amin, amax, plists = [], [], []
    for r in roots:
        e = t.exit[r]
        prs = np.arange(r, e)[t.is_prim[r:e]]
        if len(prs) == 0:
            continue
        amin.append(t.pmin[prs].min(0))
        amax.append(t.pmax[prs].max(0))
        plists.append(prs)
    return np.array(amin), np.array(amax), plists


def slab_hits(amin, amax, o, d, tmin, best_t):
    """(C, L) slab hit mask + entry t0, per-lane best_t aware."""
    inv = 1.0 / d
    a = (amin[:, None, :] - o[None]) * inv[None]
    b = (amax[:, None, :] - o[None]) * inv[None]
    t0 = np.minimum(a, b).max(-1)
    t1 = np.maximum(a, b).min(-1)
    hit = (t0 < t1 + M_EPS) & (t0 < best_t[None]) & (t1 > tmin)
    return hit, t0


def tri_t(t, prs, o, d, tmin, best_t):
    """Per-lane candidate t for prim rows prs (strict-< accept chain).
    Returns updated best_t and winning slot rows."""
    for r in prs:
        n = t.n[r]
        dn = d @ n
        rr = o - t.v0[r]
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.cross(rr, d)
            dd = 1.0 / dn
            u = -dd * (q @ t.e2[r])
            v = dd * (q @ t.e1[r])
            tt = -dd * (rr @ n)
        ok = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (tt >= tmin) & (tt < best_t)
        best_t = np.where(ok, tt, best_t)
    return best_t


def walker_union(t, o, d, tmin, shadow=False, occl=None):
    """Current kernel semantics: shared cursor, per-lane best_t slab, any-vote.
    Returns rows visited (and occlusion mask for shadow rays)."""
    L = o.shape[0]
    best_t = np.full(L, np.inf)
    hit = np.zeros(L, bool)
    tmax = occl if occl is not None else np.full(L, np.inf)
    cur, visits = 0, 0
    while cur < t.R:
        visits += 1
        if t.is_prim[cur]:
            bt = np.where(hit, tmin, tmax) if shadow else best_t
            nt = tri_t(t, [cur], o, d, tmin, bt)
            if shadow:
                hit |= nt < bt
                if hit.all():
                    break
            else:
                best_t = nt
            cur = t.exit[cur]
        else:
            bt = np.where(hit, tmin, tmax) if shadow else best_t
            inv = 1.0 / d
            a = (t.v0[cur] - o) * inv
            b = (t.e1[cur] - o) * inv
            t0 = np.minimum(a, b).max(-1)
            t1 = np.maximum(a, b).min(-1)
            sl = (t0 < t1 + M_EPS) & (t0 < bt) & (t1 > tmin)
            cur = cur + 1 if sl.any() else t.exit[cur]
    return visits, best_t, hit


def dense_counts(t, amin, amax, plists, o, d, tmin, shadow=False, occl=None):
    """Dense traversal: candidates without pruning (D0) and with near-to-far
    best_t early-stop (Dp). Returns (D0, Dp, best_t/occlusion)."""
    L = o.shape[0]
    C = len(plists)
    tmax = occl if occl is not None else np.full(L, np.inf)
    best0 = np.where(np.zeros(L, bool), tmin, tmax)
    hitm, t0 = slab_hits(amin, amax, o, d, tmin, best0)
    D0 = int(hitm.any(1).sum())

    # near-to-far drain with evolving per-lane best_t
    order = np.argsort(np.where(hitm, t0, np.inf).min(1))
    best_t = np.full(L, np.inf)
    hit = np.zeros(L, bool)
    Dp = 0
    for c in order:
        bt = np.where(hit, tmin, tmax) if shadow else best_t
        want = hitm[c] & (t0[c] < bt)
        if not want.any():
            continue
        Dp += 1
        nt = tri_t(t, plists[c], o, d, tmin, bt)
        if shadow:
            hit |= nt < bt
            if hit.all():
                break
        else:
            best_t = nt
    return D0, Dp, (hit if shadow else best_t)


def price_walker(visits):
    return visits * IT_WALK  # 8 co-scheduled cursors; visits = max over them


def price_dense(C, D, M):
    stage1 = np.ceil(C / 8) * (SLAB_OPS * OP + VOTE + 4 * OP)
    per_cand = FETCH8 + np.ceil(M / 8) * PRIM_OPS * OP + SCAN
    return stage1 + D * per_cand


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else None
    if path:
        scene = load_obj_scene(path)
    else:
        scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
        scene.put_cbox_spheres()
    cs = compile_scene(scene, packed_leaf=0, octant_tables="never")
    t = Tbl(cs)
    print(f"table rows={t.R} prims={int(t.is_prim.sum())}")

    W = H = 512
    LANES = 1024  # per sublane-cursor at P=1024
    rng = np.random.default_rng(0)
    emit = np.array([0.2, 1.97, 0.16])  # approx cbox light for shadow dirs

    for M in (16, 32, 64, 128):
        amin, amax, plists = cut_clusters(t, M)
        C = len(plists)
        stats = {}
        for gen in ("camera", "bounce", "shadow"):
            Vs, D0s, Dps = [], [], []
            for w in range(8):
                s = int(rng.integers(0, W * H - LANES))
                idx = np.arange(s, s + LANES)
                px = (idx % W) + 0.5
                py = (idx // W) + 0.5
                o, d = camera_rays(cs, px, py, W, H)
                occl = None
                shadow = False
                if gen in ("bounce", "shadow"):
                    _, bt, _ = walker_union(t, o, d, M_EPS)
                    m = np.isfinite(bt)
                    if m.sum() < 8:
                        continue
                    o = o[m] + bt[m, None] * d[m]
                    if gen == "bounce":
                        nd = rng.normal(size=(m.sum(), 3))
                        d = nd / np.linalg.norm(nd, axis=-1, keepdims=True)
                        o = o + 1e-3 * d
                    else:
                        tgt = emit + rng.normal(scale=0.05, size=(m.sum(), 3))
                        d = tgt - o
                        dist = np.linalg.norm(d, axis=-1, keepdims=True)
                        d = d / dist
                        o = o + 1e-3 * d
                        occl = dist[:, 0] - 2e-3
                        shadow = True
                v, _, _ = walker_union(t, o, d, M_EPS, shadow, occl)
                D0, Dp, _ = dense_counts(
                    t, amin, amax, plists, o, d, M_EPS, shadow, occl
                )
                Vs.append(v)
                D0s.append(D0)
                Dps.append(Dp)
            V, D0, Dp = np.mean(Vs), np.mean(D0s), np.mean(Dps)
            wcost = price_walker(V)
            dcost0 = price_dense(C, D0, M)
            dcostp = price_dense(C, Dp, M)
            stats[gen] = (V, D0, Dp, wcost / dcost0, wcost / dcostp)
            print(
                f"M={M:3d} C={C:4d} [{gen:6s}] walker rows={V:7.0f} "
                f"dense cand={D0:5.1f} pruned={Dp:5.1f}  "
                f"speedup x{wcost/dcost0:5.2f} (pruned x{wcost/dcostp:5.2f})"
            )
        print()


if __name__ == "__main__":
    main()
