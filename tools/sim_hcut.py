"""Host-side visit simulator: hierarchy-cut restarts (VERDICT round-1 item 2b).

The idea under test: "per-bounce walks skip the root region" — start the
threaded walk at a node below the root instead of the root. In the threaded
exit-index walker (ops/pallas_megakernel; semantics shader/scene.glsl:99-133)
a walk from node k visits exactly subtree(k), so a static cut is only CORRECT
if no primitive outside subtree(k) can be hit; and it only SAVES anything if
the skipped visits would otherwise occur. Because the walker never restarts
(one pass root..exit per query), the only skippable visits are the leading
chain of interior rows whose descend vote passes — i.e. the walk's
always-descend prefix. This sim measures that prefix on real cbox walks:

  * per-walk prefix: leading run of interior visits whose packet union vote
    descends (an oracle per-packet cut — upper bound for any dynamic scheme);
  * static prefix: the longest chain shared by ALL walks of a generation+
    octant table (what a compile-time cut could actually skip).

Priced against total visits per walk. Ray generations: camera (raster
strips), diffuse bounce (cosine hemisphere at first hit), NEE shadow
(first hit -> uniform point on the emissive quad, bounded t).

Usage: python tools/sim_hcut.py [n_walks] [lanes_per_walk]
"""

import sys

import numpy as np

from hijiki_tpu.scene.compile import compile_scene
from hijiki_tpu.scene.obj import load_obj_scene

sys.path.insert(0, "/root/repo/tools")
from sim_twolevel import M_EPS, Table, camera_rays, octant_base, slab, tri_test


def walk_prefix(p, o, d, tmin, base, best0=None):
    """One-level walk; returns (total visits, always-descend prefix length,
    prefix node chain) where the prefix is the leading run of interior rows
    whose union slab vote descends."""
    inv_d = 1.0 / d
    best_t = np.full(o.shape[0], np.inf) if best0 is None else best0.copy()
    cur = base
    end = base + p.R
    visits = 0
    prefix = 0
    in_prefix = True
    chain = []
    while cur < end:
        visits += 1
        if p.is_prim[cur]:
            in_prefix = False
            best_t = np.minimum(best_t, tri_test(p, cur, o, d, tmin))
            cur = p.exit[cur]
        else:
            if slab(p, cur, o, d, inv_d, best_t, tmin).any():
                if in_prefix:
                    prefix += 1
                    chain.append(cur)
                cur += 1
            else:
                in_prefix = False
                cur = p.exit[cur]
    return visits, prefix, tuple(chain), best_t


def light_points(scene, rng, n):
    tris, mats = scene.triangles()
    from hijiki_tpu.scene.model import Emissive

    em = np.array([isinstance(scene.materials[m], Emissive) for m in mats])
    tri = tris[em]
    assert len(tri), "no emissive triangles"
    pick = rng.integers(0, len(tri), n)
    v = scene.positions[tri[pick]]  # (n, 3 verts, 3)
    u1, u2 = rng.random(n), rng.random(n)
    su1 = np.sqrt(u1)
    b0, b1 = 1 - su1, u2 * su1
    return v[:, 0] * b0[:, None] + v[:, 1] * b1[:, None] + v[:, 2] * (1 - b0 - b1)[:, None]


def main():
    n_walks = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs = compile_scene(scene, packed_leaf=4)
    p = Table(cs)
    W = H = 512
    rng = np.random.default_rng(0)
    starts = rng.integers(0, W * H - lanes, n_walks)

    for gen in ("camera", "bounce", "shadow"):
        visits_tot = prefix_tot = 0
        chains = {}  # octant base -> set of prefix chains
        n = 0
        for s in starts:
            idx = np.arange(s, s + lanes)
            px = (idx % W) + 0.5
            py = (idx // W) + 0.5
            o, d = camera_rays(cs, px, py, W, H)
            tmin = M_EPS
            best0 = None
            if gen != "camera":
                t, _, _, bt = walk_prefix(p, o, d, tmin, octant_base(p, d))
                hit = np.isfinite(bt)
                if hit.sum() < 8:
                    continue
                o = o[hit] + bt[hit, None] * d[hit]
                if gen == "bounce":
                    u1, u2 = rng.random(hit.sum()), rng.random(hit.sum())
                    r = np.sqrt(u1)
                    phi = 2 * np.pi * u2
                    d = np.stack(
                        [r * np.cos(phi), r * np.sin(phi), np.sqrt(1 - u1)], -1
                    )  # hemisphere in a fixed frame — direction spread is what matters
                    d /= np.linalg.norm(d, axis=-1, keepdims=True)
                else:  # shadow: bounded segment toward the light
                    lp = light_points(scene, rng, hit.sum())
                    seg = lp - o
                    dist = np.linalg.norm(seg, axis=-1)
                    d = seg / dist[:, None]
                    best0 = dist * (1 - 1e-3)
                o = o + 1e-4 * d
            base = octant_base(p, d)
            v, pr, chain, _ = walk_prefix(p, o, d, tmin, base, best0)
            visits_tot += v
            prefix_tot += pr
            chains.setdefault(base, []).append(chain)
            n += 1
        # static cut per octant table = longest chain common to all its walks
        static = 0
        nstatic = 0
        for base, clist in chains.items():
            common = 0
            for i in range(min(len(c) for c in clist)):
                heads = {c[i] for c in clist}
                if len(heads) == 1:
                    common += 1
                else:
                    break
            static += common * len(clist)  # per-walk weighting
            nstatic += len(clist)
        print(
            f"{gen:7s} walks={n:3d} visits/walk={visits_tot / n:7.1f} "
            f"oracle-prefix/walk={prefix_tot / n:5.2f} "
            f"({100 * prefix_tot / visits_tot:4.2f}%) "
            f"static-prefix~{static / max(nstatic, 1):4.2f}"
        )
    print(
        "\nhierarchy-cut ceiling = the prefix numbers above: the threaded walk"
        "\nnever restarts, so a cut can only skip the always-descend prefix."
    )


if __name__ == "__main__":
    main()
