"""Host-side sim: per-column 8-way sublane sort of bounce rays by direction.

The tile runs 8 independent sublane-cursors of P lanes each; bounce-ray
packets are direction-incoherent, and direction drives the packet-union
blowup (PERF_NOTES §3, §9k2: bounce unions 800-2300 rows vs camera 50-270).
A full cross-tile regroup needs a fast 8k-lane partition (dead on this
stack), but an 8-element sort ALONG SUBLANES per 128-lane column is a
~19-stage compare-exchange network of sublane rolls (~300 ns/bounce,
estimator-exact: pure lane permutation, per-lane state travels).  After the
sort, sublane k holds the column's k-th ray by direction key, so each
cursor's P rays are direction-biased — and each cursor can then start from
its own majority-octant table (per-sublane bases are natural: cur is (8,1)).

This sim measures the union shrinkage: walk V per sublane-cursor before /
after the sort (tile cost = max_k V_k), on real cbox bounce packets.

Usage: PYTHONPATH=/root/repo python tools/sim_sublanesort.py [P] [n_tiles]
"""

import sys

import numpy as np

from hijiki_tpu.scene.compile import compile_scene
from hijiki_tpu.scene.obj import load_obj_scene

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from sim_dense import Tbl, walker_union  # noqa: E402
from sim_twolevel import camera_rays  # noqa: E402

M_EPS = 1e-4


def octant(d):
    return (d[:, 0] < 0) * 1 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0) * 4


def dirkey(d, bits=0):
    """Sort key: octant, optionally refined with the dominant-axis bits."""
    k = octant(d).astype(np.int64)
    if bits:
        # refine within octant by quantized direction (finer coherence)
        q = ((d + 1) * 0.5 * ((1 << bits) - 1)).astype(np.int64)
        k = (k << (3 * bits)) | (q[:, 0] << (2 * bits)) | (q[:, 1] << bits) | q[:, 2]
    return k


def tile_cost(t, o, d, P):
    """Walk each sublane-cursor's P rays; tile cost = max visits."""
    V = []
    for k in range(8):
        sl = slice(k * P, (k + 1) * P)
        v, _, _ = walker_union(t, o[sl], d[sl], M_EPS)
        V.append(v)
    return max(V), float(np.mean(V))


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs = compile_scene(scene, packed_leaf=0, octant_tables="never")
    t = Tbl(cs)
    W = H = 512
    rng = np.random.default_rng(1)
    T = 8 * P

    res = {"base": [], "oct": [], "fine": [], "rand": []}
    for w in range(n_tiles):
        s = int(rng.integers(0, W * H - T))
        idx = np.arange(s, s + T)
        px = (idx % W) + 0.5
        py = (idx // W) + 0.5
        o, d = camera_rays(cs, px, py, W, H)
        _, bt, _ = walker_union(t, o, d, M_EPS)
        m = np.isfinite(bt)
        # keep the tile full: respawn misses as reflected camera rays
        o = o + np.where(m, bt, 1.0)[:, None] * d
        nd = rng.normal(size=(T, 3))
        d = nd / np.linalg.norm(nd, axis=-1, keepdims=True)
        o = o + 1e-3 * d

        # baseline: raster layout (lane i -> sublane i // P)
        res["base"].append(tile_cost(t, o, d, P))

        # sublane sort: per column c (128-lane groups along P), sort the 8
        # rays at positions {k*P + c} by key. Emulate with argsort per column.
        for name, bits in (("oct", 0), ("fine", 2)):
            key = dirkey(d, bits)
            o2, d2 = o.copy(), d.copy()
            cols = np.arange(P)
            mat = np.stack([key[k * P + cols] for k in range(8)])  # (8, P)
            ordk = np.argsort(mat, axis=0, kind="stable")  # (8, P)
            for k in range(8):
                src = ordk[k] * P + cols
                o2[k * P + cols] = o[src]
                d2[k * P + cols] = d[src]
            res[name].append(tile_cost(t, o2, d2, P))

        # upper bound: full random-free global sort by key across the tile
        ordg = np.argsort(dirkey(d, 2), kind="stable")
        res["rand"].append(tile_cost(t, o[ordg], d[ordg], P))

    for name, label in (
        ("base", "raster baseline"),
        ("oct", "sublane sort (octant)"),
        ("fine", "sublane sort (octant+2bit)"),
        ("rand", "full tile sort (upper bound)"),
    ):
        mx = np.mean([r[0] for r in res[name]])
        mn = np.mean([r[1] for r in res[name]])
        base = np.mean([r[0] for r in res["base"]])
        print(
            f"{label:30s} max V = {mx:7.0f}  mean V = {mn:7.0f}  "
            f"tile speedup x{base / mx:.2f}"
        )


if __name__ == "__main__":
    main()
