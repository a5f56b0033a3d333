"""Octant-ordered traversal tables: structural invariants and closest-hit
equivalence of all 8 flattenings (compile.build_octant_trace_tables).

The octant tables implement ordered (near-first) stackless traversal by
storing one threaded flattening per ray-direction octant; reordering children
must never change WHAT is hit, only the visit order, so every table has to
produce brute-force-identical closest hits.
"""

import numpy as np
import pytest

from hijiki_tpu.scene.compile import compile_scene


@pytest.fixture(scope="module")
def oct_compiled(cbox_scene):
    import copy

    scene = copy.deepcopy(cbox_scene)
    scene.put_cbox_spheres()
    return compile_scene(scene, octant_tables="always")


def _tables(cs):
    R = cs.mega_tbl_rows
    rows = np.asarray(cs.trace_rows_mega)
    return [rows[o * R : (o + 1) * R] for o in range(cs.mega_num_tables_static)]


def test_structure(oct_compiled):
    cs = oct_compiled
    assert cs.mega_num_tables_static == 8
    R = cs.mega_tbl_rows
    tabs = _tables(cs)

    def prim_key(tab):
        prim = tab[tab[:, 9] >= 0]
        # everything identifying a prim row except threading (col 10)
        keyed = np.concatenate([prim[:, :10], prim[:, 11:]], axis=1)
        return keyed[np.lexsort(keyed.T[::-1])]

    ref = prim_key(tabs[0])
    for o, tab in enumerate(tabs):
        # same multiset of primitive rows in every flattening
        np.testing.assert_array_equal(prim_key(tab), ref, err_msg=f"octant {o}")
        # exits stay within the owning table (absolute, rebased by o*R)
        ex = tab[:, 10]
        assert (ex > np.arange(o * R, (o + 1) * R)).all()
        assert (ex <= (o + 1) * R).all()


def _walk_closest(tab, base, o, d, tmin):
    """Scalar host reference of the kernel's threaded walk (one ray)."""
    inv = 1.0 / d
    best_t, best = np.inf, -1
    cur, end = 0, tab.shape[0]
    while cur < end:
        row = tab[cur]
        if row[9] < 0:  # interior slab
            a = (row[0:3] - o) * inv
            b = (row[3:6] - o) * inv
            t0 = np.minimum(a, b).max()
            t1 = np.maximum(a, b).min()
            hit = (t0 < t1 + 1e-4) and (t0 < best_t) and (t1 > tmin)
            cur = cur + 1 if hit else int(row[10]) - base
            continue
        # triangle row (mega tables are triangle-only for cbox+spheres)
        v0, v1, v2, n = row[0:3], row[3:6], row[6:9], row[29:32]
        q = np.cross(o - v0, d)
        dd = 1.0 / np.dot(d, n)
        u = -dd * np.dot(q, v2)
        v = dd * np.dot(q, v1)
        t = -dd * np.dot(n, o - v0)
        if u >= 0 and v >= 0 and u + v <= 1 and tmin <= t < best_t:
            best_t, best = t, int(row[11])
        cur = int(row[10]) - base
    return best_t, best


def test_all_octants_equal_closest_hit(oct_compiled, rng_np):
    cs = oct_compiled
    R = cs.mega_tbl_rows
    tabs = _tables(cs)
    n = 64
    o = rng_np.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    o[:, 1] += 1.0
    d = rng_np.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    for i in range(n):
        ref = None
        for oc, tab in enumerate(tabs):
            got = _walk_closest(tab, oc * R, o[i].astype(np.float64), d[i].astype(np.float64), 1e-4)
            if ref is None:
                ref = got
            else:
                assert got[1] == ref[1], f"ray {i}: octant {oc} winner differs"
                np.testing.assert_allclose(got[0], ref[0], rtol=1e-6)


def test_octant_gate_respects_vmem_staging_limit(cbox_scene):
    """The octant auto-gate must never build an 8-copy set that exceeds the
    megakernel's VMEM staging limit (ADVICE r2: an 8-12 MiB octant set would
    silently flip a VMEM-resident single-table scene into HBM streaming —
    cbox's classic-row set is exactly in that band)."""
    import copy

    from hijiki_tpu.scene.compile import MEGA_VMEM_TABLE_BYTES, compile_scene

    scene = copy.deepcopy(cbox_scene)
    scene.put_cbox_spheres()
    cs = compile_scene(scene)
    n_oct = cs.mega_num_tables_static
    if n_oct == 8:
        assert cs.trace_rows_mega.nbytes <= MEGA_VMEM_TABLE_BYTES
    else:
        # single flatten: the 8-copy set would not have fit the staging limit
        assert cs.trace_rows_mega.nbytes * 8 > MEGA_VMEM_TABLE_BYTES
        assert cs.trace_rows_mega.nbytes <= MEGA_VMEM_TABLE_BYTES

    # packed formats: the gate must count the shared slot-indexed PAYLOAD
    # section too — the renderer's HBM trigger is the TOTAL nbytes, and a
    # walk-only gate could build an octant set whose payload pushes the
    # total over the limit (round-3 review finding). Whatever the gate
    # decided, the resulting table must respect the staging limit.
    for pl in (1, 4):
        cp = compile_scene(scene, packed_leaf=pl)
        if cp.mega_num_tables_static == 8:
            assert cp.trace_rows_mega.nbytes <= MEGA_VMEM_TABLE_BYTES, pl
