"""ctypes bindings for the native C++ scalar oracle (oracle_native.cpp).

Same build scheme as scene/obj_native.py: compile on demand with g++
(plain C ABI, content-hash cached .so), graceful None fallback when
unavailable. ``-ffp-contract=off`` and no fast-math keep the f32 expression
trees identical to the numpy oracle; the only divergence class is
libm-vs-numpy 1-ulp trig/exp rounding (tests/test_oracle_native.py pins the
resulting agreement).

The oracle is the MSE-gate reference (BASELINE north star: equal-seed MSE
vs the reference estimator). The numpy twin (ops/oracle.py +
tools/oracle_mse.py) costs ~15-30 s per 64^2 sweep on one host core; this
runs the same per-path control flow at C speed (~1000x), making
4096-spp oracle films practical.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "oracle_native.cpp")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _cflags() -> list:
    """Value-safe optimization flags. HIJIKI_ORACLE_CFLAGS appends extra
    flags (e.g. "-O3 -march=native") — anything appended MUST stay
    value-safe (no -ffast-math/-fassociative-math: the oracle's whole
    point is bit-exact f32 semantics; -ffp-contract=off is always kept).
    tools/check_oracle_flags.py bitwise-verifies a candidate flag set
    against the default build before it is trusted."""
    extra = os.environ.get("HIJIKI_ORACLE_CFLAGS", "").split()
    # reject known value-unsafe flags outright (g++ last-wins semantics
    # would otherwise let them override the safety flags), then append the
    # safety flags AFTER the extras so they win any remaining conflict
    unsafe = {"-ffast-math", "-funsafe-math-optimizations",
              "-fassociative-math", "-freciprocal-math",
              "-ffp-contract=fast", "-ffp-contract=on", "-Ofast"}
    bad = [f for f in extra if f in unsafe]
    if bad:
        raise ValueError(
            f"HIJIKI_ORACLE_CFLAGS contains value-unsafe flags {bad}; the "
            "oracle requires bit-exact f32 semantics")
    return ["-O2"] + extra + ["-fno-fast-math", "-ffp-contract=off"]


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    key = src + b"\0" + " ".join(_cflags()).encode()
    digest = hashlib.sha256(key).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(), "hijiki_tpu_native")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"oracle_native_{digest}.so")


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    so = _so_path()
    try:
        if not os.path.exists(so):
            # pid-suffixed tmp so concurrent first-use builds (pytest workers,
            # a tool + the suite) can't interleave writes to one tmp inode and
            # publish a truncated .so; os.replace is atomic per builder
            tmp = f"{so}.tmp.{os.getpid()}"
            subprocess.run(
                ["g++", *_cflags(), "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        c_i32 = ctypes.c_int32
        lib.hijiki_oracle_render.restype = None
        lib.hijiki_oracle_render.argtypes = [
            f32p, f32p, f32p,            # prim_a/b/c
            i32p, i32p, i32p,            # prim_kind/shape_id/tri
            c_i32, c_i32, c_i32,         # num_prims, kind_sphere, kind_tri
            u32p,                        # materials
            f32p, f32p, f32p,            # vtx pos/nrm/uv
            f32p, f32p, i32p, c_i32,     # emitter cdf/pdf/shape, n
            c_i32, c_i32,                # num_spheres, num_quads
            f32p, f32p, f32p, f32p,      # sphere_pr, quad o/e1/e2
            i32p,                        # tri_indices
            f32p, f32p, f32p, f32p,      # diffuse, cb1, cb2, cb_scale
            f32p, f32p,                  # emissive_power, dielectric
            c_i32, c_i32, c_i32, c_i32, c_i32, c_i32,  # tag consts
            f64p,                        # cam8
            c_i32, c_i32, c_i32,         # W, H, max_bounces
            u32p, f32p, c_i32,           # seeds, offsets, n_sweeps
            f64p,                        # acc
        ]
        _lib = lib
        return _lib
    except Exception:
        _load_failed = True
        return None


def render_oracle_native(
    cs,
    seeds: np.ndarray,    # (n_sweeps, W*H) u32 per-pixel seeds
    offsets: np.ndarray,  # (n_sweeps, 2) f32 sweep jitter
    width: int,
    height: int,
    max_bounces: int = 1000,
    acc: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Accumulate n_sweeps oracle sweeps into (H, W, 3) float64 radiance
    (divide by total sweeps for the mean film). ``cs`` is a host-side
    CompiledScene. Raises RuntimeError if the native library is
    unavailable."""
    from hijiki_tpu.scene.compile import KIND_SPHERE, KIND_TRIANGLE
    from hijiki_tpu.scene.model import (
        MATERIAL_TAG_SHIFT,
        TAG_DIELECTRIC,
        TAG_DIFFUSE,
        TAG_DIFFUSECBOARD,
        TAG_EMISSIVE,
        TAG_MIRROR,
    )

    lib = load_library()
    if lib is None:
        raise RuntimeError("native oracle unavailable (g++ build failed)")

    def f32c(x):
        return np.ascontiguousarray(np.asarray(x), np.float32)

    def i32c(x):
        return np.ascontiguousarray(np.asarray(x), np.int32)

    seeds = np.ascontiguousarray(seeds, np.uint32).reshape(-1, width * height)
    offsets = np.ascontiguousarray(offsets, np.float32).reshape(-1, 2)
    n_sweeps = seeds.shape[0]
    assert offsets.shape[0] == n_sweeps
    if acc is None:
        acc = np.zeros((height, width, 3), np.float64)
    assert acc.shape == (height, width, 3) and acc.dtype == np.float64

    lib.hijiki_oracle_render(
        f32c(cs.prim_a), f32c(cs.prim_b), f32c(cs.prim_c),
        i32c(cs.prim_kind), i32c(cs.prim_shape_id), i32c(cs.prim_tri),
        int(cs.num_prims), int(KIND_SPHERE), int(KIND_TRIANGLE),
        np.ascontiguousarray(np.asarray(cs.materials), np.uint32),
        f32c(cs.vtx_positions), f32c(cs.vtx_normals), f32c(cs.vtx_uvs),
        f32c(cs.emitter_cdf), f32c(cs.emitter_pdf), i32c(cs.emitter_shape),
        int(cs.num_emitters), int(cs.num_spheres), int(cs.num_quads),
        f32c(cs.sphere_pos_radius), f32c(cs.quad_origin),
        f32c(cs.quad_edge1), f32c(cs.quad_edge2), i32c(cs.tri_indices),
        f32c(cs.diffuse_color), f32c(cs.cb_color1), f32c(cs.cb_color2),
        f32c(cs.cb_scale), f32c(cs.emissive_power),
        f32c(cs.dielectric_ext_eta),
        int(MATERIAL_TAG_SHIFT), int(TAG_DIFFUSE), int(TAG_MIRROR),
        int(TAG_DIELECTRIC), int(TAG_EMISSIVE), int(TAG_DIFFUSECBOARD),
        np.ascontiguousarray(np.asarray(cs.camera_static), np.float64),
        int(width), int(height), int(max_bounces),
        seeds, offsets, int(n_sweeps),
        acc,
    )
    return acc
