"""Probe the megakernel's real VMEM table ceiling on this chip.

MEGA_TABLE_LIMIT_BYTES (24 MB) was measured under the default 16 MiB Mosaic
scoped-VMEM limit; utils/tpuenv.py now raises that. This compiles+runs the
megakernel against synthetic N-triangle scenes of growing table size and
reports which sizes work and their speed, so the renderer's fallback
threshold tracks reality.

Usage: python tools/bigscene_probe.py [num_tris ...] (default 50k 150k 400k)
"""

import sys
import time

import numpy as np

from hijiki_tpu.utils.tpuenv import configure_tpu_env

configure_tpu_env()
from hijiki_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from hijiki_tpu.ops.pallas_megakernel import MEGA_PACKET_TPU, render_waves
from hijiki_tpu.scene.compile import compile_scene, scene_to_device
from hijiki_tpu.scene.model import Camera, Diffuse, Emissive, Quad, Scene, Triangle

W = H = 512


def tri_soup_scene(n_tris: int, seed: int = 7) -> Scene:
    """A box of random small triangles under one area light."""
    rng = np.random.default_rng(seed)
    sc = Scene(camera=Camera.cbox_default())
    sc.add_material(Diffuse((0.65, 0.65, 0.65)))
    sc.add_material(Emissive((15.0, 15.0, 15.0)))
    centers = rng.uniform([-1.2, 0.0, -1.2], [1.2, 2.0, 1.2], (n_tris, 3))
    d1 = rng.normal(0, 0.03, (n_tris, 3))
    d2 = rng.normal(0, 0.03, (n_tris, 3))
    v0 = centers - d1
    v1 = centers + d1
    v2 = centers + d2
    pos = np.concatenate([v0, v1, v2], axis=1).reshape(-1, 3).astype(np.float32)
    nrm = np.cross(v1 - v0, v2 - v0)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    sc.positions = pos
    sc.normals = np.repeat(nrm, 3, axis=0).astype(np.float32)
    sc.uvs = np.zeros((3 * n_tris, 2), np.float32)
    for i in range(n_tris):
        sc.add_object(Triangle((3 * i, 3 * i + 1, 3 * i + 2)), 0)
    sc.add_object(
        Quad(
            origin=(-0.5, 2.2, -0.5), edge1=(1.0, 0.0, 0.0), edge2=(0.0, 0.0, 1.0)
        ),
        1,
    )
    return sc


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 150_000, 400_000]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(np.uint32)
    )

    for n in sizes:
        t0 = time.monotonic()
        cs = compile_scene(tri_soup_scene(n))
        mb = cs.trace_rows_mega.nbytes >> 20
        print(
            f"n={n}: compile {time.monotonic()-t0:.1f}s, "
            f"{cs.trace_rows_mega.shape[0]} rows, {mb} MB, "
            f"ntab={cs.mega_num_tables_static}",
            file=sys.stderr,
        )
        csd = scene_to_device(cs)
        from hijiki_tpu.render.renderer import MEGA_TABLE_LIMIT_BYTES

        hbm = cs.trace_rows_mega.nbytes > MEGA_TABLE_LIMIT_BYTES
        try:
            t0 = time.monotonic()
            t, *_ = render_waves(
                csd, px, py, seeds, width=W, height=H, max_bounces=16,
                packet=MEGA_PACKET_TPU, table_in_hbm=hbm,
            )
            s = float(jnp.sum(t))
            warm = time.monotonic() - t0
            t0 = time.monotonic()
            t, *_ = render_waves(
                csd, px, py, seeds, width=W, height=H, max_bounces=16,
                packet=MEGA_PACKET_TPU, table_in_hbm=hbm,
            )
            s = float(jnp.sum(t))
            dt = time.monotonic() - t0
            print(
                f"n={n} ({mb} MB, hbm={hbm}): OK  warm {warm:.1f}s  "
                f"run {dt*1e3:.0f} ms  sum={s:.1f}"
            )
        except Exception as e:
            print(f"n={n} ({mb} MB, hbm={hbm}): FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
