"""In-process A/B of megakernel packet widths (HIJIKI_MEGA_PACKET).

The walker is latency-bound (~6 cycles per serially-dependent vector op at
width 128 = one VREG); wider packets make every op a multi-VREG issue whose
halves are independent, so the second issue fills the first's latency bubble
— at the price of larger per-packet row unions. This measures that tradeoff
on cbox(+spheres) 512^2 full path trace.

Usage: python tools/ab_packet.py [widths...]   (default: 128 256 512)
"""

import importlib
import os
import sys
import time

import numpy as np

from hijiki_tpu.utils.tpuenv import configure_tpu_env

configure_tpu_env()
from hijiki_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from hijiki_tpu.scene.compile import compile_scene, scene_to_device
from hijiki_tpu.scene.obj import load_obj_scene

W = H = 512
REPS = 3


def load_mega(packet):
    os.environ["HIJIKI_MEGA_PACKET"] = str(packet)
    sys.modules.pop("hijiki_tpu.ops.pallas_megakernel", None)
    mod = importlib.import_module("hijiki_tpu.ops.pallas_megakernel")
    assert mod.PACKET == packet
    return mod


def main():
    widths = [int(a) for a in sys.argv[1:]] or [128, 256, 512]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    cs = scene_to_device(compile_scene(scene))
    print(f"ntab={cs.mega_num_tables_static} rows={cs.trace_rows_mega.shape[0]}",
          file=sys.stderr)

    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    px = jnp.asarray((x + 0.5).reshape(-1))
    py = jnp.asarray((y + 0.5).reshape(-1))
    seeds = jnp.asarray(
        (np.arange(H * W, dtype=np.uint64) * 2654435761 % (1 << 32)).astype(np.uint32)
    )

    mods = {w: load_mega(w) for w in widths}

    def run(mod):
        t, n, dep, st, ovf, bounces, rows, alb = mod.render_waves(
            cs, px, py, seeds, width=W, height=H, max_bounces=1000
        )
        return float(jnp.sum(t)), float(jnp.sum(rows)) / (8.0 * mod.PACKET)

    for w, mod in mods.items():
        t0 = time.monotonic()
        tot, rows = run(mod)
        print(f"warmup P={w}: {time.monotonic()-t0:.1f}s sum={tot:.1f} "
              f"tile-iters={rows:.0f}", file=sys.stderr)

    times = {w: [] for w in widths}
    iters = {}
    for rep in range(REPS):
        for w, mod in mods.items():
            t0 = time.monotonic()
            tot, rows = run(mod)
            dt = time.monotonic() - t0
            times[w].append(dt)
            iters[w] = rows
            print(f"rep{rep} P={w}: {dt*1e3:.0f} ms sum={tot:.1f}", file=sys.stderr)

    base = min(times[widths[0]])
    for w in widths:
        ts = times[w]
        print(
            f"P={w}: min {min(ts)*1e3:.0f} ms  mean {np.mean(ts)*1e3:.0f} ms  "
            f"packet-iters {iters[w]:.0f}  speedup {base/min(ts):.3f}x"
        )


if __name__ == "__main__":
    main()
