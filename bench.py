"""Benchmark harness: cbox @ 1024^2 on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
metric is primary Mrays/s/chip (the reference's own rays/s definition,
src/main.rs:1490-1492: width*height*spp / wall-clock) and the baseline is the
BASELINE.json north-star target of 100 Mrays/s/chip.

Extra diagnostics go to stderr so stdout stays a single JSON line.
"""

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from hijiki_tpu.render.renderer import RenderConfig, Renderer, render_sweep
    from hijiki_tpu.scene.compile import compile_scene
    from hijiki_tpu.scene.obj import load_obj_scene

    W = H = 1024
    warmup_sweeps = 1
    timed_sweeps = 4

    log(f"devices: {jax.devices()}")
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    compiled = compile_scene(scene)
    cfg = RenderConfig(
        width=W,
        height=H,
        spp=warmup_sweeps + timed_sweeps,
        block_size=128,
        seed=0,
        use_bvh=True,
        max_bounces=1000,
    )
    r = Renderer(compiled, cfg)
    kwargs = r._sweep_kwargs()

    # warmup (compile)
    t0 = time.monotonic()
    for s in range(warmup_sweeps):
        sched = r.scheduler.sweep(s)
        delta, _ = render_sweep(
            r.scene,
            jnp.asarray(sched.block_seeds),
            jnp.asarray(sched.sample_offset),
            **kwargs,
        )
        r.film = r.film + delta
    r.film.block_until_ready()
    log(f"warmup (incl. compile): {time.monotonic()-t0:.2f}s")

    t0 = time.monotonic()
    for s in range(warmup_sweeps, warmup_sweeps + timed_sweeps):
        sched = r.scheduler.sweep(s)
        delta, _ = render_sweep(
            r.scene,
            jnp.asarray(sched.block_seeds),
            jnp.asarray(sched.sample_offset),
            **kwargs,
        )
        r.film = r.film + delta
    r.film.block_until_ready()
    elapsed = time.monotonic() - t0

    primary = W * H * timed_sweeps
    mrays = primary / elapsed / 1e6
    img = r.image()
    log(f"timed: {timed_sweeps} sweeps in {elapsed:.3f}s -> {mrays:.2f} Mrays/s")
    log(f"image mean {float(img.mean()):.4f} (finite={bool((img == img).all())})")

    print(
        json.dumps(
            {
                "metric": "primary Mrays/s/chip, cbox 1024^2 (+spheres), BVH, full path trace",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
