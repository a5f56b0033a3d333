"""Dump the lowered module text + persistent-cache key inputs for
render_sweeps_chained, to diagnose the unstable-cache-key warmup (round 4:
back-to-back bench.py runs MISS on 'jit_render_sweeps_chained' every time,
so the 850 s cold compile repeats despite the round-3 persistent cache).

Run twice in separate processes and diff the outputs:

  PYTHONPATH=/root/.axon_site:/root/repo python tools/dump_chained_hlo.py /tmp/hlo_a.txt
  PYTHONPATH=/root/.axon_site:/root/repo python tools/dump_chained_hlo.py /tmp/hlo_b.txt
  diff /tmp/hlo_a.txt /tmp/hlo_b.txt | head

Whatever differs is what poisons the cache key (the key is a hash of the
serialized module + compile options + versions).
"""

import sys

from hijiki_tpu.utils.tpuenv import configure_tpu_env

configure_tpu_env()

import jax

from hijiki_tpu.render.renderer import RenderConfig, Renderer, render_sweeps_chained
from hijiki_tpu.scene.compile import compile_scene, scene_to_device
from hijiki_tpu.scene.obj import load_obj_scene


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hlo_dump.txt"
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    nsweeps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    scene = load_obj_scene("/root/reference/scenes/cbox/cbox.obj")
    scene.put_cbox_spheres()
    compiled = scene_to_device(compile_scene(scene))
    cfg = RenderConfig(width=side, height=side, spp=nsweeps, seed=0,
                       driver="mega", max_bounces=1000, block_size=128)
    r = Renderer(compiled, cfg)
    # mirror the Renderer's chained-call statics (renderer.render's call)
    import jax.numpy as jnp
    import numpy as np

    sched = r.scheduler
    ss = [sched.sweep(i) for i in range(nsweeps)]
    block_seeds = jnp.asarray(
        np.stack([np.asarray(s.block_seeds) for s in ss])
    )
    sample_offsets = jnp.asarray(
        np.stack([np.asarray(s.sample_offset, np.float32) for s in ss])
    )
    k = r._sweep_kwargs()
    lowered = render_sweeps_chained.lower(
        compiled, block_seeds, sample_offsets,
        width=cfg.width, height=cfg.height, block_size=cfg.block_size,
        max_bounces=cfg.max_bounces, stddev=cfg.reconstruction_stddev,
        mega_packet=k["mega_packet"], mega_groups=k["mega_groups"],
        mega_table_hbm=k["mega_table_hbm"],
        mega_spec_resolve=k["mega_spec_resolve"],
        mega_trunk=k["mega_trunk"], phase_shrink=k["phase_shrink"],
        interpret=k["interpret"],
    )
    txt = lowered.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"{out}: {len(txt)} chars, {txt.count(chr(10))} lines")

    # the persistent-cache key inputs: module (above), devices, compile
    # options, backend. Print the key and the full options debug string so
    # two processes can be diffed when the module text is identical.
    import logging

    from jax._src import cache_key, compiler

    lg = logging.getLogger("jax._src.cache_key")
    lg.setLevel(logging.DEBUG)
    h = logging.FileHandler(out + ".keylog", mode="w")
    h.setFormatter(logging.Formatter("%(message)s"))
    lg.addHandler(h)
    lg.propagate = False

    backend = jax.devices()[0].client
    devs = np.array([[jax.devices()[0]]])
    opts = compiler.get_compile_options(
        num_replicas=1, num_partitions=1, device_assignment=devs
    )
    key = cache_key.get(
        lowered._lowering.stablehlo(), devs, opts, backend
    )
    print(f"cache key: {key}")
    with open(out + ".opts", "w") as f:
        f.write(str(opts.executable_build_options))
        f.write("\n")
        f.write(
            "env_option_overrides="
            + repr(sorted(opts.env_option_overrides))
            + "\n"
        )
        f.write(f"backend platform_version={backend.platform_version!r}\n")
        f.write(f"jax {jax.__version__}\n")


if __name__ == "__main__":
    main()
