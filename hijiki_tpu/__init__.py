"""hijiki-tpu: a TPU-native wavefront path tracer (JAX/XLA/Pallas).

Library quick start::

    from hijiki_tpu import RenderConfig, Renderer, compile_scene, load_preset
    scene = load_preset("cornell-spheres")       # or load_obj_scene(path)
    r = Renderer(compile_scene(scene),
                 RenderConfig(width=512, height=512, spp=64, driver="mega"))
    r.render()
    image = r.image()                            # (H, W, 3) float RGB

The CLI twin: ``python -m hijiki_tpu.cli --help``.
"""

# Before anything that might touch a jax backend: libtpu snapshots its flags
# at init, and the megakernel's wide packets need the raised scoped-VMEM
# limit (utils/tpuenv.py). Library users who `import jax` and initialize a
# backend before importing hijiki_tpu are detected and downgraded to safe
# packet widths in render.renderer.resolve_mega_packet.
from hijiki_tpu.utils.tpuenv import configure_tpu_env as _configure_tpu_env

_configure_tpu_env()

from hijiki_tpu.parallel.multichip import MegaMultiChipRenderer, MultiChipRenderer
from hijiki_tpu.parallel.multihost import MultiHostRenderer
from hijiki_tpu.render.renderer import RenderConfig, Renderer, render_sweep
from hijiki_tpu.scene.compile import CompiledScene, compile_scene
from hijiki_tpu.scene.obj import load_obj_scene
from hijiki_tpu.scene.presets import load_preset

__all__ = [
    "CompiledScene",
    "MegaMultiChipRenderer",
    "MultiChipRenderer",
    "MultiHostRenderer",
    "RenderConfig",
    "Renderer",
    "compile_scene",
    "load_obj_scene",
    "load_preset",
    "render_sweep",
]
