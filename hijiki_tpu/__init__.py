"""hijiki-tpu: a TPU-native (JAX/XLA/Pallas) physically-based wavefront path tracer.

A brand-new implementation of the capabilities of the wgpu/GLSL renderer
``mad-s/hijiki``, re-architected for TPU hardware: rendering is a wavefront of
batched SPMD stages (camera ray generation, ray-BVH traversal, masked BSDF
shading with next-event estimation and Russian roulette) over SoA ray batches,
followed by a bilateral feature-buffer reconstruction filter and progressive
accumulation into a (rgb*weight, weight) framebuffer. Pixels/samples shard
across a ``jax.sharding.Mesh`` with a psum framebuffer reduction over ICI.

The Monte-Carlo estimator (RNG stream, sampling decisions, accumulation math)
matches the reference exactly, so images agree statistically at equal spp.
"""

__version__ = "0.1.0"

from hijiki_tpu.scene.model import (  # noqa: F401
    Camera,
    Scene,
    Material,
    MATERIAL_TAG_SHIFT,
    TAG_DIFFUSE,
    TAG_DIFFUSECBOARD,
    TAG_MIRROR,
    TAG_DIELECTRIC,
    TAG_EMISSIVE,
)
from hijiki_tpu.scene.obj import load_obj_scene  # noqa: F401
from hijiki_tpu.scene.compile import compile_scene, CompiledScene  # noqa: F401
