"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is tested without TPUs via
``--xla_force_host_platform_device_count=8`` (the reference offers no
multi-device precedent, so this is net-new; see SURVEY.md §4). Must run
before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize may register a TPU backend and force the
# platform before the env var is read; override at the config level too.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def cbox_scene():
    from hijiki_tpu.scene.obj import load_obj_scene

    return load_obj_scene("/root/reference/scenes/cbox/cbox.obj")


@pytest.fixture(scope="session")
def cbox_compiled(cbox_scene):
    import copy

    from hijiki_tpu.scene.compile import compile_scene, scene_to_device

    scene = copy.deepcopy(cbox_scene)
    scene.put_cbox_spheres()
    return scene_to_device(compile_scene(scene))


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(42)
