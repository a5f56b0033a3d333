"""Persistent XLA compilation cache.

The reference recompiles its GLSL in well under a second (shaderc,
src/main.rs:715-751); XLA/Mosaic compiles of the megakernel run 10-60s on
this stack. Enabling jax's persistent compilation cache makes every repeat
invocation (same shapes/scene-statics) start instantly.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compile cache.

    Resolution: explicit arg > $HIJIKI_TPU_CACHE_DIR > ~/.cache/hijiki_tpu/xla.
    Set HIJIKI_TPU_CACHE_DIR= (empty) to disable. Returns the directory used
    (or None when disabled/unsupported).
    """
    if path is None:
        path = os.environ.get(
            "HIJIKI_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "hijiki_tpu", "xla"),
        )
    if not path:
        return None
    try:
        import jax

        # TPU-only: the cache exists for the 10-60s Mosaic/tunnel compiles.
        # CPU compiles are fast, and XLA:CPU's AOT executable loader is the
        # one that deserializes cached entries — it warns on machine-feature
        # drift ("+prefer-no-scatter ... could lead to execution errors such
        # as SIGILL") and has segfaulted the test suite mid-cache-read
        # (round 3). A CLI --platform cpu run or the pytest suite (a CLI e2e
        # test calls main(), which lands here) therefore runs uncached.
        if jax.default_backend() != "tpu":
            return None
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # very old jax or read-only fs: run uncached
        return None
    return path
