"""AOT executable cache: serialize compiled TPU executables to disk.

Round-4 verdict item 3 (the warmup ritual). The persistent XLA compile
cache's key for the chained megakernel executable depends on in-process
compile *history* (docs/PERF_NOTES.md §10: cache hits change which small ops
compile before it, shifting MLIR name-counter state into the canonicalized
module), so a fresh process only hits after 1-2 priming runs reach the fixed
point — a cold start costs minutes through the axon tunnel even with a warm
disk cache.

This layer sidesteps XLA's key entirely: the *compiled executable* is
serialized with ``jax.experimental.serialize_executable`` and stored under
OUR OWN deterministic fingerprint — jax/jaxlib + platform versions, device
kind + count, the function tag, the resolved static kwargs, and the input
avals including the full CompiledScene treedef (whose aux data carries every
scene-static bake, so two scenes that would compile differently can never
share a key). A fresh process with a warm AOT cache deserializes and runs in
~0.1 s (measured cross-process on the v5e) with zero dependence on what else
compiled first.

The reference's analog is shaderc's per-scene GLSL compile + wgpu pipeline
cache (/root/reference/src/main.rs:715-751); this is the TPU equivalent of
shipping the SPIR-V instead of recompiling the GLSL.

Safety: entries are validated by fingerprint only — any env drift (jax
upgrade, different device kind, changed statics) changes the key; a failed
deserialize falls back to the normal jit path and removes the bad entry.
Set HIJIKI_TPU_AOT_DIR= (empty) or HIJIKI_AOT=0 to disable.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile

# in-process: fingerprint -> loaded/compiled executable
_executables: dict = {}
# instrumentation for bench.py (mirrors the persistent-cache counters)
stats = {"hits_disk": 0, "hits_mem": 0, "misses": 0, "errors": 0}


def cache_dir() -> str | None:
    d = os.environ.get(
        "HIJIKI_TPU_AOT_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "hijiki_tpu", "exec"),
    )
    if not d or os.environ.get("HIJIKI_AOT", "1") in ("0", "false"):
        return None
    return d


def _leaf_sig(x) -> str:
    shape = tuple(getattr(x, "shape", ()))
    dtype = str(getattr(x, "dtype", type(x).__name__))
    return f"{shape}:{dtype}"


def fingerprint(
    tag: str, args: tuple, static_kwargs: dict, key_extra: dict | None = None
) -> str:
    """Deterministic key covering everything that shapes the executable."""
    import jax

    d = jax.devices()[0]
    try:
        pv = jax.extend.backend.get_backend().platform_version
    except Exception:
        pv = "?"
    try:
        import jaxlib

        jaxlib_v = getattr(jaxlib, "__version__", "?")
    except Exception:
        jaxlib_v = "?"
    parts = [
        "v1",  # salt: bump to invalidate all entries on format changes
        tag,
        jax.__version__,
        jaxlib_v,
        d.platform,
        getattr(d, "device_kind", "?"),
        str(len(jax.devices())),
        str(pv),
        repr(sorted(static_kwargs.items())),
        repr(sorted((key_extra or {}).items())),
    ]
    for a in args:
        leaves, treedef = jax.tree_util.tree_flatten(a)
        # str(treedef) includes register_dataclass aux data — i.e. every
        # static scene bake (camera/emitter/material/analytic immediates,
        # table formats) that specializes the kernel
        parts.append(str(treedef))
        parts.extend(_leaf_sig(x) for x in leaves)
    return hashlib.sha256("\x1f".join(parts).encode()).hexdigest()[:32]


def aot_call(
    jitted,
    args: tuple,
    static_kwargs: dict,
    tag: str,
    key_extra: dict | None = None,
):
    """Call ``jitted(*args, **static_kwargs)`` through the executable cache.

    Bypasses (plain jit call) when: not on TPU, interpret mode, or disabled.
    On miss: lower+compile (deterministic isolated trace), serialize the
    executable to disk (atomic rename), keep it loaded in-process.
    ``key_extra``: statics that specialize the computation but are baked in
    the callee's CLOSURE rather than passed as kwargs (the sharded mega
    sweep) — hashed into the fingerprint only.
    """
    import jax

    directory = cache_dir()
    if (
        directory is None
        or static_kwargs.get("interpret")
        or jax.default_backend() != "tpu"
    ):
        return jitted(*args, **static_kwargs)

    key = fingerprint(tag, args, static_kwargs, key_extra)
    exe = _executables.get(key)
    if exe is not None:
        stats["hits_mem"] += 1
        return exe(*args)

    path = os.path.join(directory, f"{tag}-{key}.exec")
    if os.path.exists(path):
        try:
            from jax.experimental import serialize_executable as se

            with open(path, "rb") as f:
                blob, in_tree, out_tree = pickle.load(f)
            exe = se.deserialize_and_load(blob, in_tree, out_tree)
            out = exe(*args)  # executes before we commit to the entry
            _executables[key] = exe
            stats["hits_disk"] += 1
            return out
        except Exception:
            stats["errors"] += 1
            try:
                os.remove(path)
            except OSError:
                pass

    stats["misses"] += 1
    exe = jitted.lower(*args, **static_kwargs).compile()
    _executables[key] = exe
    try:
        from jax.experimental import serialize_executable as se

        blob, in_tree, out_tree = se.serialize(exe)
        os.makedirs(directory, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump((blob, in_tree, out_tree), f)
        os.replace(tmp, path)
    except Exception:
        stats["errors"] += 1
    return exe(*args)
