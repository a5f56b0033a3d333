"""Process-level TPU environment setup. Must run BEFORE jax touches the
backend (libtpu snapshots its flags at initialization; the remote-compile
path adopts the terminal's env at the first compile request)."""

from __future__ import annotations

import os
import sys

# The megakernel's wide packets (ops/pallas_megakernel.MEGA_PACKET_TPU) need
# more Mosaic scoped VMEM than the default 16 MiB at large grids: the v5e
# fused render_sweep at 1024^2 measures a 37 MiB high-water mark. 64 MiB is
# well within the chip's 128 MiB physical VMEM and measured safe end-to-end.
SCOPED_VMEM_KIB = 64 * 1024

# Whether the scoped-VMEM flag was in the env before any jax backend could
# have snapshot it. None = configure_tpu_env never ran.
_configured_before_backend: bool | None = None


def _jax_backend_initialized() -> bool:
    """True if a jax backend has already been created in this process (at
    which point a *local* libtpu has already snapshot LIBTPU_INIT_ARGS)."""
    jax = sys.modules.get("jax")
    if jax is None:
        return False
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:  # pragma: no cover - private-API drift
        return True  # can't tell; be conservative


def configure_tpu_env(scoped_vmem_kib: int = SCOPED_VMEM_KIB) -> None:
    """Raise libtpu's scoped-VMEM limit (idempotent, safe on CPU-only).

    Called at ``hijiki_tpu`` package import (before any renderer code can
    initialize a backend) and defensively from the packet resolver. Records
    whether it ran early enough for a local libtpu to see the flag; the
    remote-compile tunnel re-forwards env flags per compile, so lateness only
    matters for local TPU runtimes (see scoped_vmem_effective)."""
    global _configured_before_backend
    args = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "--xla_tpu_scoped_vmem_limit_kib" not in args:
        early = not _jax_backend_initialized()
        os.environ["LIBTPU_INIT_ARGS"] = (
            f"{args} --xla_tpu_scoped_vmem_limit_kib={scoped_vmem_kib}".strip()
        )
        if _configured_before_backend is None:
            _configured_before_backend = early
    elif _configured_before_backend is None:
        # flag was already present (user/CLI set it) — trust it
        _configured_before_backend = True


def scoped_vmem_effective() -> bool:
    """Whether the raised scoped-VMEM limit can be assumed active.

    False when configure_tpu_env first ran *after* a jax backend initialized
    in this process (library users importing jax before hijiki_tpu on a local
    TPU runtime): libtpu snapshot the default 16 MiB limit, so wide megakernel
    packets (37 MiB high-water) would fail the Mosaic compile. Callers should
    fall back to 128-lane packets. The axon remote-compile tunnel forwards
    env flags per compile request, making late configuration still effective —
    but that cannot be detected portably, so be conservative."""
    configure_tpu_env()
    return bool(_configured_before_backend)
