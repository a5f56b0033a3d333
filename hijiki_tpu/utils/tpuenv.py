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


def tpu_available(timeout: float = 600.0) -> bool:
    """Bounded TPU availability probe, safe to call BEFORE jax backend init.

    A wedged axon relay hangs backend initialization for ~25 min per attempt
    (docs/PERF_NOTES.md §9i), which would stall any caller that merely wants
    to know whether a TPU exists. Probe in a killable subprocess instead; the
    probe exits before the caller initializes its own backend, so the
    one-client-at-a-time tunnel rule is kept. Returns False on timeout or
    init failure (callers should fall back to JAX_PLATFORMS=cpu), True when a
    non-CPU device answered. Env problems in the subprocess (ImportError) are
    reported as True so the caller surfaces the real error instead of
    silently downgrading to CPU."""
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return False
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    try:
        pr = subprocess.run(
            [
                sys.executable,
                "-c",
                "import hijiki_tpu, jax; "
                "d = jax.devices(); "
                "assert d and d[0].platform != 'cpu', d; "
                "print('tpu-ok')",
            ],
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=repo,
            env=env,
        )
    except subprocess.TimeoutExpired:
        print("tpuenv: TPU probe timed out (wedged tunnel?)", file=sys.stderr)
        return False
    if "tpu-ok" in pr.stdout:
        return True
    err = pr.stderr or ""
    print("tpuenv: TPU probe failed:", err[-400:], file=sys.stderr)
    return "ModuleNotFoundError" in err or "ImportError" in err


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
