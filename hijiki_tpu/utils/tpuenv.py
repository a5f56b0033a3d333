"""Process-level TPU environment setup. Must run BEFORE jax touches the
backend (libtpu snapshots its flags at initialization; the remote-compile
path adopts the terminal's env at the first compile request)."""

from __future__ import annotations

import os

# The megakernel's wide packets (ops/pallas_megakernel.MEGA_PACKET_TPU) need
# more Mosaic scoped VMEM than the default 16 MiB at large grids: the v5e
# fused render_sweep at 1024^2 measures a 37 MiB high-water mark. 64 MiB is
# well within the chip's 128 MiB physical VMEM and measured safe end-to-end.
SCOPED_VMEM_KIB = 64 * 1024


def configure_tpu_env(scoped_vmem_kib: int = SCOPED_VMEM_KIB) -> None:
    """Raise libtpu's scoped-VMEM limit (idempotent, safe on CPU-only)."""
    args = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "--xla_tpu_scoped_vmem_limit_kib" not in args:
        os.environ["LIBTPU_INIT_ARGS"] = (
            f"{args} --xla_tpu_scoped_vmem_limit_kib={scoped_vmem_kib}".strip()
        )
