"""The driver's graded entry points must work as-shipped: entry() must be
jittable and dryrun_multichip must guarantee its own virtual CPU mesh (the
round-1 artifact failed because the entry point let a broken TPU backend
initialize — VERDICT.md Weak #1)."""

import sys


def test_dryrun_multichip_runs_in_process():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__

        # conftest already pinned an 8-device CPU mesh; _force_cpu_mesh must
        # detect that and run inline (not spawn a subprocess)
        assert __graft_entry__._force_cpu_mesh(8)
        __graft_entry__.dryrun_multichip(8)
    finally:
        sys.path.remove("/root/repo")


def test_entry_traces():
    sys.path.insert(0, "/root/repo")
    try:
        import jax

        import __graft_entry__

        fn, args = __graft_entry__.entry()
        jax.jit(fn).lower(*args)  # trace + lower only (compile is covered by
        # the driver's single-chip check)
    finally:
        sys.path.remove("/root/repo")


def test_tpu_available_respects_cpu_pin():
    """The bounded TPU probe (utils/tpuenv.tpu_available) must short-circuit
    False under a JAX_PLATFORMS=cpu pin (the test env) without spawning a
    subprocess — entry()/bench.py rely on it to avoid the wedged-tunnel
    25-min backend-init hang (PERF_NOTES §9i)."""
    import time

    from hijiki_tpu.utils.tpuenv import tpu_available

    t0 = time.monotonic()
    assert tpu_available(timeout=5) is False
    assert time.monotonic() - t0 < 1.0
