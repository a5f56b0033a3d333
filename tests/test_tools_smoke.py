"""Glue smoke for the on-chip A/B tools (tools/ab_*.py): the kernels they
time are covered by interpret-mode tests, but the tools themselves only run
on the real chip — a trivial glue bug (bad kwarg, renamed constant) would
waste a scarce tunnel-recovery window (tools/onchip_queue.sh). Stub
render_waves with a signature-validating fake so each tool's full main()
runs in seconds: arg parsing, scene compile at every format, the A/B loop,
and the render_waves call contract."""

import importlib
import inspect
import os
import sys

import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture()
def stubbed(monkeypatch):
    import hijiki_tpu.ops.pallas_megakernel as mk

    real_sig = inspect.signature(mk.render_waves)

    def stub(cs, px, py, seeds, **kw):
        real_sig.bind(cs, px, py, seeds, **kw)  # kwargs must fit the real API
        n = px.shape[0]
        z3, z = jnp.zeros((n, 3)), jnp.zeros((n,))
        zero = jnp.zeros(())
        return (z3, z3, z, seeds, zero, zero, zero, z3)

    def patch(mod_name, argv):
        m = importlib.import_module(mod_name)
        importlib.reload(m)
        monkeypatch.setattr(m, "render_waves", stub)
        monkeypatch.setattr(m, "REPS", 1)
        monkeypatch.setattr(sys, "argv", ["x"] + argv)
        return m

    return patch


@pytest.mark.parametrize(
    "mod, argv",
    [
        ("ab_packedleaf", ["0", "1", "3"]),  # the queued VMEM-format A/B
        ("ab_packedleaf", ["--scene=/root/reference/scenes/cbox/cbox.obj",
                           "--hbm", "0", "4", "12"]),
        ("ab_hbmgroups", ["--scene=/root/reference/scenes/cbox/cbox.obj",
                          "1", "2", "4", "8"]),
        ("ab_resolve", ["64", "1024", "4", "0"]),
        ("ab_resolve", ["--hbm", "64", "1024", "4", "12"]),
        ("ab_trunk", ["--scene=/root/reference/scenes/cbox/cbox.obj",
                      "0", "-1", "64"]),
        ("ab_trunk", ["--scene=/root/reference/scenes/cbox/cbox.obj",
                      "--groups=2", "--packed=0", "0", "-1"]),
    ],
)
def test_ab_tool_glue(stubbed, mod, argv):
    stubbed(mod, argv).main()
