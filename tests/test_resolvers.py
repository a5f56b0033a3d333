"""Config resolvers (render/renderer.py): auto defaults, env overrides,
validation, and chunk-size economics — pure logic, no device."""

import pytest

from hijiki_tpu.render.renderer import (
    RenderConfig,
    chain_chunk_size,
    resolve_chain_sweeps,
    resolve_mega_packet,
)

# fast per-commit gate tier (README: python -m pytest tests -m quick)
pytestmark = pytest.mark.quick


def test_chain_chunk_divides_spp():
    # multiples of the chain use it unchanged
    assert chain_chunk_size(64, 8) == 8
    assert chain_chunk_size(8, 8) == 8
    # a divisor in [chain/2, chain] avoids the tail-chunk recompile
    assert chain_chunk_size(100, 8) == 5
    assert chain_chunk_size(12, 8) == 6
    assert chain_chunk_size(10, 8) == 5
    assert chain_chunk_size(28, 8) == 7
    # no divisor in range: accept the tail recompile
    assert chain_chunk_size(97, 8) == 8
    assert chain_chunk_size(9, 8) == 8
    # degenerate inputs stay sane
    assert chain_chunk_size(0, 8) == 8
    assert chain_chunk_size(1, 8) == 8


def test_chain_requires_eligible_config():
    cfg = RenderConfig(driver="sync", chain_sweeps=4)
    with pytest.raises(ValueError, match="chain_sweeps"):
        resolve_chain_sweeps(cfg, table_hbm=False)
    # explicit chain=1 (off) is always allowed
    assert resolve_chain_sweeps(
        RenderConfig(driver="sync", chain_sweeps=1), table_hbm=False
    ) == 1
    # auto on CPU / HBM tables: off
    assert resolve_chain_sweeps(RenderConfig(driver="mega"), table_hbm=True) == 1


def test_chain_env_override(monkeypatch):
    monkeypatch.setenv("HIJIKI_CHAIN_SWEEPS", "3")
    assert resolve_chain_sweeps(RenderConfig(driver="mega"), table_hbm=False) == 3
    monkeypatch.setenv("HIJIKI_CHAIN_SWEEPS", "2")
    with pytest.raises(ValueError):
        resolve_chain_sweeps(RenderConfig(driver="sync"), table_hbm=False)


def test_mega_packet_sort_lanes_pin():
    # sort-lanes needs one-VREG packets; explicit wider must fail early
    with pytest.raises(ValueError, match="sort_lanes"):
        resolve_mega_packet(1024, sort_lanes=True)
    assert resolve_mega_packet(0, sort_lanes=True) == 128
    assert resolve_mega_packet(256) == 256


def test_resolve_spec_resolve(monkeypatch):
    from hijiki_tpu.render.renderer import resolve_spec_resolve

    monkeypatch.delenv("HIJIKI_SPEC_RESOLVE", raising=False)
    # auto: ON for HBM tables (1.028x, ab_resolve r3), OFF for VMEM (0.989x)
    assert resolve_spec_resolve(0) is False
    assert resolve_spec_resolve(0, table_hbm=True) is True
    assert resolve_spec_resolve(1) is True
    assert resolve_spec_resolve(-1) is False
    assert resolve_spec_resolve(-1, table_hbm=True) is False
    monkeypatch.setenv("HIJIKI_SPEC_RESOLVE", "1")
    assert resolve_spec_resolve(0) is True
    assert resolve_spec_resolve(-1) is False  # explicit beats env
