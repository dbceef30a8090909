"""W2A8 / W4A8 kernel tests (interpret mode): int8-activation path must match
the exact integer reference when activations are already int8-representable."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.ops.quant_matmul import _a8_perm, quant_matmul_a8
from bitdistiller_tpu.quant.packing import PackedLinear, pack_codes


def mk_packed(key, k, n, bits, g=128):
    codes = jax.random.randint(key, (k, n), 0, 2**bits)
    qw = pack_codes(codes, bits, g)
    return (
        PackedLinear(
            qweight=qw,
            scales=jnp.ones((k // g, n), jnp.float32),
            szeros=jnp.zeros((k // g, n), jnp.float32),
            bias=None,
            bits=bits,
            group_size=g,
            in_features=k,
            out_features=n,
        ),
        codes,
    )


def test_a8_perm_is_permutation():
    for bits in (2, 4):
        perm = _a8_perm(bits, 128)
        assert sorted(perm.tolist()) == list(range(128))


@pytest.mark.parametrize("bits", [2, 4])
def test_a8_exact_on_int_inputs(bits):
    k, n, m = 512, 256, 8
    p, codes = mk_packed(jax.random.key(0), k, n, bits)
    # x integer-valued in [-127, 127]: int8 quantization with sx = 127/127=1
    # is exact (max|x| == 127 forced by placing one 127 per row)
    x = jax.random.randint(jax.random.key(1), (m, k), -5, 6).astype(jnp.float32)
    x = x.at[:, 0].set(127.0)
    out = quant_matmul_a8(x, p, interpret=True)
    want = x @ codes.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=0, rtol=0)


def test_a8_with_scales_and_zeros():
    k, n, m = 256, 128, 4
    bits = 2
    codes = jax.random.randint(jax.random.key(0), (k, n), 0, 4)
    qw = pack_codes(codes, bits, 128)
    scales = jax.random.uniform(jax.random.key(1), (k // 128, n), jnp.float32, 0.5, 2.0)
    zeros = jnp.round(jax.random.uniform(jax.random.key(2), (k // 128, n), jnp.float32, 0.0, 3.0))
    p = PackedLinear(qweight=qw, scales=scales, szeros=zeros * scales, bias=None,
                     bits=bits, group_size=128, in_features=k, out_features=n)
    x = jax.random.randint(jax.random.key(3), (m, k), -63, 64).astype(jnp.float32)
    x = x.at[:, 0].set(127.0)
    out = quant_matmul_a8(x, p, interpret=True)
    w = (codes.astype(jnp.float32) - zeros.repeat(128, 0)) * scales.repeat(128, 0)
    want = x @ w
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=5e-4)


def test_a8_close_on_float_inputs():
    """Real activations: per-token int8 quantization error only (~1%)."""
    k, n, m = 512, 256, 8
    p, codes = mk_packed(jax.random.key(0), k, n, 2)
    x = jax.random.normal(jax.random.key(1), (m, k), jnp.float32)
    out = np.asarray(quant_matmul_a8(x, p, interpret=True))
    want = np.asarray(x @ codes.astype(jnp.float32))
    denom = np.abs(want).mean()
    assert np.abs(out - want).mean() / denom < 0.02


def test_a8_repack_matches_unrepacked():
    """Weights repacked into extraction order give bit-identical results
    without the per-call activation permutation."""
    from bitdistiller_tpu.ops.quant_matmul import repack_linear_a8

    for bits in (2, 4):
        k, n, m = 512, 256, 8
        p, codes = mk_packed(jax.random.key(0), k, n, bits)
        x = jax.random.randint(jax.random.key(1), (m, k), -5, 6).astype(jnp.float32)
        x = x.at[:, 0].set(127.0)
        pr = repack_linear_a8(p)
        assert pr.a8_order and not p.a8_order
        out = quant_matmul_a8(x, pr, interpret=True)
        want = x @ codes.astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=0, rtol=0)


def test_a8_repack_guards_pair_layout_paths():
    from bitdistiller_tpu.ops.quant_matmul import (
        quant_matmul_pallas, quant_matmul_xla, repack_linear_a8,
    )
    from bitdistiller_tpu.quant.packing import dequantize_linear

    p, _ = mk_packed(jax.random.key(0), 256, 128, 2)
    pr = repack_linear_a8(p)
    x = jnp.ones((4, 256), jnp.float32)
    for fn in (lambda: quant_matmul_xla(x, pr),
               lambda: quant_matmul_pallas(x, pr, interpret=True),
               lambda: dequantize_linear(pr)):
        with pytest.raises(ValueError):
            fn()


def test_maybe_repack_a8_tree(monkeypatch):
    """Env-gated tree repack hits stacked [L, Kp, N] leaves and is identity when off."""
    from bitdistiller_tpu.ops.quant_matmul import maybe_repack_a8

    p, codes = mk_packed(jax.random.key(0), 256, 128, 2)
    import dataclasses
    stacked = dataclasses.replace(
        p, qweight=jnp.stack([p.qweight, p.qweight]),
        scales=jnp.stack([p.scales, p.scales]),
        szeros=jnp.stack([p.szeros, p.szeros]),
    )
    tree = {"layers": {"qkv": stacked}, "emb": jnp.zeros((4, 4))}
    monkeypatch.delenv("BITDISTILLER_QMM_A8", raising=False)
    assert maybe_repack_a8(tree)["layers"]["qkv"] is stacked
    monkeypatch.setenv("BITDISTILLER_QMM_A8", "1")
    out = maybe_repack_a8(tree)["layers"]["qkv"]
    assert out.a8_order and out.qweight.shape == stacked.qweight.shape
    # layer 0 of the stacked repack == repack of the single layer
    from bitdistiller_tpu.ops.quant_matmul import repack_linear_a8
    np.testing.assert_array_equal(
        np.asarray(out.qweight[0]), np.asarray(repack_linear_a8(p).qweight)
    )
