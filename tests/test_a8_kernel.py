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
