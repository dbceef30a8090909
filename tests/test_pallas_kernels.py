"""Pallas kernel tests in interpreter mode (CPU): the TPU kernels must match
the XLA reference paths exactly on integer-valued data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.ops.fused_mlp import fused_mlp
from bitdistiller_tpu.ops.quant_matmul import quant_matmul_pallas, quant_matmul_xla
from bitdistiller_tpu.quant.packing import PackedLinear, pack_codes


def mk_packed(key, k, n, bits, g=128, scale=1.0):
    codes = jax.random.randint(key, (k, n), 0, 2**bits)
    qw = pack_codes(codes, bits, g)
    return (
        PackedLinear(
            qweight=qw,
            scales=jnp.full((k // g, n), scale, jnp.float32),
            szeros=jnp.zeros((k // g, n), jnp.float32),
            bias=None,
            bits=bits,
            group_size=g,
            in_features=k,
            out_features=n,
        ),
        codes,
    )


@pytest.mark.parametrize("bits", [2, 4])
def test_qmm_interpret_exact(bits):
    k, n, m = 512, 256, 8
    p, codes = mk_packed(jax.random.key(0), k, n, bits)
    x = jax.random.randint(jax.random.key(1), (m, k), -3, 4).astype(jnp.float32)
    out = quant_matmul_pallas(x, p, interpret=True)
    want = x @ codes.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=0, rtol=0)


def test_qmm_interpret_with_scales():
    k, n, m = 256, 128, 4
    bits = 2
    codes = jax.random.randint(jax.random.key(0), (k, n), 0, 4)
    qw = pack_codes(codes, bits, 128)
    scales = jax.random.uniform(jax.random.key(1), (k // 128, n), jnp.float32, 0.5, 2.0)
    zeros = jnp.round(jax.random.uniform(jax.random.key(2), (k // 128, n), jnp.float32, 0.0, 3.0))
    p = PackedLinear(qweight=qw, scales=scales, szeros=zeros * scales, bias=None,
                     bits=bits, group_size=128, in_features=k, out_features=n)
    # pre-round x to bf16 so kernel (bf16 MXU inputs) and f32 XLA reference
    # see identical values; remaining diff is accumulation order only
    x = jax.random.normal(jax.random.key(3), (m, k), jnp.float32)
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    out = quant_matmul_pallas(x, p, interpret=True)
    want = quant_matmul_xla(x, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_fused_mlp_interpret_matches_composed():
    k, ffn, d = 256, 512, 256
    gate, gc = mk_packed(jax.random.key(0), k, ffn, 2)
    up, uc = mk_packed(jax.random.key(1), k, ffn, 2)
    down, dc = mk_packed(jax.random.key(2), ffn, d, 2)
    x = jax.random.randint(jax.random.key(3), (4, k), -2, 3).astype(jnp.float32)
    out = fused_mlp(x, gate, up, down, "silu", interpret=True)
    g = x @ gc.astype(jnp.float32)
    u = x @ uc.astype(jnp.float32)
    mid = jax.nn.silu(g) * u
    want = mid @ dc.astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=5e-3, atol=5e-3 * float(jnp.abs(want).max())
    )
