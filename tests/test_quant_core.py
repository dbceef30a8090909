"""Golden-value tests for the quantization core.

The torch implementations below independently re-state the reference math
(quantization/quantizer.py:25-69, 119-242) so the JAX implementation is
cross-checked against a second framework's numerics, element for element.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from bitdistiller_tpu.quant import (
    dequantize_linear,
    fake_quant_int,
    fake_quant_nf3,
    make_fake_quantizer,
    pack_codes,
    quantize_int,
    quantize_pack_linear,
    unpack_codes,
)
from bitdistiller_tpu.quant.core import (
    NF3_NEG_LEVELS,
    NF3_NEG_THRESHOLDS,
    NF3_POS_LEVELS,
    NF3_POS_THRESHOLDS,
    dequantize_nf3,
    quantize_nf3,
    round_half_away,
    ste_round,
)


def torch_fake_quant_int(w: torch.Tensor, n_bit: int, group_size: int, half_away: bool):
    """Independent restatement of asymmetric group fake-quant in torch."""
    orig = w.shape
    wg = w.reshape(-1, group_size)
    max_val = wg.amax(dim=1, keepdim=True)
    min_val = wg.amin(dim=1, keepdim=True)
    max_int = 2**n_bit - 1
    scales = (max_val - min_val).clamp(min=1e-5) / max_int
    zeros = (-torch.round(min_val / scales)).clamp(0, max_int)
    if half_away:
        q = torch.sign(wg / scales) * torch.floor(torch.abs(wg / scales) + 0.5)
    else:
        q = torch.round(wg / scales)
    out = (torch.clamp(q + zeros, 0, max_int) - zeros) * scales
    return out.reshape(orig)


def torch_fake_quant_nf3(w: torch.Tensor, group_size: int):
    """Independent restatement of the two-scale NF3 codebook in torch."""
    orig = w.shape
    qx = w.reshape(-1, group_size)
    scale_pos = qx.amax(dim=1, keepdim=True).abs()
    scale_neg = qx.amin(dim=1, keepdim=True).abs()
    x_pos = torch.where(qx >= 0, qx, torch.zeros_like(qx))
    x_neg = torch.where(qx < 0, qx, torch.zeros_like(qx))
    q_pos = x_pos / scale_pos
    q_neg = x_neg / scale_neg
    tp, lp = NF3_POS_THRESHOLDS, NF3_POS_LEVELS
    tn, ln = NF3_NEG_THRESHOLDS, NF3_NEG_LEVELS
    r = torch.full_like(q_pos, lp[4])
    r = torch.where(q_pos < tp[3], torch.tensor(lp[3]), r)
    r = torch.where(q_pos < tp[2], torch.tensor(lp[2]), r)
    r = torch.where(q_pos < tp[1], torch.tensor(lp[1]), r)
    r = torch.where(q_pos < tp[0], torch.tensor(lp[0]), r)
    s = torch.full_like(q_neg, ln[0])
    s = torch.where(q_neg >= tn[0], torch.tensor(ln[1]), s)
    s = torch.where(q_neg >= tn[1], torch.tensor(ln[2]), s)
    s = torch.where(q_neg >= tn[2], torch.tensor(ln[3]), s)
    return (r * scale_pos + s * scale_neg).reshape(orig)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("n_bit,group_size", [(2, 64), (2, 128), (3, 128), (4, 128)])
def test_fake_quant_int_matches_torch(rng, n_bit, group_size):
    w = rng.standard_normal((8, 256)).astype(np.float32)
    got = np.asarray(fake_quant_int(jnp.asarray(w), n_bit, group_size))
    want = torch_fake_quant_int(torch.from_numpy(w), n_bit, group_size, half_away=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fake_quant_int_ste_matches_torch_half_away(rng):
    # values exactly at .5 boundaries exercise the rounding-mode difference
    w = np.round(rng.standard_normal((4, 128)) * 4) / 8
    w = w.astype(np.float32)
    got = np.asarray(fake_quant_int(jnp.asarray(w), 2, 64, ste=True))
    want = torch_fake_quant_int(torch.from_numpy(w), 2, 64, half_away=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_round_half_away_vs_half_even():
    x = jnp.asarray([0.5, 1.5, 2.5, -0.5, -1.5, -2.5])
    np.testing.assert_array_equal(
        np.asarray(round_half_away(x)), [1.0, 2.0, 3.0, -1.0, -2.0, -3.0]
    )
    # jnp.round is banker's rounding — the PTQ path
    np.testing.assert_array_equal(np.asarray(jnp.round(x)), [0.0, 2.0, 2.0, -0.0, -2.0, -2.0])


def test_ste_round_gradient_is_identity():
    g = jax.grad(lambda x: jnp.sum(ste_round(x) * 3.0))(jnp.asarray([0.3, 1.7, -2.2]))
    np.testing.assert_allclose(np.asarray(g), [3.0, 3.0, 3.0])


def test_fake_quant_int_ste_gradient_flows(rng):
    w = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    grad = jax.grad(lambda w: jnp.sum(fake_quant_int(w, 2, 64, ste=True) ** 2))(w)
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).sum() > 0


def test_fake_quant_nf3_matches_torch(rng):
    w = rng.standard_normal((8, 256)).astype(np.float32)
    got = np.asarray(fake_quant_nf3(jnp.asarray(w), 128))
    want = torch_fake_quant_nf3(torch.from_numpy(w), 128).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fake_quant_nf3_all_positive_group_no_nan():
    w = jnp.abs(jnp.asarray(np.random.default_rng(1).standard_normal((2, 128)), dtype=jnp.float32))
    out = fake_quant_nf3(w, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_fake_quant_nf3_ste_gradient(rng):
    w = jnp.asarray(rng.standard_normal((2, 128)).astype(np.float32))
    g = jax.grad(lambda w: jnp.sum(fake_quant_nf3(w, 128, ste=True)))(w)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_quantize_int_codes_in_range(rng):
    w = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    q, params = quantize_int(w, 2, 128)
    assert q.dtype == jnp.int32
    assert int(q.min()) >= 0 and int(q.max()) <= 3


def test_nf3_roundtrip_matches_fake_quant(rng):
    w = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    codes, sp, sn = quantize_nf3(w, 128)
    deq = dequantize_nf3(codes, sp, sn, w.shape)
    fq = fake_quant_nf3(w, 128, ste=False)
    np.testing.assert_allclose(np.asarray(deq), np.asarray(fq), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("bits", [2, 4])
def test_pack_unpack_roundtrip(rng, bits):
    k, n = 128, 64
    codes = rng.integers(0, 2**bits, size=(k, n)).astype(np.int32)
    packed = pack_codes(jnp.asarray(codes), bits)
    assert packed.shape == (k // (32 // bits), n)
    out = np.asarray(unpack_codes(packed, bits))
    np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("bits", [2, 4])
def test_packed_linear_dequant_matches_fake_quant(rng, bits):
    k, n = 256, 32
    w = rng.standard_normal((k, n)).astype(np.float32)
    p = quantize_pack_linear(jnp.asarray(w), bits, 128)
    deq = np.asarray(dequantize_linear(p))
    # fake_quant groups along the last axis of [N, K]; packed groups along K of
    # [K, N] — identical group contents, so results must match transposed.
    want = np.asarray(fake_quant_int(jnp.asarray(w.T), bits, 128)).T
    np.testing.assert_allclose(deq, want, rtol=1e-5, atol=1e-5)


def test_make_fake_quantizer_registry():
    w = jnp.ones((2, 128))
    for name in ["int2-asym", "int3-asym", "ste-n2f3", "nf3", "int2", "int3"]:
        fn = make_fake_quantizer(name, 128)
        assert fn(w).shape == w.shape
    for bogus in ["bogus", "int"]:
        with pytest.raises(ValueError):
            make_fake_quantizer(bogus)


def test_ptq_registry_names_use_bankers_rounding(rng):
    """'int2' (PTQ/eval) must reproduce torch.round semantics; 'int2-asym'
    (QAT) rounds half-away — the reference's pseudo_quantize vs Ste split."""
    w = rng.standard_normal((4, 128)).astype(np.float32)
    got = np.asarray(make_fake_quantizer("int2", 64)(jnp.asarray(w)))
    want = torch_fake_quant_int(torch.from_numpy(w), 2, 64, half_away=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# STE gradient parity vs torch autograd (reference quantizers do NOT detach
# amax/amin — gradients flow through the per-group scale path,
# quantizer.py:132-137, 196-204)
# ---------------------------------------------------------------------------


def test_fake_quant_int_ste_gradient_matches_torch(rng):
    w_np = rng.standard_normal((4, 128)).astype(np.float32)
    co_np = rng.standard_normal((4, 128)).astype(np.float32)  # cotangent

    g_jax = jax.grad(
        lambda w: jnp.sum(fake_quant_int(w, 2, 64, ste=True) * jnp.asarray(co_np))
    )(jnp.asarray(w_np))

    class _Round(torch.autograd.Function):
        @staticmethod
        def forward(ctx, x):
            return torch.sign(x) * torch.floor(torch.abs(x) + 0.5)

        @staticmethod
        def backward(ctx, g):
            return g

    wt = torch.from_numpy(w_np).requires_grad_(True)
    wg = wt.reshape(-1, 64)
    max_val = wg.amax(dim=1, keepdim=True)
    min_val = wg.amin(dim=1, keepdim=True)
    scales = (max_val - min_val).clamp(min=1e-5) / 3
    zeros = (-torch.round(min_val / scales)).clamp(0, 3)
    out = (torch.clamp(_Round.apply(wg / scales) + zeros, 0, 3) - zeros) * scales
    (out.reshape(4, 128) * torch.from_numpy(co_np)).sum().backward()
    np.testing.assert_allclose(np.asarray(g_jax), wt.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_fake_quant_nf3_ste_gradient_matches_torch(rng):
    w_np = rng.standard_normal((2, 128)).astype(np.float32)
    co_np = rng.standard_normal((2, 128)).astype(np.float32)

    g_jax = jax.grad(
        lambda w: jnp.sum(fake_quant_nf3(w, 128, ste=True) * jnp.asarray(co_np))
    )(jnp.asarray(w_np))

    wt = torch.from_numpy(w_np).requires_grad_(True)
    qx = wt.reshape(-1, 128)
    scale_pos = qx.amax(dim=1, keepdim=True).abs()
    scale_neg = qx.amin(dim=1, keepdim=True).abs()
    x_pos = torch.where(qx >= 0, qx, torch.zeros_like(qx))
    x_neg = torch.where(qx < 0, qx, torch.zeros_like(qx))
    q_pos = x_pos / scale_pos
    q_neg = x_neg / scale_neg
    with torch.no_grad():
        r_pos = torch_fake_quant_nf3_pos(q_pos)
        r_neg = torch_fake_quant_nf3_neg(q_neg)
    y_pos = (r_pos - q_pos).detach() + q_pos  # detach-trick STE
    y_neg = (r_neg - q_neg).detach() + q_neg
    out = y_pos * scale_pos + y_neg * scale_neg
    (out.reshape(2, 128) * torch.from_numpy(co_np)).sum().backward()
    np.testing.assert_allclose(np.asarray(g_jax), wt.grad.numpy(), rtol=1e-4, atol=1e-5)


def torch_fake_quant_nf3_pos(q_pos):
    tp, lp = NF3_POS_THRESHOLDS, NF3_POS_LEVELS
    r = torch.full_like(q_pos, lp[4])
    r = torch.where(q_pos < tp[3], torch.tensor(lp[3]), r)
    r = torch.where(q_pos < tp[2], torch.tensor(lp[2]), r)
    r = torch.where(q_pos < tp[1], torch.tensor(lp[1]), r)
    r = torch.where(q_pos < tp[0], torch.tensor(lp[0]), r)
    return r


def torch_fake_quant_nf3_neg(q_neg):
    tn, ln = NF3_NEG_THRESHOLDS, NF3_NEG_LEVELS
    s = torch.full_like(q_neg, ln[0])
    s = torch.where(q_neg >= tn[0], torch.tensor(ln[1]), s)
    s = torch.where(q_neg >= tn[1], torch.tensor(ln[2]), s)
    s = torch.where(q_neg >= tn[2], torch.tensor(ln[3]), s)
    return s


def test_make_weight_quantizer_groups_along_K(rng):
    """[K, N] weights must be grouped along K per output column — the grid
    the reference uses (its [N, K] torch weights group along the last axis)."""
    from bitdistiller_tpu.quant.core import make_weight_quantizer

    K, N, G = 32, 4, 8
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    q = make_weight_quantizer("int2-asym", G)
    out = q(w)
    # per-column independence: quantizing one column alone gives the same result
    for j in range(N):
        col = fake_quant_int(w[:, j][None, :], 2, G, ste=True)[0]
        np.testing.assert_allclose(np.asarray(out[:, j]), np.asarray(col), rtol=1e-6)
    # and it differs from (wrong) N-axis grouping
    wrong = fake_quant_int(w, 2, 4, ste=True)
    assert not np.allclose(np.asarray(out), np.asarray(wrong))


@pytest.mark.parametrize("ste", [False, True])
@pytest.mark.parametrize("n_bit", [2, 3])
def test_fake_quant_int_kaxis_bitwise_matches_transposed(rng, ste, n_bit):
    """The transpose-free K-axis variant must be bit-identical (values AND
    gradients) to fake_quant_int(w.T).T — they share one quantization grid."""
    from bitdistiller_tpu.quant.core import fake_quant_int_kaxis

    K, N, G = 256, 12, 64
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    got = fake_quant_int_kaxis(w, n_bit, G, ste=ste)
    want = fake_quant_int(w.T, n_bit, G, ste=ste).T
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    if ste:
        co = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
        g_got = jax.grad(
            lambda w: jnp.sum(fake_quant_int_kaxis(w, n_bit, G, ste=True) * co)
        )(w)
        g_want = jax.grad(
            lambda w: jnp.sum(fake_quant_int(w.T, n_bit, G, ste=True).T * co)
        )(w)
        np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_want))


@pytest.mark.parametrize("ste", [False, True])
def test_fake_quant_nf3_kaxis_bitwise_matches_transposed(rng, ste):
    from bitdistiller_tpu.quant.core import fake_quant_nf3_kaxis

    K, N, G = 256, 12, 64
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    got = fake_quant_nf3_kaxis(w, G, ste=ste)
    want = fake_quant_nf3(w.T, G, ste=ste).T
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    if ste:
        co = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
        g_got = jax.grad(
            lambda w: jnp.sum(fake_quant_nf3_kaxis(w, G, ste=True) * co)
        )(w)
        g_want = jax.grad(
            lambda w: jnp.sum(fake_quant_nf3(w.T, G, ste=True).T * co)
        )(w)
        np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_want))


def test_make_weight_quantizer_int_uses_same_grid_as_nf3_path(rng):
    """make_weight_quantizer's int path (kaxis fast path) and the generic
    q(w.T).T wrapper must produce identical outputs."""
    from bitdistiller_tpu.quant.core import make_weight_quantizer

    K, N, G = 128, 8, 64
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    fast = make_weight_quantizer("int2-asym", G)(w)
    generic = make_fake_quantizer("int2-asym", G)(w.T).T
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(generic))
