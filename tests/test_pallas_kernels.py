"""Pallas kernel tests in interpreter mode (CPU): the TPU kernels must match
the XLA reference paths exactly on integer-valued data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.experimental.fused_mlp import fused_mlp
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
    # bf16-representable scales/szeros: the kernel reads them from the packed
    # combo word (bf16 halves), so exact-comparison tests must use values the
    # combo can represent; the rounding deviation itself is bounded in
    # test_combo_scale_rounding_bounded
    scales = jax.random.uniform(jax.random.key(1), (k // 128, n), jnp.float32, 0.5, 2.0)
    scales = scales.astype(jnp.bfloat16).astype(jnp.float32)
    zeros = jnp.round(jax.random.uniform(jax.random.key(2), (k // 128, n), jnp.float32, 0.0, 3.0))
    szeros = (zeros * scales).astype(jnp.bfloat16).astype(jnp.float32)
    from bitdistiller_tpu.quant.packing import make_scale_combo

    p = PackedLinear(qweight=qw, scales=scales, szeros=szeros, bias=None,
                     bits=bits, group_size=128, in_features=k, out_features=n,
                     combo=make_scale_combo(scales, szeros))
    # pre-round x to bf16 so kernel (bf16 MXU inputs) and f32 XLA reference
    # see identical values; remaining diff is accumulation order only
    x = jax.random.normal(jax.random.key(3), (m, k), jnp.float32)
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    out = quant_matmul_pallas(x, p, interpret=True)
    want = quant_matmul_xla(x, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_quant_matmul_materialize_matches_xla():
    """The large-M materialize path (dequant once + bf16 GEMM) must agree
    with the XLA reference up to bf16 weight rounding."""
    from bitdistiller_tpu.ops.quant_matmul import quant_matmul_materialize
    from bitdistiller_tpu.quant.packing import quantize_pack_linear

    k, n, m = 256, 128, 64
    w = jax.random.normal(jax.random.key(0), (k, n), jnp.float32)
    p = quantize_pack_linear(w, 2, 128)
    x = jax.random.normal(jax.random.key(1), (m, k), jnp.float32)
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    got = np.asarray(quant_matmul_materialize(x, p), np.float32)
    want = np.asarray(quant_matmul_xla(x, p), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * np.abs(want).max())


def test_quant_matmul_materialize_env_dispatch(monkeypatch):
    import importlib

    # ops/__init__ re-exports the quant_matmul FUNCTION, shadowing the
    # submodule attribute — resolve the module explicitly
    qm = importlib.import_module("bitdistiller_tpu.ops.quant_matmul")
    from bitdistiller_tpu.quant.packing import quantize_pack_linear

    w = jax.random.normal(jax.random.key(0), (256, 128), jnp.float32)
    p = quantize_pack_linear(w, 2, 128)
    x = jax.random.normal(jax.random.key(1), (2, 16, 256), jnp.float32)
    monkeypatch.setenv("BITDISTILLER_QMM_MATERIALIZE_M", "32")
    out = qm.quant_matmul(x, p)  # 32 rows >= threshold -> materialize path
    assert out.shape == (2, 16, 128)
    monkeypatch.setenv("BITDISTILLER_QMM_MATERIALIZE_M", "")
    out2 = qm.quant_matmul(x, p)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out2, np.float32),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(out2).max()),
    )


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


def test_combo_scale_rounding_bounded():
    """The decode-path combo word stores bf16 scales (vs the XLA path's f32):
    the dequantized-weight deviation must stay within bf16 epsilon (2^-8)."""
    from bitdistiller_tpu.quant import quantize_pack_linear
    from bitdistiller_tpu.quant.packing import make_scale_combo

    w = jax.random.normal(jax.random.key(0), (256, 128), jnp.float32)
    p = quantize_pack_linear(w, bits=2, group_size=128)
    assert p.combo is not None and p.combo.dtype == jnp.int32

    # decode combo the way the kernel does (numpy bit twiddling)
    cw = np.asarray(p.combo).view(np.uint32)
    s_dec = (cw << 16).astype(np.uint32).view(np.float32)
    sz_dec = (cw & 0xFFFF0000).view(np.float32)
    s_ref = np.asarray(p.scales)
    sz_ref = np.asarray(p.szeros)
    np.testing.assert_allclose(s_dec, s_ref, rtol=2**-8)
    # szeros can be exactly 0; compare with atol scaled by the scale
    np.testing.assert_allclose(sz_dec, sz_ref, rtol=2**-8, atol=np.abs(s_ref).max() * 2**-8)

    # and the combo builder round-trips bf16-exact inputs exactly
    s_exact = s_ref.astype(np.float32)
    s_exact = np.asarray(jnp.asarray(s_exact, jnp.bfloat16), np.float32)
    combo2 = make_scale_combo(jnp.asarray(s_exact), jnp.asarray(sz_dec))
    cw2 = np.asarray(combo2).view(np.uint32)
    np.testing.assert_array_equal((cw2 << 16).astype(np.uint32).view(np.float32), s_exact)


def test_qmm_k_remainder_split():
    """K with a non-gps-multiple group count (86 groups like llama down)
    must split into main+tail and still match the XLA reference exactly on
    integer-valued inputs."""
    k, n, m, bits = 128 * 11, 256, 4, 2  # 11 groups: main 8 + tail 3
    codes = jax.random.randint(jax.random.key(0), (k, n), 0, 4)
    qw = pack_codes(codes, bits, 128)
    ones = jnp.ones((k // 128, n), jnp.float32)
    from bitdistiller_tpu.quant.packing import make_scale_combo

    p = PackedLinear(qweight=qw, scales=ones, szeros=ones * 0, bias=None,
                     bits=bits, group_size=128, in_features=k, out_features=n,
                     combo=make_scale_combo(ones, ones * 0))
    x = jnp.asarray(
        np.random.default_rng(0).integers(-4, 5, (m, k)).astype(np.float32)
    )
    out = quant_matmul_pallas(x, p, interpret=True, groups_per_step=8)
    want = quant_matmul_xla(x, p)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


# ---------------------------------------------------------------------------
# Flash-decode attention (experimental/flash_decode.py vs the XLA two-piece path)
# ---------------------------------------------------------------------------


def _flash_ref(q, ck, cv, k_new, v_new, start, window=None):
    """cached_attention with the decode mask built the way forward() builds it."""
    from bitdistiller_tpu.models.layers import cached_attention

    b, _, hq, d = q.shape
    t = ck.shape[2]
    k_pos = jnp.arange(t)[None, None, :]
    allow_cache = jnp.broadcast_to(k_pos < start[:, None, None], (b, 1, t))
    allow_new = jnp.ones((b, 1, 1), bool)
    mask = jnp.concatenate([allow_cache, allow_new], axis=-1)
    if window is not None:
        k_abs = jnp.concatenate(
            [jnp.broadcast_to(jnp.arange(t)[None], (b, t)), start[:, None]], axis=-1
        )
        mask = mask & (k_abs[:, None, :] > start[:, None, None] - window)
    return cached_attention(q, ck, cv, k_new, v_new, mask[:, None])


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2), (4, 1)])
def test_flash_decode_matches_xla(hq, hkv):
    from bitdistiller_tpu.experimental.flash_decode import flash_decode_attention

    b, t, d = 3, 64, 128
    keys = jax.random.split(jax.random.key(0), 6)
    q = jax.random.normal(keys[0], (b, 1, hq, d), jnp.float32)
    ck = jax.random.normal(keys[1], (b, hkv, t, d), jnp.float32)
    cv = jax.random.normal(keys[2], (b, hkv, t, d), jnp.float32)
    kn = jax.random.normal(keys[3], (b, 1, hkv, d), jnp.float32)
    vn = jax.random.normal(keys[4], (b, 1, hkv, d), jnp.float32)
    start = jnp.asarray([0, 17, 64], jnp.int32)  # empty / partial / full

    out = flash_decode_attention(q, ck, cv, kn, vn, start, block_t=16, interpret=True)
    want = _flash_ref(q, ck, cv, kn, vn, start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_decode_sliding_window():
    from bitdistiller_tpu.experimental.flash_decode import flash_decode_attention

    b, t, d, hq = 2, 64, 128, 4
    keys = jax.random.split(jax.random.key(1), 6)
    q = jax.random.normal(keys[0], (b, 1, hq, d), jnp.float32)
    ck = jax.random.normal(keys[1], (b, hq, t, d), jnp.float32)
    cv = jax.random.normal(keys[2], (b, hq, t, d), jnp.float32)
    kn = jax.random.normal(keys[3], (b, 1, hq, d), jnp.float32)
    vn = jax.random.normal(keys[4], (b, 1, hq, d), jnp.float32)
    start = jnp.asarray([40, 64], jnp.int32)

    out = flash_decode_attention(
        q, ck, cv, kn, vn, start, block_t=16, window=8, interpret=True
    )
    want = _flash_ref(q, ck, cv, kn, vn, start, window=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_forward_attn_len_via_flash2_matches_xla_path():
    """forward(attn_len=...) routes through the stacked flash-decode kernel
    (the only remaining Pallas decode route — the gen-1 per-layer kernel is
    retired to tests-only) and must match the full-window XLA path whenever
    every cache position < attn_len."""
    from bitdistiller_tpu.models import TINY_TEST, KVCache, forward, init_params

    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    cache = KVCache.init(cfg, batch=2, max_len=32, dtype=jnp.float32)
    toks = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    _, cache = forward(params, cfg, toks, cache=cache, cache_pos=0)
    step = jnp.asarray([[9], [10]], jnp.int32)
    pos = jnp.asarray([4, 4], jnp.int32)
    ref, _ = forward(params, cfg, step, cache=cache, cache_pos=pos,
                     flash2=False)
    out, _ = forward(params, cfg, step, cache=cache, cache_pos=pos,
                     flash2=True, attn_len=16)
    # bf16 compute: the two paths round differently at ulp scale
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.06, atol=0.06)


def test_flash_decode_attn_len_bounds_grid():
    """attn_len (the engine's length bucket) must not change results as long
    as every start < attn_len — blocks past the bucket are never read."""
    from bitdistiller_tpu.experimental.flash_decode import flash_decode_attention

    b, t, d, hq, hkv = 3, 128, 128, 8, 2
    keys = jax.random.split(jax.random.key(2), 6)
    q = jax.random.normal(keys[0], (b, 1, hq, d), jnp.float32)
    ck = jax.random.normal(keys[1], (b, hkv, t, d), jnp.float32)
    cv = jax.random.normal(keys[2], (b, hkv, t, d), jnp.float32)
    kn = jax.random.normal(keys[3], (b, 1, hkv, d), jnp.float32)
    vn = jax.random.normal(keys[4], (b, 1, hkv, d), jnp.float32)
    start = jnp.asarray([0, 17, 30], jnp.int32)  # all < 32

    want = _flash_ref(q, ck, cv, kn, vn, start)
    for attn_len in (32, 40, 128):  # block-aligned, partial block, full
        out = flash_decode_attention(
            q, ck, cv, kn, vn, start, block_t=16, attn_len=attn_len,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), rtol=2e-5, atol=2e-5
        )
    # attn_len below one block still covers starts < block_t
    out = flash_decode_attention(
        q, ck, cv, kn, vn, start, block_t=64, attn_len=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_stacked_kernel_matches_sliced(monkeypatch):
    """The scalar-prefetch stacked kernel (layer index in the BlockSpec
    index_map) must equal per-layer slicing through the XLA reference, for
    every layer — including a K that forces the remainder split."""
    import functools

    from bitdistiller_tpu.ops.quant_matmul import (
        _quant_matmul_pallas_2d,
        _quant_matmul_pallas_2d_stacked,
    )
    from bitdistiller_tpu.quant.packing import quantize_pack_linear

    rng = np.random.default_rng(0)
    L, K, N, G, BITS = 3, 256, 128, 64, 2
    ws = [rng.standard_normal((K, N)).astype(np.float32) for _ in range(L)]
    packs = [quantize_pack_linear(jnp.asarray(w), BITS, G) for w in ws]
    qw = jnp.stack([p.qweight for p in packs])
    combo = jnp.stack([p.combo for p in packs])
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)

    for li in range(L):
        got = _quant_matmul_pallas_2d_stacked(
            x, qw, combo, jnp.asarray(li, jnp.int32),
            bits=BITS, group_size=G, block_m=8, block_n=128,
            groups_per_step=2, interpret=True,
        )
        # identical numerics path: the sliced NON-stacked kernel
        want = _quant_matmul_pallas_2d(
            x, packs[li].qweight, packs[li].combo,
            bits=BITS, group_size=G, block_m=8, block_n=128,
            groups_per_step=2, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_stacked_forward_matches_plain_packed():
    """Whole-model: forward over a packed tree now routes layer weights
    through StackedPacked views inside the scan — logits must equal the
    pre-change behavior (CPU falls back to slicing, so this checks the
    plumbing end-to-end: scan xs restructure, dispatch, bias path)."""
    from bitdistiller_tpu.models import TINY_TEST, forward, init_params
    from bitdistiller_tpu.models.quantized import pack_model
    from bitdistiller_tpu.models.llama import KVCache

    cfg = type(TINY_TEST)(**{**TINY_TEST.__dict__, "dtype": "float32"})
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    dense_logits, _ = forward(params, cfg, jnp.arange(8, dtype=jnp.int32)[None])
    packed = pack_model(params, cfg, bits=4, group_size=32, fuse=True)
    logits, _ = forward(packed, cfg, jnp.arange(8, dtype=jnp.int32)[None])
    # int4-g32 quantization error only
    err = float(jnp.mean(jnp.abs(logits - dense_logits)))
    assert err < 0.4, err
    # decode step with cache
    cache = KVCache.init(cfg, batch=1, max_len=16, dtype=jnp.float32)
    lg, cache = forward(packed, cfg, jnp.asarray([[3]], jnp.int32),
                        cache=cache, cache_pos=0)
    assert np.isfinite(np.asarray(lg)).all()
