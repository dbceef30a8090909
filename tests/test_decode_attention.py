"""Stacked flash-decode attention (ops/decode_attention.py) vs the XLA
two-piece attention — kernel-level and whole-forward parity on CPU
(interpret mode), including GQA, per-slot lengths, sliding windows, and the
block planner's VMEM policy."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdistiller_tpu.models import TINY_TEST, KVCache, init_params, llama
from bitdistiller_tpu.models.layers import cached_attention
from bitdistiller_tpu.ops.decode_attention import _plan_blocks, flash_decode_stacked


def _rand(rng, shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.normal(size=shape), jnp.float32).astype(dtype)


@pytest.mark.parametrize(
    "b,hq,hkv,t,hg,bt",
    [
        (2, 8, 8, 64, 2, 64),    # MHA, single T-pass
        (2, 8, 2, 128, 2, 64),   # GQA rep=4, two T-passes (online softmax)
        (1, 4, 4, 64, 4, 64),    # whole head set in one cell
    ],
)
def test_kernel_matches_xla_attention(b, hq, hkv, t, hg, bt):
    d, L = 128, 3
    rng = np.random.default_rng(0)
    q = _rand(rng, (b, 1, hq, d))
    ck = _rand(rng, (L, b, hkv, t, d))
    cv = _rand(rng, (L, b, hkv, t, d))
    kn = _rand(rng, (b, 1, hkv, d))
    vn = _rand(rng, (b, 1, hkv, d))
    start = jnp.asarray(rng.integers(0, t, (b,)), jnp.int32)
    for li in (0, L - 1):
        out = flash_decode_stacked(
            q, ck, cv, jnp.asarray(li, jnp.int32), kn, vn, start,
            head_group=hg, block_t=bt, interpret=True,
        )
        t_idx = jnp.arange(t)[None]
        mask = jnp.concatenate(
            [t_idx < start[:, None], jnp.ones((b, 1), bool)], -1
        )[:, None, None, :]
        ref = cached_attention(q, ck[li], cv[li], kn, vn, mask)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=0.03, rtol=0.03,
        )


def test_kernel_sliding_window():
    b, hkv, t, d, L = 2, 4, 128, 128, 2
    rng = np.random.default_rng(1)
    q = _rand(rng, (b, 1, hkv, d))
    ck = _rand(rng, (L, b, hkv, t, d))
    cv = _rand(rng, (L, b, hkv, t, d))
    kn = _rand(rng, (b, 1, hkv, d))
    vn = _rand(rng, (b, 1, hkv, d))
    start = jnp.asarray([100, 40], jnp.int32)
    w = 32
    out = flash_decode_stacked(
        q, ck, cv, jnp.asarray(0, jnp.int32), kn, vn, start,
        window=w, head_group=2, block_t=64, interpret=True,
    )
    t_idx = jnp.arange(t)[None]
    valid = (t_idx < start[:, None]) & (t_idx > start[:, None] - w)
    mask = jnp.concatenate([valid, jnp.ones((b, 1), bool)], -1)[:, None, None, :]
    ref = cached_attention(q, ck[0], cv[0], kn, vn, mask)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.03, rtol=0.03,
    )


def test_kernel_empty_cache():
    """start == 0: the fresh token attends only to itself (softmax of one)."""
    b, hkv, t, d = 2, 4, 64, 128
    rng = np.random.default_rng(2)
    q = _rand(rng, (b, 1, hkv, d))
    ck = _rand(rng, (1, b, hkv, t, d))
    cv = _rand(rng, (1, b, hkv, t, d))
    kn = _rand(rng, (b, 1, hkv, d))
    vn = _rand(rng, (b, 1, hkv, d))
    out = flash_decode_stacked(
        q, ck, cv, jnp.asarray(0, jnp.int32), kn, vn,
        jnp.zeros((b,), jnp.int32), head_group=4, block_t=64, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(vn, np.float32),
        atol=0.02, rtol=0.02,
    )


def test_kernel_int8_cache_scale_folding():
    """int8 code planes + per-(head, token) scales must match the XLA
    cached_attention's fold-into-scores formulation."""
    b, hkv, t, d, L = 2, 4, 128, 128, 2
    rng = np.random.default_rng(3)
    kf = _rand(rng, (L, b, hkv, t, d), jnp.float32)
    vf = _rand(rng, (L, b, hkv, t, d), jnp.float32)
    # quantize per (head, token) like models.llama.quantize_kv
    ks = jnp.max(jnp.abs(kf), axis=-1) / 127.0 + 1e-8
    vs = jnp.max(jnp.abs(vf), axis=-1) / 127.0 + 1e-8
    ck = jnp.round(kf / ks[..., None]).astype(jnp.int8)
    cv = jnp.round(vf / vs[..., None]).astype(jnp.int8)
    q = _rand(rng, (b, 1, hkv, d))
    kn = _rand(rng, (b, 1, hkv, d))
    vn = _rand(rng, (b, 1, hkv, d))
    start = jnp.asarray([100, 40], jnp.int32)
    out = flash_decode_stacked(
        q, ck, cv, jnp.asarray(1, jnp.int32), kn, vn, start,
        k_scale=ks, v_scale=vs, head_group=2, block_t=64, interpret=True,
    )
    t_idx = jnp.arange(t)[None]
    mask = jnp.concatenate(
        [t_idx < start[:, None], jnp.ones((b, 1), bool)], -1
    )[:, None, None, :]
    ref = cached_attention(
        q, ck[1], cv[1], kn, vn, mask,
        k_scale=ks[1].astype(jnp.float32), v_scale=vs[1].astype(jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )


@pytest.mark.parametrize("hq,hkv", [(8, 4), (8, 2), (12, 12), (4, 1)])
def test_kernel_int8_cache_gqa_head_counts(hq, hkv):
    """hkv % 8 != 0 (4-KV-head GQA like TinyLlama, MQA, 12-head) must run
    through the padded-interleaved scale planes with the auto-planned head
    group — the round-4 kernel refused these and fell back to the slow XLA
    int8 path."""
    b, t, d, L = 2, 128, 128, 2
    rng = np.random.default_rng(7)
    kf = _rand(rng, (L, b, hkv, t, d), jnp.float32)
    vf = _rand(rng, (L, b, hkv, t, d), jnp.float32)
    ks = jnp.max(jnp.abs(kf), axis=-1) / 127.0 + 1e-8
    vs = jnp.max(jnp.abs(vf), axis=-1) / 127.0 + 1e-8
    ck = jnp.round(kf / ks[..., None]).astype(jnp.int8)
    cv = jnp.round(vf / vs[..., None]).astype(jnp.int8)
    q = _rand(rng, (b, 1, hq, d))
    kn = _rand(rng, (b, 1, hkv, d))
    vn = _rand(rng, (b, 1, hkv, d))
    start = jnp.asarray([100, 40], jnp.int32)
    out = flash_decode_stacked(
        q, ck, cv, jnp.asarray(1, jnp.int32), kn, vn, start,
        k_scale=ks, v_scale=vs, interpret=True,
    )
    t_idx = jnp.arange(t)[None]
    mask = jnp.concatenate(
        [t_idx < start[:, None], jnp.ones((b, 1), bool)], -1
    )[:, None, None, :]
    ref = cached_attention(
        q, ck[1], cv[1], kn, vn, mask,
        k_scale=ks[1].astype(jnp.float32), v_scale=vs[1].astype(jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )


def test_flash2_forward_int8_cache_gqa(monkeypatch):
    """Whole-model decode with an int8 cache on a 4-KV-head GQA config
    (BASELINE.json's TinyLlama shape class): flash2 must engage (no silent
    XLA fallback) and match the XLA scale-folding path."""
    from dataclasses import replace

    cfg = replace(TINY_TEST, num_kv_heads=TINY_TEST.num_heads // 2)
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    B, T = 2, 64
    cache = KVCache.init(cfg, batch=B, max_len=T, dtype=jnp.int8)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 8)), jnp.int32)
    logits, cache = llama.forward(params, cfg, prompt, cache=cache, cache_pos=0)
    tok = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
    l2, c2 = llama.forward(params, cfg, tok, cache=cache, cache_pos=8, flash2=True)
    l1, c1 = llama.forward(params, cfg, tok, cache=cache, cache_pos=8, flash2=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=0.08, rtol=0.08)
    np.testing.assert_allclose(
        np.asarray(c1.k, np.float32), np.asarray(c2.k, np.float32), atol=1, rtol=0
    )


def test_flash2_forward_int8_cache(monkeypatch):
    """Whole-model decode with an int8 KV cache: flash2 must track the XLA
    scale-folding path, including the quantized write-back."""
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    B, T = 2, 64
    cache = KVCache.init(cfg, batch=B, max_len=T, dtype=jnp.int8)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 8)), jnp.int32)
    logits, cache = llama.forward(params, cfg, prompt, cache=cache, cache_pos=0)
    tok = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]
    monkeypatch.setenv("BITDISTILLER_FLASH2", "1")
    l2, c2 = llama.forward(params, cfg, tok, cache=cache, cache_pos=8)
    monkeypatch.setenv("BITDISTILLER_FLASH2", "0")
    l1, c1 = llama.forward(params, cfg, tok, cache=cache, cache_pos=8)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=0.08, rtol=0.08)
    assert c2.k.dtype == jnp.int8
    np.testing.assert_allclose(
        np.asarray(c1.k, np.float32), np.asarray(c2.k, np.float32),
        atol=1, rtol=0,  # int8 codes; write-back rounding may differ by 1 ulp
    )


def test_plan_blocks_policy(monkeypatch):
    """Whole-T single pass when it fits; hg=2 for bf16 planes (the measured
    v5e optimum), hg=8 for int8 (the measured-full-bandwidth group) with
    divisor fallback for GQA head counts; the double-buffered K+V pair is
    kept under the VMEM budget by shrinking bt; env override reshapes the
    plan without code edits."""
    assert _plan_blocks(32, 2048, 128, 2) == (2, 2048)
    assert _plan_blocks(32, 256, 128, 2) == (2, 256)
    assert _plan_blocks(32, 2048, 128, 1, quantized=True) == (8, 2048)
    assert _plan_blocks(3, 2048, 128, 2) == (1, 2048)  # odd hkv
    hg, bt = _plan_blocks(8, 16384, 128, 2)
    assert bt < 16384 and hg >= 1  # T too big for one pass
    # GQA head counts: largest divisor <= 8 (the scale planes are padded to
    # 8 sublanes per cell by the caller, so any hg works)
    assert _plan_blocks(4, 2048, 128, 1, quantized=True) == (4, 2048)
    assert _plan_blocks(2, 2048, 128, 1, quantized=True) == (2, 2048)
    assert _plan_blocks(1, 2048, 128, 1, quantized=True) == (1, 2048)
    assert _plan_blocks(12, 2048, 128, 1, quantized=True) == (6, 2048)
    # VMEM budget includes the head-group factor (int8 T=16384, hg=8:
    # 4*8*16384*128 = 67 MB raw -> bt shrinks until the pair fits)
    hg, bt = _plan_blocks(32, 16384, 128, 1, quantized=True)
    assert hg == 8 and 4 * hg * bt * 128 * 1 <= 11_800_000
    monkeypatch.setenv("BITDISTILLER_FD_VMEM", "2000000")
    import importlib

    da = importlib.import_module("bitdistiller_tpu.ops.decode_attention")
    importlib.reload(da)
    assert da._plan_blocks(32, 2048, 128, 2)[0] <= 2
    monkeypatch.delenv("BITDISTILLER_FD_VMEM")
    importlib.reload(da)


def test_flash2_forward_matches_xla_path(monkeypatch):
    """Whole-model decode step: BITDISTILLER_FLASH2=1 must match the default
    XLA attention path (logits and cache write-back) at bf16 precision,
    for scalar and per-slot positions."""
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    B, T = 2, 64
    cache = KVCache.init(cfg, batch=B, max_len=T, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 8)), jnp.int32)
    logits, cache = llama.forward(params, cfg, prompt, cache=cache, cache_pos=0)
    tok = logits[:, -1].argmax(-1).astype(jnp.int32)[:, None]

    for pos in (8, jnp.asarray([8, 5], jnp.int32)):
        monkeypatch.setenv("BITDISTILLER_FLASH2", "1")
        l2, c2 = llama.forward(params, cfg, tok, cache=cache, cache_pos=pos)
        monkeypatch.setenv("BITDISTILLER_FLASH2", "0")
        l1, c1 = llama.forward(params, cfg, tok, cache=cache, cache_pos=pos)
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), atol=0.06, rtol=0.06
        )
        np.testing.assert_allclose(
            np.asarray(c1.k, np.float32), np.asarray(c2.k, np.float32),
            atol=0.03, rtol=0.03,
        )
