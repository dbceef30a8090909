"""Packed-model forward tests: packed == fake-quant dense, fused == unfused."""

import numpy as np
import jax
import jax.numpy as jnp

from bitdistiller_tpu.models import TINY_TEST, forward, init_params
from bitdistiller_tpu.models.quantized import pack_model, random_packed_params
from bitdistiller_tpu.quant import make_fake_quantizer
from bitdistiller_tpu.models.llama import fake_quant_weights


def test_packed_forward_matches_fake_quant_dense():
    # f32 compute so both paths see identical weight values (bf16 casts
    # otherwise round dequantized weights differently)
    cfg = type(TINY_TEST)(**{**TINY_TEST.__dict__, "dtype": "float32"})
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    tokens = jnp.arange(8, dtype=jnp.int32)[None]

    packed = pack_model(params, cfg, bits=4, group_size=64, fuse=False)
    logits_packed, _ = forward(packed, cfg, tokens)

    # PTQ fake-quant on [K, N] weights must group along K: quantizer applied
    # to w.T (the [N, K] view fake_quant_weights uses matches the reference's
    # per-OC grouping, which is the same group content)
    quantizer = make_fake_quantizer("int4-asym", 64)
    fq = fake_quant_weights(params, lambda w: quantizer(w.T).T)
    logits_fq, _ = forward(fq, cfg, tokens)

    np.testing.assert_allclose(
        np.asarray(logits_packed), np.asarray(logits_fq), rtol=2e-3, atol=2e-3
    )


def test_fused_matches_unfused():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(1), dtype=jnp.float32)
    tokens = jnp.arange(12, dtype=jnp.int32)[None]
    unfused = pack_model(params, cfg, bits=2, group_size=64, fuse=False)
    fused = pack_model(params, cfg, bits=2, group_size=64, fuse=True)
    assert "qkv" in fused["layers"] and "q" not in fused["layers"]
    l1, _ = forward(unfused, cfg, tokens)
    l2, _ = forward(fused, cfg, tokens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-4)


def test_random_packed_params_decode_shapes():
    cfg = TINY_TEST
    params = random_packed_params(cfg, jax.random.key(0), bits=2, group_size=64)
    from bitdistiller_tpu.models import KVCache

    cache = KVCache.init(cfg, batch=2, max_len=16)
    logits, cache = forward(params, cfg, jnp.zeros((2, 4), jnp.int32), cache=cache, cache_pos=0)
    assert logits.shape == (2, 4, cfg.vocab_size)
    logits, cache = forward(
        params, cfg, jnp.zeros((2, 1), jnp.int32), cache=cache, cache_pos=jnp.asarray(4)
    )
    assert logits.shape == (2, 1, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
