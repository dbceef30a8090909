"""RoPE scaling (HF `rope_scaling` parity: linear / llama3 / longrope).

The reference inherits these from transformers' modeling code
(modeling_rope_utils.ROPE_INIT_FUNCTIONS) for llama-3.1 / gemma3 / phi3
checkpoints; here they are implemented in models/layers.py
rope_scaling_params and verified against independent restatements."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.models import KVCache, ModelConfig, forward, init_params
from bitdistiller_tpu.models.layers import rope_cos_sin, rope_scaling_params

BASE = dict(vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=1,
            num_heads=2, num_kv_heads=2, dtype="float32")


def test_linear_scaling_stretches_positions():
    cfg = ModelConfig(**BASE, rope_scaling_type="linear", rope_scaling_factor=4.0)
    dh = cfg.actual_head_dim
    inv, ms = rope_scaling_params(cfg, dh, cfg.rope_theta)
    assert ms == 1.0
    pos = jnp.asarray([8.0, 20.0])
    c_scaled, s_scaled = rope_cos_sin(pos, dh, cfg.rope_theta, inv_freq=inv)
    c_base, s_base = rope_cos_sin(pos / 4.0, dh, cfg.rope_theta)
    np.testing.assert_allclose(np.asarray(c_scaled), np.asarray(c_base), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_scaled), np.asarray(s_base), atol=1e-6)


def test_llama3_scaling_matches_hf_formula():
    cfg = ModelConfig(
        **BASE, rope_theta=500000.0, rope_scaling_type="llama3",
        rope_scaling_factor=8.0, rope_low_freq_factor=1.0,
        rope_high_freq_factor=4.0, rope_original_max_position=8192,
    )
    dh = cfg.actual_head_dim
    inv, ms = rope_scaling_params(cfg, dh, cfg.rope_theta)
    assert ms == 1.0
    # independent per-dim restatement of _compute_llama3_parameters
    want = []
    for i in range(0, dh, 2):
        f = 1.0 / (cfg.rope_theta ** (i / dh))
        wavelen = 2 * np.pi / f
        low_wl = 8192 / 1.0
        high_wl = 8192 / 4.0
        if wavelen > low_wl:  # low-frequency: fully scaled
            want.append(f / 8.0)
        elif wavelen < high_wl:  # high-frequency: untouched
            want.append(f)
        else:  # smooth interpolation
            smooth = (8192 / wavelen - 1.0) / (4.0 - 1.0)
            want.append((1 - smooth) * f / 8.0 + smooth * f)
    np.testing.assert_allclose(np.asarray(inv), np.asarray(want), rtol=1e-6)
    # both regimes must actually occur for this theta/head_dim
    base = 1.0 / (cfg.rope_theta ** (np.arange(0, dh, 2) / dh))
    assert np.any(np.isclose(np.asarray(inv), base))  # high-freq kept
    assert np.any(np.asarray(inv) < base * 0.99)  # low-freq scaled


def test_longrope_factor_table_and_mscale():
    dh = BASE["hidden_size"] // BASE["num_heads"]
    long_f = tuple(1.0 + 0.5 * i for i in range(dh // 2))
    short_f = tuple(1.0 for _ in range(dh // 2))
    common = dict(rope_scaling_type="longrope", rope_long_factor=long_f,
                  rope_short_factor=short_f, rope_original_max_position=512)
    # deployed context beyond the original length -> long table + mscale
    cfg_long = ModelConfig(**{**BASE, "max_position_embeddings": 2048}, **common)
    inv, ms = rope_scaling_params(cfg_long, dh, cfg_long.rope_theta)
    base = 1.0 / (cfg_long.rope_theta ** (np.arange(0, dh, 2) / dh))
    np.testing.assert_allclose(np.asarray(inv), base / np.asarray(long_f), rtol=1e-6)
    np.testing.assert_allclose(ms, np.sqrt(1 + np.log(2048 / 512) / np.log(512)),
                               rtol=1e-6)
    # within the original length -> short table, no magnitude scaling
    cfg_short = ModelConfig(**{**BASE, "max_position_embeddings": 512}, **common)
    inv_s, ms_s = rope_scaling_params(cfg_short, dh, cfg_short.rope_theta)
    np.testing.assert_allclose(np.asarray(inv_s), base, rtol=1e-6)
    assert ms_s == 1.0


def test_yarn_matches_hf_formula():
    cfg = ModelConfig(
        **BASE, rope_theta=1000000.0, rope_scaling_type="yarn",
        rope_scaling_factor=4.0, rope_original_max_position=32768,
    )
    dh = cfg.actual_head_dim
    inv, ms = rope_scaling_params(cfg, dh, cfg.rope_theta)
    np.testing.assert_allclose(ms, 0.1 * np.log(4.0) + 1.0, rtol=1e-6)
    # independent restatement of _compute_yarn_parameters
    base = 1.0 / (cfg.rope_theta ** (np.arange(0, dh, 2) / dh))

    def corr(rot):
        return (dh * np.log(32768 / (rot * 2 * np.pi))) / (2 * np.log(1000000.0))

    low = max(np.floor(corr(32.0)), 0)
    high = min(np.ceil(corr(1.0)), dh - 1)
    if low == high:
        high += 0.001
    want = []
    for j in range(dh // 2):
        w = 1.0 - np.clip((j - low) / (high - low), 0, 1)  # extrapolation weight
        want.append(base[j] / 4.0 * (1 - w) + base[j] * w)
    np.testing.assert_allclose(np.asarray(inv), np.asarray(want), rtol=1e-6)
    # the attention factor reaches the cos/sin tables
    c, _ = rope_cos_sin(jnp.asarray([0.0]), dh, cfg.rope_theta, inv_freq=inv,
                        mscale=ms)
    np.testing.assert_allclose(np.asarray(c[0]), ms, rtol=1e-6)

    # yarn parses from HF config with explicit attention_factor override
    hf = {"model_type": "qwen2", "vocab_size": 64, "hidden_size": 32,
          "intermediate_size": 64, "num_hidden_layers": 1,
          "num_attention_heads": 2, "num_key_value_heads": 2,
          "rope_scaling": {"rope_type": "yarn", "factor": 4.0,
                           "beta_fast": 16, "attention_factor": 1.5,
                           "original_max_position_embeddings": 32768}}
    pc = ModelConfig.from_hf_config(hf)
    assert pc.rope_scaling_type == "yarn" and pc.rope_beta_fast == 16.0
    _, ms2 = rope_scaling_params(pc, pc.actual_head_dim, pc.rope_theta)
    assert ms2 == 1.5


def test_from_hf_config_rope_scaling_parsing():
    base_hf = {
        "model_type": "llama", "vocab_size": 64, "hidden_size": 32,
        "intermediate_size": 64, "num_hidden_layers": 1,
        "num_attention_heads": 2, "num_key_value_heads": 2,
    }
    cfg = ModelConfig.from_hf_config({**base_hf, "rope_scaling": {
        "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
        "high_freq_factor": 4.0, "original_max_position_embeddings": 8192,
    }})
    assert cfg.rope_scaling_type == "llama3"
    assert cfg.rope_scaling_factor == 8.0
    assert cfg.rope_original_max_position == 8192

    # phi3's "su" alias maps to longrope; top-level original_max fallback
    cfg = ModelConfig.from_hf_config({**base_hf,
        "original_max_position_embeddings": 4096,
        "rope_scaling": {"type": "su", "long_factor": [1.0] * 8,
                         "short_factor": [1.0] * 8}})
    assert cfg.rope_scaling_type == "longrope"
    assert cfg.rope_original_max_position == 4096
    assert cfg.rope_long_factor == (1.0,) * 8

    assert ModelConfig.from_hf_config(base_hf).rope_scaling_type is None
    assert ModelConfig.from_hf_config(
        {**base_hf, "rope_scaling": {"rope_type": "default"}}
    ).rope_scaling_type is None
    with pytest.raises(ValueError, match="dynamic"):
        ModelConfig.from_hf_config(
            {**base_hf, "rope_scaling": {"rope_type": "dynamic", "factor": 2.0}}
        )


def test_scaled_rope_cached_decode_parity():
    """Full-context vs cached decode must agree under scaling (the scaled
    cos/sin tables are position-indexed the same way on both paths)."""
    cfg = ModelConfig(**BASE, rope_scaling_type="linear", rope_scaling_factor=2.0)
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    tokens = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
    full, _ = forward(params, cfg, tokens)
    cache = KVCache.init(cfg, 1, 8, dtype=jnp.float32)
    _, cache = forward(params, cfg, tokens[:, :5], cache=cache, cache_pos=0)
    step, _ = forward(params, cfg, tokens[:, 5:6], cache=cache, cache_pos=5)
    np.testing.assert_allclose(
        np.asarray(step[0, 0]), np.asarray(full[0, 5]), rtol=2e-3, atol=2e-3
    )
    # scaling changes the function: an unscaled twin must differ at late pos
    cfg0 = ModelConfig(**BASE)
    full0, _ = forward(params, cfg0, tokens)
    assert not np.allclose(np.asarray(full0[0, -1]), np.asarray(full[0, -1]))
