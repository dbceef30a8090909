"""Importer variants: Phi-3 fused qkv/gate_up checkpoints, sliding-window
masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.models import ModelConfig, forward, init_params
from bitdistiller_tpu.models.hf_import import load_hf_checkpoint


def test_phi3_fused_import(tmp_path):
    from safetensors.numpy import save_file
    import json

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, dtype="float32",
    )
    rng = np.random.default_rng(0)
    d, qs, kvs, ffn = 32, cfg.q_size, cfg.kv_size, cfg.intermediate_size
    out = {
        "model.embed_tokens.weight": rng.standard_normal((64, d)).astype(np.float32),
        "model.norm.weight": np.ones(d, np.float32),
        "lm_head.weight": rng.standard_normal((64, d)).astype(np.float32),
    }
    split_ref = {}
    for i in range(2):
        qkv = rng.standard_normal((qs + 2 * kvs, d)).astype(np.float32)
        gu = rng.standard_normal((2 * ffn, d)).astype(np.float32)
        split_ref[i] = (qkv, gu)
        out[f"model.layers.{i}.self_attn.qkv_proj.weight"] = qkv
        out[f"model.layers.{i}.mlp.gate_up_proj.weight"] = gu
        out[f"model.layers.{i}.self_attn.o_proj.weight"] = rng.standard_normal((d, qs)).astype(np.float32)
        out[f"model.layers.{i}.mlp.down_proj.weight"] = rng.standard_normal((d, ffn)).astype(np.float32)
        out[f"model.layers.{i}.input_layernorm.weight"] = np.ones(d, np.float32)
        out[f"model.layers.{i}.post_attention_layernorm.weight"] = np.ones(d, np.float32)
    save_file(out, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump({
            "model_type": "phi3", "vocab_size": 64, "hidden_size": 32,
            "intermediate_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
        }, f)

    params, loaded_cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
    qkv0, gu0 = split_ref[0]
    np.testing.assert_allclose(
        np.asarray(params["layers"]["q"]["w"][0]), qkv0[:qs].T, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["layers"]["up"]["w"][0]), gu0[ffn:].T, rtol=1e-6
    )
    logits, _ = forward(params, loaded_cfg, jnp.asarray([[1, 2, 3]], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_sliding_window_masks_distant_tokens():
    base = dict(vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=1,
                num_heads=2, num_kv_heads=2, dtype="float32")
    cfg_full = ModelConfig(**base)
    cfg_win = ModelConfig(**base, sliding_window=2)
    params = init_params(cfg_full, jax.random.key(0), dtype=jnp.float32)
    tokens = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
    full, _ = forward(params, cfg_full, tokens)
    win, _ = forward(params, cfg_win, tokens)
    # early tokens (window covers all history) identical; late tokens differ
    np.testing.assert_allclose(np.asarray(full[0, 0]), np.asarray(win[0, 0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(full[0, 1]), np.asarray(win[0, 1]), rtol=1e-5)
    assert not np.allclose(np.asarray(full[0, -1]), np.asarray(win[0, -1]))

    # cached decode consistency under sliding window
    from bitdistiller_tpu.models import KVCache

    cache = KVCache.init(cfg_win, 1, 8, dtype=jnp.float32)
    _, cache = forward(params, cfg_win, tokens[:, :5], cache=cache, cache_pos=0)
    step, _ = forward(params, cfg_win, tokens[:, 5:6], cache=cache, cache_pos=5)
    np.testing.assert_allclose(
        np.asarray(step[0, 0]), np.asarray(win[0, 5]), rtol=2e-3, atol=2e-3
    )
