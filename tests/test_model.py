"""Decoder forward tests: shapes, caching consistency, quantized modes, and
logits parity against HF transformers' LlamaForCausalLM on a tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.models import (
    TINY_TEST,
    KVCache,
    ModelConfig,
    fake_quant_weights,
    forward,
    init_params,
)
from bitdistiller_tpu.quant import make_fake_quantizer


@pytest.fixture(scope="module")
def tiny():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0))
    return cfg, params


def test_forward_shapes(tiny):
    cfg, params = tiny
    tokens = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % cfg.vocab_size
    logits, cache = forward(params, cfg, tokens)
    assert logits.shape == (2, 8, cfg.vocab_size)
    assert cache is None
    assert np.isfinite(np.asarray(logits)).all()


def test_forward_is_causal(tiny):
    cfg, params = tiny
    t1 = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    t2 = t1.at[0, -1].set(99)  # change only the last token
    l1, _ = forward(params, cfg, t1)
    l2, _ = forward(params, cfg, t2)
    np.testing.assert_allclose(
        np.asarray(l1[0, :-1]), np.asarray(l2[0, :-1]), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(l1[0, -1]), np.asarray(l2[0, -1]))


def test_cached_decode_matches_full_forward(tiny):
    cfg, params = tiny
    tokens = jnp.asarray([[5, 9, 2, 7, 11, 3]], jnp.int32)
    full_logits, _ = forward(params, cfg, tokens)

    cache = KVCache.init(cfg, batch=1, max_len=8, dtype=jnp.float32)
    # prefill first 4
    l_pre, cache = forward(params, cfg, tokens[:, :4], cache=cache, cache_pos=0)
    np.testing.assert_allclose(
        np.asarray(l_pre), np.asarray(full_logits[:, :4]), rtol=5e-2, atol=5e-2
    )
    # decode tokens 5 and 6 one at a time
    l4, cache = forward(params, cfg, tokens[:, 4:5], cache=cache, cache_pos=4)
    l5, cache = forward(params, cfg, tokens[:, 5:6], cache=cache, cache_pos=5)
    np.testing.assert_allclose(
        np.asarray(l4[:, 0]), np.asarray(full_logits[:, 4]), rtol=5e-2, atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(l5[:, 0]), np.asarray(full_logits[:, 5]), rtol=5e-2, atol=5e-2
    )


def test_fake_quant_forward_differs_but_close(tiny):
    cfg, params = tiny
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    dense, _ = forward(params, cfg, tokens)
    quantizer = make_fake_quantizer("int4-asym", 64)
    qat, _ = forward(params, cfg, tokens, quantizer=quantizer)
    dense, qat = np.asarray(dense), np.asarray(qat)
    assert not np.allclose(dense, qat)
    # int4 g64 should stay reasonably close on random init
    assert np.abs(dense - qat).mean() < 1.0


def test_fake_quant_weights_ptq(tiny):
    cfg, params = tiny
    quantizer = make_fake_quantizer("nf3", 64)
    qparams = fake_quant_weights(params, quantizer)
    w0 = np.asarray(params["layers"]["gate"]["w"])
    w1 = np.asarray(qparams["layers"]["gate"]["w"])
    assert not np.allclose(w0, w1)
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    logits, _ = forward(qparams, cfg, tokens)
    assert np.isfinite(np.asarray(logits)).all()


def test_qat_gradients_flow(tiny):
    cfg, params = tiny
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    quantizer = make_fake_quantizer("int2-asym", 64)

    def loss_fn(p):
        logits, _ = forward(p, cfg, tokens, quantizer=quantizer)
        return jnp.mean(logits**2)

    grads = jax.grad(loss_fn)(params)
    gw = np.asarray(grads["layers"]["q"]["w"], dtype=np.float32)
    assert np.isfinite(gw).all()
    assert np.abs(gw).sum() > 0


def test_hf_logits_parity():
    """Our forward must reproduce HF LlamaForCausalLM logits bit-for-bit-ish."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = LlamaForCausalLM(hf_cfg).eval().to(torch.float32)

    cfg = ModelConfig.from_hf_config(hf_cfg.to_dict())
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32"})

    sd = hf_model.state_dict()

    def t2j(name, transpose=False):
        a = sd[name].detach().numpy()
        return jnp.asarray(a.T if transpose else a)

    L = cfg.num_layers
    layers = {
        "input_norm": jnp.stack([t2j(f"model.layers.{i}.input_layernorm.weight") for i in range(L)]),
        "post_attn_norm": jnp.stack([t2j(f"model.layers.{i}.post_attention_layernorm.weight") for i in range(L)]),
    }
    for ours, theirs in [
        ("q", "self_attn.q_proj"),
        ("k", "self_attn.k_proj"),
        ("v", "self_attn.v_proj"),
        ("o", "self_attn.o_proj"),
        ("gate", "mlp.gate_proj"),
        ("up", "mlp.up_proj"),
        ("down", "mlp.down_proj"),
    ]:
        layers[ours] = {
            "w": jnp.stack([t2j(f"model.layers.{i}.{theirs}.weight", True) for i in range(L)])
        }
    params = {
        "embed": t2j("model.embed_tokens.weight"),
        "final_norm": t2j("model.norm.weight"),
        "lm_head": {"w": t2j("lm_head.weight", True)},
        "layers": layers,
    }

    tokens = np.array([[3, 17, 42, 9, 101, 55, 7, 23]], dtype=np.int64)
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(tokens)).logits.numpy()
    ours_logits, _ = forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours_logits), hf_logits, rtol=2e-4, atol=2e-4)
