"""Importer variants: Phi-3 fused qkv/gate_up checkpoints, sliding-window
masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.models import ModelConfig, forward, init_params
from bitdistiller_tpu.models.hf_import import load_hf_checkpoint

# Integration tier: this whole module is `-m slow` (many multi-second
# XLA CPU compiles). The default `-m 'not slow'` tier keeps the unit /
# parity / kernel tests for a minutes-scale pre-commit run; run the
# full suite (no -m filter) before shipping engine/trainer changes.
pytestmark = pytest.mark.slow



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


def _tiny_falcon_dir(tmp_path, rng):
    """Synthetic falcon-7b-layout checkpoint (MQA, parallel block)."""
    from safetensors.numpy import save_file
    import json

    d, heads, dh, L, V = 32, 4, 8, 2, 64
    out = {
        "transformer.word_embeddings.weight": rng.standard_normal((V, d)).astype(np.float32),
        "transformer.ln_f.weight": np.ones(d, np.float32),
        "transformer.ln_f.bias": np.zeros(d, np.float32),
    }
    qkv_ref = {}
    for i in range(L):
        p = f"transformer.h.{i}"
        qkv = rng.standard_normal(((heads + 2) * dh, d)).astype(np.float32)
        qkv_ref[i] = qkv
        out[f"{p}.self_attention.query_key_value.weight"] = qkv
        out[f"{p}.self_attention.dense.weight"] = rng.standard_normal((d, heads * dh)).astype(np.float32)
        out[f"{p}.mlp.dense_h_to_4h.weight"] = rng.standard_normal((4 * d, d)).astype(np.float32)
        out[f"{p}.mlp.dense_4h_to_h.weight"] = rng.standard_normal((d, 4 * d)).astype(np.float32)
        out[f"{p}.input_layernorm.weight"] = np.ones(d, np.float32)
        out[f"{p}.input_layernorm.bias"] = np.zeros(d, np.float32)
    save_file(out, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump({
            "model_type": "falcon", "vocab_size": V, "hidden_size": d,
            "num_hidden_layers": L, "num_attention_heads": heads,
            "multi_query": True, "parallel_attn": True, "alibi": False,
        }, f)
    return qkv_ref, heads, dh


def _tiny_falcon40b_dir(tmp_path, rng):
    """Synthetic falcon-40b-layout checkpoint (new_decoder_architecture:
    kv-grouped interleaved qkv + dual ln_attn/ln_mlp)."""
    from safetensors.numpy import save_file
    import json

    d, heads, hkv, dh, L, V = 32, 4, 2, 8, 2, 64
    out = {
        "transformer.word_embeddings.weight": rng.standard_normal((V, d)).astype(np.float32),
        "transformer.ln_f.weight": np.ones(d, np.float32),
        "transformer.ln_f.bias": np.zeros(d, np.float32),
    }
    qkv_ref = {}
    for i in range(L):
        p = f"transformer.h.{i}"
        qkv = rng.standard_normal(((heads + 2 * hkv) * dh, d)).astype(np.float32)
        qkv_ref[i] = qkv
        out[f"{p}.self_attention.query_key_value.weight"] = qkv
        out[f"{p}.self_attention.dense.weight"] = rng.standard_normal((d, heads * dh)).astype(np.float32)
        out[f"{p}.mlp.dense_h_to_4h.weight"] = rng.standard_normal((4 * d, d)).astype(np.float32)
        out[f"{p}.mlp.dense_4h_to_h.weight"] = rng.standard_normal((d, 4 * d)).astype(np.float32)
        for nrm in ("ln_attn", "ln_mlp"):
            out[f"{p}.{nrm}.weight"] = rng.standard_normal(d).astype(np.float32)
            out[f"{p}.{nrm}.bias"] = rng.standard_normal(d).astype(np.float32)
    save_file(out, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump({
            "model_type": "falcon", "vocab_size": V, "hidden_size": d,
            "num_hidden_layers": L, "num_attention_heads": heads,
            "num_kv_heads": hkv, "new_decoder_architecture": True,
            "parallel_attn": True, "alibi": False,
        }, f)
    return qkv_ref, heads, hkv, dh


def _tiny_mpt_dir(tmp_path, rng):
    """Synthetic mpt-7b-layout checkpoint (ALiBi, no biases)."""
    from safetensors.numpy import save_file
    import json

    d, heads, L, V = 32, 4, 2, 64
    out = {
        "transformer.wte.weight": rng.standard_normal((V, d)).astype(np.float32),
        "transformer.norm_f.weight": np.ones(d, np.float32),
    }
    for i in range(L):
        p = f"transformer.blocks.{i}"
        out[f"{p}.attn.Wqkv.weight"] = rng.standard_normal((3 * d, d)).astype(np.float32)
        out[f"{p}.attn.out_proj.weight"] = rng.standard_normal((d, d)).astype(np.float32)
        out[f"{p}.ffn.up_proj.weight"] = rng.standard_normal((4 * d, d)).astype(np.float32)
        out[f"{p}.ffn.down_proj.weight"] = rng.standard_normal((d, 4 * d)).astype(np.float32)
        out[f"{p}.norm_1.weight"] = np.ones(d, np.float32)
        out[f"{p}.norm_2.weight"] = np.ones(d, np.float32)
    save_file(out, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump({
            "model_type": "mpt", "vocab_size": V, "d_model": d,
            "n_layers": L, "n_heads": heads, "expansion_ratio": 4,
            "max_seq_len": 128, "attn_config": {"alibi": True},
        }, f)


@pytest.mark.parametrize("family", ["falcon", "falcon40b", "mpt"])
def test_family_import_autoclip_tp(tmp_path, family):
    """VERDICT r1 #6 done-criterion: real HF-layout import -> autoclip ->
    TP-sharded forward parity, per family."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bitdistiller_tpu.parallel.mesh import make_mesh, param_specs_from_params, shard_params
    from bitdistiller_tpu.quant.autoclip import clip_linears, run_autoclip

    rng = np.random.default_rng(0)
    if family == "falcon":
        qkv_ref, heads, dh = _tiny_falcon_dir(tmp_path, rng)
    elif family == "falcon40b":
        qkv_ref, heads, hkv, dh = _tiny_falcon40b_dir(tmp_path, rng)
    else:
        _tiny_mpt_dir(tmp_path, rng)

    params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
    import dataclasses

    cfg = dataclasses.replace(cfg, dtype="float32")  # exact TP-vs-dense compare
    assert cfg.mlp_style == "plain" and cfg.norm_type == "layernorm"
    if family == "falcon":
        assert cfg.parallel_block and cfg.num_kv_heads == 1
        # fused qkv split: q rows first, then k, then v
        np.testing.assert_allclose(
            np.asarray(params["layers"]["k"]["w"][0]),
            qkv_ref[0][heads * dh : (heads + 1) * dh].T, rtol=1e-6,
        )
    elif family == "falcon40b":
        assert cfg.parallel_block and cfg.parallel_mlp_norm
        assert cfg.num_kv_heads == hkv
        # kv-grouped interleave [Hkv, q_per+2, dh]: group g's k rows sit after
        # its q_per query heads
        q_per = heads // hkv
        g = qkv_ref[0].reshape(hkv, q_per + 2, dh, cfg.hidden_size)
        np.testing.assert_allclose(
            np.asarray(params["layers"]["k"]["w"][0]),
            g[:, q_per].reshape(hkv * dh, -1).T, rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(params["layers"]["q"]["w"][0]),
            g[:, :q_per].reshape(heads * dh, -1).T, rtol=1e-6,
        )
        assert "mlp_norm" in params["layers"]
    else:
        assert cfg.alibi and not cfg.use_rope

    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)), jnp.int32)
    ref_logits, _ = forward(params, cfg, tokens)
    assert np.isfinite(np.asarray(ref_logits)).all()

    # autoclip over the imported tree (plain-MLP family: no 'gate' target)
    assert "gate" not in clip_linears(cfg)
    calib = rng.integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
    res = run_autoclip(params, cfg, calib, quant_type="int", n_bit=3,
                       group_size=8, apply=True)
    assert set(res["clip"][0].keys()) == set(clip_linears(cfg))

    # TP-sharded forward matches unsharded (specs derived from the tree)
    mesh = make_mesh(dp=4, tp=2)
    specs = param_specs_from_params(params)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh, specs)
        tp_logits = jax.jit(lambda p, t: forward(p, cfg, t)[0])(sharded, tokens)
    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_opt_import_and_forward(tmp_path):
    """OPT layout: learned +2-offset positions, biases everywhere, relu MLP."""
    from safetensors.numpy import save_file
    import json

    d, heads, L, V, maxp = 32, 4, 2, 64, 64
    rng = np.random.default_rng(5)
    out = {
        "model.decoder.embed_tokens.weight": rng.standard_normal((V, d)).astype(np.float32),
        "model.decoder.embed_positions.weight": rng.standard_normal((maxp + 2, d)).astype(np.float32),
        "model.decoder.final_layer_norm.weight": np.ones(d, np.float32),
        "model.decoder.final_layer_norm.bias": np.zeros(d, np.float32),
    }
    for i in range(L):
        p = f"model.decoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            out[f"{p}.self_attn.{proj}.weight"] = rng.standard_normal((d, d)).astype(np.float32)
            out[f"{p}.self_attn.{proj}.bias"] = rng.standard_normal(d).astype(np.float32)
        out[f"{p}.fc1.weight"] = rng.standard_normal((4 * d, d)).astype(np.float32)
        out[f"{p}.fc1.bias"] = rng.standard_normal(4 * d).astype(np.float32)
        out[f"{p}.fc2.weight"] = rng.standard_normal((d, 4 * d)).astype(np.float32)
        out[f"{p}.fc2.bias"] = rng.standard_normal(d).astype(np.float32)
        for nrm in ("self_attn_layer_norm", "final_layer_norm"):
            out[f"{p}.{nrm}.weight"] = np.ones(d, np.float32)
            out[f"{p}.{nrm}.bias"] = np.zeros(d, np.float32)
    save_file(out, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump({
            "model_type": "opt", "vocab_size": V, "hidden_size": d,
            "ffn_dim": 4 * d, "num_hidden_layers": L,
            "num_attention_heads": heads, "max_position_embeddings": maxp,
        }, f)

    params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
    import dataclasses

    cfg = dataclasses.replace(cfg, dtype="float32")
    assert cfg.learned_pos_embeddings and cfg.pos_embedding_offset == 2
    assert cfg.hidden_act == "relu" and not cfg.use_rope
    assert params["pos_embed"].shape == (maxp + 2, d)
    assert "b" in params["layers"]["o"]

    tokens = jnp.asarray([[1, 2, 3, 4, 5]], jnp.int32)
    full, _ = forward(params, cfg, tokens)
    assert np.isfinite(np.asarray(full)).all()
    # positions matter: shifting the start position changes logits
    from bitdistiller_tpu.models import KVCache

    cache = KVCache.init(cfg, 1, 16, dtype=jnp.float32)
    _, cache = forward(params, cfg, tokens[:, :4], cache=cache, cache_pos=0)
    step, _ = forward(params, cfg, tokens[:, 4:5], cache=cache, cache_pos=4)
    np.testing.assert_allclose(
        np.asarray(step[0, 0]), np.asarray(full[0, 4]), rtol=2e-4, atol=2e-4
    )


def test_bloom_import_qkv_interleave(tmp_path):
    """Bloom's fused query_key_value is per-head interleaved [H, 3, dh, K]."""
    from safetensors.numpy import save_file
    import json

    d, heads, L, V = 32, 4, 2, 64
    dh = d // heads
    rng = np.random.default_rng(6)
    out = {
        "transformer.word_embeddings.weight": rng.standard_normal((V, d)).astype(np.float32),
        "transformer.word_embeddings_layernorm.weight": np.ones(d, np.float32),
        "transformer.word_embeddings_layernorm.bias": np.zeros(d, np.float32),
        "transformer.ln_f.weight": np.ones(d, np.float32),
        "transformer.ln_f.bias": np.zeros(d, np.float32),
    }
    qkv_ref = {}
    for i in range(L):
        p = f"transformer.h.{i}"
        qkv = rng.standard_normal((3 * d, d)).astype(np.float32)
        qkv_b = rng.standard_normal(3 * d).astype(np.float32)
        qkv_ref[i] = (qkv, qkv_b)
        out[f"{p}.self_attention.query_key_value.weight"] = qkv
        out[f"{p}.self_attention.query_key_value.bias"] = qkv_b
        out[f"{p}.self_attention.dense.weight"] = rng.standard_normal((d, d)).astype(np.float32)
        out[f"{p}.self_attention.dense.bias"] = rng.standard_normal(d).astype(np.float32)
        out[f"{p}.mlp.dense_h_to_4h.weight"] = rng.standard_normal((4 * d, d)).astype(np.float32)
        out[f"{p}.mlp.dense_h_to_4h.bias"] = rng.standard_normal(4 * d).astype(np.float32)
        out[f"{p}.mlp.dense_4h_to_h.weight"] = rng.standard_normal((d, 4 * d)).astype(np.float32)
        out[f"{p}.mlp.dense_4h_to_h.bias"] = rng.standard_normal(d).astype(np.float32)
        for nrm in ("input_layernorm", "post_attention_layernorm"):
            out[f"{p}.{nrm}.weight"] = np.ones(d, np.float32)
            out[f"{p}.{nrm}.bias"] = np.zeros(d, np.float32)
    save_file(out, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump({
            "model_type": "bloom", "vocab_size": V, "hidden_size": d,
            "n_layer": L, "n_head": heads,
        }, f)

    params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
    import dataclasses

    cfg = dataclasses.replace(cfg, dtype="float32")
    assert cfg.alibi and cfg.embedding_norm and cfg.hidden_act == "gelu_tanh"
    # per-head interleave: head h's K rows are qkv[h*3*dh + dh : h*3*dh + 2*dh]
    qkv0, qkv_b0 = qkv_ref[0]
    want_k = np.concatenate(
        [qkv0[h * 3 * dh + dh : h * 3 * dh + 2 * dh] for h in range(heads)]
    ).T
    np.testing.assert_allclose(np.asarray(params["layers"]["k"]["w"][0]), want_k, rtol=1e-6)
    want_kb = np.concatenate(
        [qkv_b0[h * 3 * dh + dh : h * 3 * dh + 2 * dh] for h in range(heads)]
    )
    np.testing.assert_allclose(np.asarray(params["layers"]["k"]["b"][0]), want_kb, rtol=1e-6)

    tokens = jnp.asarray([[1, 2, 3, 4, 5]], jnp.int32)
    logits, _ = forward(params, cfg, tokens)
    assert np.isfinite(np.asarray(logits)).all()


def test_falcon_rw_per_head_interleave(tmp_path):
    """falcon-rw (multi_query=False, no new arch): fused qkv is per-head
    [H, 3, dh] interleaved, like bloom (HF _split_heads middle branch)."""
    from safetensors.numpy import save_file
    import json

    d, heads, L, V = 32, 4, 2, 64
    dh = d // heads
    rng = np.random.default_rng(7)
    out = {
        "transformer.word_embeddings.weight": rng.standard_normal((V, d)).astype(np.float32),
        "transformer.ln_f.weight": np.ones(d, np.float32),
        "transformer.ln_f.bias": np.zeros(d, np.float32),
    }
    qkv_ref = {}
    for i in range(L):
        p = f"transformer.h.{i}"
        qkv = rng.standard_normal((3 * d, d)).astype(np.float32)
        qkv_ref[i] = qkv
        out[f"{p}.self_attention.query_key_value.weight"] = qkv
        out[f"{p}.self_attention.dense.weight"] = rng.standard_normal((d, d)).astype(np.float32)
        out[f"{p}.mlp.dense_h_to_4h.weight"] = rng.standard_normal((4 * d, d)).astype(np.float32)
        out[f"{p}.mlp.dense_4h_to_h.weight"] = rng.standard_normal((d, 4 * d)).astype(np.float32)
        out[f"{p}.input_layernorm.weight"] = np.ones(d, np.float32)
        out[f"{p}.input_layernorm.bias"] = np.zeros(d, np.float32)
    save_file(out, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump({
            "model_type": "falcon", "vocab_size": V, "hidden_size": d,
            "num_hidden_layers": L, "num_attention_heads": heads,
            "multi_query": False, "parallel_attn": True, "alibi": True,
        }, f)

    params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert cfg.num_kv_heads == heads and not cfg.parallel_mlp_norm
    want_k = np.concatenate(
        [qkv_ref[0].reshape(heads, 3, dh, d)[h, 1] for h in range(heads)]
    ).T
    np.testing.assert_allclose(
        np.asarray(params["layers"]["k"]["w"][0]), want_k, rtol=1e-6
    )
    logits, _ = forward(params, cfg, jnp.asarray([[1, 2, 3]], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_torch_bin_shard_import(tmp_path):
    """pytorch_model*.bin shards load identically to safetensors (the
    reference ships convert_pt_to_safetensor.py to merge .bin shards;
    here the importer reads them directly, including bf16 tensors)."""
    import json
    import torch

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, dtype="float32",
    )
    rng = np.random.default_rng(3)
    d, qs, kvs, ffn = 32, cfg.q_size, cfg.kv_size, cfg.intermediate_size
    tensors = {
        "model.embed_tokens.weight": rng.standard_normal((64, d)),
        "model.norm.weight": np.ones(d),
        "lm_head.weight": rng.standard_normal((64, d)),
    }
    for i in range(2):
        p = f"model.layers.{i}."
        tensors[p + "self_attn.q_proj.weight"] = rng.standard_normal((qs, d))
        tensors[p + "self_attn.k_proj.weight"] = rng.standard_normal((kvs, d))
        tensors[p + "self_attn.v_proj.weight"] = rng.standard_normal((kvs, d))
        tensors[p + "self_attn.o_proj.weight"] = rng.standard_normal((d, qs))
        tensors[p + "mlp.gate_proj.weight"] = rng.standard_normal((ffn, d))
        tensors[p + "mlp.up_proj.weight"] = rng.standard_normal((ffn, d))
        tensors[p + "mlp.down_proj.weight"] = rng.standard_normal((d, ffn))
        tensors[p + "input_layernorm.weight"] = np.ones(d)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(d)
    config = {
        "model_type": "llama", "vocab_size": 64, "hidden_size": 32,
        "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
    }

    # two .bin shards, bf16 (the common HF shard layout)
    names = sorted(tensors)
    half = len(names) // 2
    bin_dir = tmp_path / "bin_ckpt"
    bin_dir.mkdir()
    for shard_i, shard_names in enumerate((names[:half], names[half:])):
        torch.save(
            {n: torch.asarray(np.float32(tensors[n])).to(torch.bfloat16)
             for n in shard_names},
            str(bin_dir / f"pytorch_model-{shard_i:05d}-of-00002.bin"),
        )
    with open(bin_dir / "config.json", "w") as f:
        json.dump(config, f)

    # safetensors twin with the SAME bf16 values
    from safetensors.numpy import save_file
    import ml_dtypes

    st_dir = tmp_path / "st_ckpt"
    st_dir.mkdir()
    save_file(
        {n: np.float32(tensors[n]).astype(ml_dtypes.bfloat16) for n in names},
        str(st_dir / "model.safetensors"),
    )
    with open(st_dir / "config.json", "w") as f:
        json.dump(config, f)

    p_bin, cfg_bin = load_hf_checkpoint(str(bin_dir), dtype=jnp.float32)
    p_st, cfg_st = load_hf_checkpoint(str(st_dir), dtype=jnp.float32)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p_bin, p_st,
    )
    logits, _ = forward(p_bin, cfg_bin, jnp.asarray([[1, 2, 3]], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()
