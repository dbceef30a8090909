"""GPTQ-format export: packing roundtrips, value parity with the PTQ path,
and a full-checkpoint export smoke test.

Reference: train/convert_hf_to_gptq_manual.py:11-200 (qweight k-sequential
int32 packing, qzeros n-sequential, f16 scales, g_idx)."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from bitdistiller_tpu.models import TINY_TEST, init_params
from bitdistiller_tpu.models.gptq_export import (
    export_gptq,
    layer_to_gptq,
    pack_gptq_qweight,
    pack_gptq_qzeros,
    unpack_gptq_qweight,
)
from bitdistiller_tpu.quant.core import fake_quant_int


def test_qweight_pack_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (64, 32)).astype(np.int32)
    packed = pack_gptq_qweight(codes, 2)
    assert packed.shape == (4, 32) and packed.dtype == np.int32
    np.testing.assert_array_equal(unpack_gptq_qweight(packed, 2), codes)


def test_qzeros_pack_layout():
    rng = np.random.default_rng(1)
    zeros = rng.integers(0, 4, (2, 32)).astype(np.int32)
    packed = pack_gptq_qzeros(zeros, 2)
    assert packed.shape == (2, 2)
    # n-sequential: word c bit-field i holds zeros[:, c*16 + i]
    w = packed.view(np.uint32)
    for g in range(2):
        for c in range(2):
            for i in range(16):
                assert (w[g, c] >> (2 * i)) & 3 == zeros[g, c * 16 + i]


def test_layer_values_match_ptq_fake_quant():
    """Dequantizing the GPTQ tensors must reproduce the PTQ fake-quant
    weights exactly (same grid as training/serving: K-axis groups)."""
    rng = np.random.default_rng(2)
    w = rng.standard_normal((128, 64)).astype(np.float32)  # [K, N]
    t = layer_to_gptq(w, bits=2, group_size=32)
    codes = unpack_gptq_qweight(t["qweight"], 2).astype(np.float32)  # [K, N]
    scales = t["scales"].astype(np.float32)  # [K/G, N]
    pack = 16
    zw = t["qzeros"].view(np.uint32)
    zeros = np.stack(
        [(zw >> (2 * i)) & 3 for i in range(pack)], axis=2
    ).reshape(zw.shape[0], -1).astype(np.float32)
    g_idx = t["g_idx"]
    deq = (codes - zeros[g_idx]) * scales[g_idx]
    want = np.asarray(fake_quant_int(jnp.asarray(w.T), 2, 32, ste=False)).T
    np.testing.assert_allclose(deq, want, rtol=2e-3, atol=2e-3)  # f16 scales


def test_export_full_checkpoint(tmp_path):
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    export_gptq(params, cfg, str(tmp_path), bits=2, group_size=32)
    from safetensors import safe_open

    with safe_open(str(tmp_path / "model.safetensors"), framework="numpy") as st:
        keys = set(st.keys())
    for piece in ("qweight", "qzeros", "scales", "g_idx"):
        assert f"model.layers.0.self_attn.q_proj.{piece}" in keys
    assert "model.embed_tokens.weight" in keys
    qc = json.load(open(tmp_path / "quantize_config.json"))
    assert qc["bits"] == 2 and qc["group_size"] == 32 and not qc["sym"]


def test_packed_tree_export_exact(tmp_path):
    """Exporting a PACKED (fused qkv/gate_up) serving tree emits the SAME
    integer codes as the packed artifact — split along N, no requantize."""
    from safetensors.numpy import load_file

    from bitdistiller_tpu.models.gptq_export import packed_layer_to_gptq
    from bitdistiller_tpu.models.quantized import pack_model
    from bitdistiller_tpu.quant.packing import unpack_codes

    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    packed = pack_model(params, cfg, bits=2, group_size=32, fuse=True)
    assert "qkv" in packed["layers"] and "gate_up" in packed["layers"]
    export_gptq(packed, cfg, str(tmp_path / "g"), bits=2, group_size=32)
    out = load_file(str(tmp_path / "g" / "model.safetensors"))
    # q slice of layer 0 must hold exactly the first hq*dh columns of the
    # fused packed codes
    fused = packed["layers"]["qkv"]
    want = np.asarray(unpack_codes(np.asarray(fused.qweight[0]), 2, 32))
    qdim = cfg.num_heads * cfg.actual_head_dim
    got = unpack_gptq_qweight(out["model.layers.0.self_attn.q_proj.qweight"], 2)
    np.testing.assert_array_equal(got, want[:, :qdim])
    # scales match the packed artifact's
    np.testing.assert_allclose(
        out["model.layers.0.self_attn.q_proj.scales"].astype(np.float32),
        np.asarray(fused.scales[0][:, :qdim], np.float32), rtol=1e-3,
    )
    # gate/up split
    got_up = unpack_gptq_qweight(out["model.layers.0.mlp.up_proj.qweight"], 2)
    fgu = np.asarray(unpack_codes(np.asarray(packed["layers"]["gate_up"].qweight[0]), 2, 32))
    np.testing.assert_array_equal(got_up, fgu[:, cfg.intermediate_size:])


def test_family_export_falcon_fused_qkv(tmp_path):
    """Falcon-family export re-fuses q/k/v into query_key_value in the HF
    grouped layout: import(split) o fuse == identity on the fused weight."""
    import dataclasses

    from bitdistiller_tpu.models.gptq_export import fuse_qkv_hf

    # new-arch falcon shape: hq=8, hkv=2, dh=16
    cfg = dataclasses.replace(
        TINY_TEST, model_type="falcon", num_heads=8, num_kv_heads=2,
        head_dim=16, parallel_mlp_norm=True,
    )
    K = cfg.hidden_size
    dh, hq, hkv = 16, 8, 2
    rng = np.random.default_rng(3)
    fused_hf = rng.standard_normal(((hq + 2 * hkv) * dh, K)).astype(np.float32)

    # replicate hf_import's split (hf_import.py split_qkv, new-arch branch)
    q_per = hq // hkv
    g = fused_hf.reshape(hkv, q_per + 2, dh, K)
    q = g[:, :q_per].reshape(hq * dh, K).T
    k = g[:, q_per].reshape(hkv * dh, K).T
    v = g[:, q_per + 1].reshape(hkv * dh, K).T

    refused = fuse_qkv_hf(cfg, q, k, v)  # [K, N_fused]
    np.testing.assert_array_equal(refused.T, fused_hf)


def test_family_export_mpt_and_bloom_layouts():
    import dataclasses

    from bitdistiller_tpu.models.gptq_export import fuse_qkv_hf

    rng = np.random.default_rng(4)
    K, H, dh = 64, 4, 8
    q = rng.standard_normal((K, H * dh)).astype(np.float32)
    k = rng.standard_normal((K, H * dh)).astype(np.float32)
    v = rng.standard_normal((K, H * dh)).astype(np.float32)

    mpt = dataclasses.replace(TINY_TEST, model_type="mpt", num_heads=H,
                              num_kv_heads=H, head_dim=dh)
    fused = fuse_qkv_hf(mpt, q, k, v)
    np.testing.assert_array_equal(fused, np.concatenate([q, k, v], axis=1))

    bloom = dataclasses.replace(TINY_TEST, model_type="bloom", num_heads=H,
                                num_kv_heads=H, head_dim=dh)
    fused_b = fuse_qkv_hf(bloom, q, k, v)
    # inverse of _load_bloom's per-head split: w.reshape(H,3,dh,K)[:,0] == q.T
    w = fused_b.T.reshape(H, 3, dh, K)
    np.testing.assert_array_equal(w[:, 0].reshape(H * dh, K), q.T)
    np.testing.assert_array_equal(w[:, 2].reshape(H * dh, K), v.T)


def test_family_export_opt_names(tmp_path):
    import dataclasses

    from safetensors.numpy import load_file

    cfg = dataclasses.replace(TINY_TEST, model_type="opt", mlp_style="plain")
    params = init_params(TINY_TEST, jax.random.key(1), dtype=jnp.float32)
    # opt trees have no gate; drop it for the family shape
    params["layers"] = {k: v for k, v in params["layers"].items() if k != "gate"}
    export_gptq(params, cfg, str(tmp_path / "o"), bits=2, group_size=32)
    out = load_file(str(tmp_path / "o" / "model.safetensors"))
    assert "model.decoder.layers.0.self_attn.out_proj.qweight" in out
    assert "model.decoder.layers.0.fc1.qweight" in out
    assert "model.decoder.embed_tokens.weight" in out
