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
