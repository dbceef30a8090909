"""Export a (QAT-trained, fake-quant) checkpoint to the GPTQ packed format.

Parity with the reference's convert_hf_to_gptq_manual.py:11-200: quantize
each linear with the RTN asym group math (identical to quantizer.py:25-69),
then emit the standard GPTQ tensor set per layer —

  qweight : int32 [K/pack, N]   word r packs code(k = r*pack + i) at bit i*bits
  qzeros  : int32 [K/G, N/pack] word c packs zero(n = c*pack + i) at bit i*bits
  scales  : f16   [K/G, N]
  g_idx   : int32 [K] = k // G

— alongside the untouched norm/embedding tensors, in HF safetensors naming,
plus a quantize_config.json, so AutoGPTQ/gptqmodel loaders can consume the
artifact. (Our own serving path uses the TPU pair layout, quant/packing.py;
this exporter exists for interop.)
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..quant.core import quantize_int
from .config import ModelConfig

# ours -> HF module path (weights transposed back to HF [N, K] orientation
# happens implicitly: GPTQ's qweight is [K/pack, N], i.e. K-major like ours)
_GPTQ_LAYER_MAP = {
    "q": "self_attn.q_proj",
    "k": "self_attn.k_proj",
    "v": "self_attn.v_proj",
    "o": "self_attn.o_proj",
    "gate": "mlp.gate_proj",
    "up": "mlp.up_proj",
    "down": "mlp.down_proj",
}


def pack_gptq_qweight(codes: np.ndarray, bits: int) -> np.ndarray:
    """codes [K, N] ints in [0, 2^bits) -> int32 [K/pack, N], k-sequential."""
    k, n = codes.shape
    pack = 32 // bits
    assert k % pack == 0, (k, pack)
    q = codes.reshape(k // pack, pack, n).astype(np.uint32)
    shifts = (np.arange(pack, dtype=np.uint32) * bits)[None, :, None]
    return (q << shifts).sum(axis=1, dtype=np.uint32).view(np.int32)


def pack_gptq_qzeros(zeros: np.ndarray, bits: int) -> np.ndarray:
    """zeros [K/G, N] ints -> int32 [K/G, N/pack], n-sequential."""
    ng, n = zeros.shape
    pack = 32 // bits
    assert n % pack == 0, (n, pack)
    z = zeros.reshape(ng, n // pack, pack).astype(np.uint32)
    shifts = (np.arange(pack, dtype=np.uint32) * bits)[None, None, :]
    return (z << shifts).sum(axis=2, dtype=np.uint32).view(np.int32)


def unpack_gptq_qweight(qweight: np.ndarray, bits: int) -> np.ndarray:
    """Inverse of pack_gptq_qweight (for tests / load checks)."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    w = qweight.view(np.uint32)
    parts = [(w >> (i * bits)) & mask for i in range(pack)]
    return np.stack(parts, axis=1).reshape(-1, qweight.shape[1]).astype(np.int32)


def layer_to_gptq(w_kn, bits: int, group_size: int) -> dict:
    """Our [K, N] dense weight -> the GPTQ tensor dict for one linear."""
    import jax.numpy as jnp

    k, n = w_kn.shape
    # identical value math to the reference's get_hf_quant_params (RTN asym).
    # quantize_int groups along the LAST axis; our [K, N] weights group along
    # K per output column, so quantize the transpose (same grid as training)
    codes_g, params = quantize_int(jnp.asarray(w_kn, jnp.float32).T, bits, group_size)
    codes = np.asarray(codes_g).reshape(n, k).T  # [K, N]
    scales = np.asarray(params.scales).reshape(n, k // group_size).T  # [K/G, N]
    zeros = np.asarray(params.zeros).reshape(n, k // group_size).T.astype(np.int32)
    return {
        "qweight": pack_gptq_qweight(codes, bits),
        "qzeros": pack_gptq_qzeros(zeros, bits),
        "scales": scales.astype(np.float16),
        "g_idx": (np.arange(k, dtype=np.int32) // group_size),
    }


def export_gptq(params, cfg: ModelConfig, path: str, *, bits: int = 2,
                group_size: int = 128) -> None:
    """Write a GPTQ-format safetensors checkpoint + configs to `path`."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    out: dict[str, np.ndarray] = {}
    out["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float16)
    fn = params["final_norm"]
    if isinstance(fn, dict):
        out["model.norm.weight"] = np.asarray(fn["w"], np.float16)
        out["model.norm.bias"] = np.asarray(fn["b"], np.float16)
    else:
        out["model.norm.weight"] = np.asarray(fn, np.float16)
    if "lm_head" in params:
        out["lm_head.weight"] = np.ascontiguousarray(
            np.asarray(params["lm_head"]["w"], np.float16).T
        )

    layers = params["layers"]
    L = cfg.num_layers
    for ours, theirs in _GPTQ_LAYER_MAP.items():
        if ours not in layers:
            continue
        leaf = layers[ours]
        w = leaf["w"] if isinstance(leaf, dict) else leaf
        for i in range(L):
            tensors = layer_to_gptq(np.asarray(w[i]), bits, group_size)
            for name, arr in tensors.items():
                out[f"model.layers.{i}.{theirs}.{name}"] = arr
            if isinstance(leaf, dict) and leaf.get("b") is not None:
                out[f"model.layers.{i}.{theirs}.bias"] = np.asarray(
                    leaf["b"][i], np.float16
                )
    for norm_ours, norm_theirs in (
        ("input_norm", "input_layernorm"),
        ("post_attn_norm", "post_attention_layernorm"),
    ):
        if norm_ours not in layers:
            continue
        leaf = layers[norm_ours]
        arr = leaf["w"] if isinstance(leaf, dict) else leaf
        for i in range(L):
            out[f"model.layers.{i}.{norm_theirs}.weight"] = np.asarray(
                arr[i], np.float16
            )

    save_file(out, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "quantize_config.json"), "w") as f:
        json.dump(
            {
                "bits": bits,
                "group_size": group_size,
                "desc_act": False,
                "sym": False,
                "quant_method": "gptq",
            },
            f,
            indent=2,
        )
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "llama",
                "vocab_size": cfg.vocab_size,
                "hidden_size": cfg.hidden_size,
                "intermediate_size": cfg.intermediate_size,
                "num_hidden_layers": cfg.num_layers,
                "num_attention_heads": cfg.num_heads,
                "num_key_value_heads": cfg.num_kv_heads,
                "quantization_config": {
                    "quant_method": "gptq",
                    "bits": bits,
                    "group_size": group_size,
                    "desc_act": False,
                    "sym": False,
                },
            },
            f,
            indent=2,
        )
