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
# per family; families whose HF layout fuses q/k/v carry a ("__qkv__", path)
# entry instead — export re-fuses our split heads in the family layout
# (the exact inverse of hf_import's split).
_GPTQ_LAYER_MAP = {
    "q": "self_attn.q_proj",
    "k": "self_attn.k_proj",
    "v": "self_attn.v_proj",
    "o": "self_attn.o_proj",
    "gate": "mlp.gate_proj",
    "up": "mlp.up_proj",
    "down": "mlp.down_proj",
}

_FAMILY_LAYER_MAPS = {
    "llama": _GPTQ_LAYER_MAP,
    "falcon": {
        "__qkv__": "self_attention.query_key_value",
        "o": "self_attention.dense",
        "up": "mlp.dense_h_to_4h",
        "down": "mlp.dense_4h_to_h",
    },
    "bloom": {
        "__qkv__": "self_attention.query_key_value",
        "o": "self_attention.dense",
        "up": "mlp.dense_h_to_4h",
        "down": "mlp.dense_4h_to_h",
    },
    "mpt": {
        "__qkv__": "attn.Wqkv",
        "o": "attn.out_proj",
        "up": "ffn.up_proj",
        "down": "ffn.down_proj",
    },
    "opt": {
        "q": "self_attn.q_proj",
        "k": "self_attn.k_proj",
        "v": "self_attn.v_proj",
        "o": "self_attn.out_proj",
        "up": "fc1",
        "down": "fc2",
    },
}

_FAMILY_LAYER_PREFIX = {
    "llama": "model.layers", "opt": "model.decoder.layers",
    "falcon": "transformer.h", "bloom": "transformer.h",
    "mpt": "transformer.blocks",
}


def fuse_qkv_hf(cfg: ModelConfig, q_kn, k_kn, v_kn) -> np.ndarray:
    """Re-fuse our split q/k/v [K, N*] into the family's fused HF layout,
    returned as [K, N_fused] — the exact inverse of hf_import's split_qkv
    (falcon grouped / per-head, bloom per-head, mpt sequential)."""
    q = np.asarray(q_kn)
    k = np.asarray(k_kn)
    v = np.asarray(v_kn)
    K = q.shape[0]
    dh = cfg.actual_head_dim
    hq, hkv = cfg.num_heads, cfg.num_kv_heads
    if cfg.model_type == "mpt":
        return np.concatenate([q, k, v], axis=1)
    if cfg.model_type == "bloom" or (cfg.model_type == "falcon" and hkv == hq
                                     and not cfg.parallel_mlp_norm):
        # per-head interleave [H, 3, dh] (bloom always; falcon-rw MHA)
        g = np.stack(
            [q.reshape(K, hq, dh), k.reshape(K, hq, dh), v.reshape(K, hq, dh)],
            axis=2,
        )  # [K, H, 3, dh]
        return g.reshape(K, hq * 3 * dh)
    if cfg.model_type == "falcon":
        if cfg.parallel_mlp_norm:
            # new-arch grouped layout [hkv, q_per + 2, dh]
            q_per = hq // hkv
            g = np.concatenate(
                [
                    q.reshape(K, hkv, q_per, dh),
                    k.reshape(K, hkv, 1, dh),
                    v.reshape(K, hkv, 1, dh),
                ],
                axis=2,
            )  # [K, hkv, q_per+2, dh]
            return g.reshape(K, (hq + 2 * hkv) * dh)
        # falcon MQA: plain [q heads..., k, v]
        return np.concatenate([q, k, v], axis=1)
    raise ValueError(f"no fused-qkv layout for family {cfg.model_type!r}")


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


def packed_layer_to_gptq(p, li: int, bits: int, group_size: int) -> dict:
    """One layer slice of a PackedLinear (stacked [L, ...]) -> GPTQ tensors
    WITHOUT requantizing: unpack the pair-layout codes to k-order, recover
    integer zero points from szeros = zeros * scales, and re-pack in GPTQ's
    k-sequential order. Exact — the serving artifact and the GPTQ artifact
    hold identical integer codes."""
    from ..quant.packing import unpack_codes

    qw = np.asarray(p.qweight[li])
    scales = np.asarray(p.scales[li], np.float32)
    szeros = np.asarray(p.szeros[li], np.float32)
    codes = np.asarray(unpack_codes(qw, bits, group_size))  # [K, N]
    zeros = np.rint(szeros / np.where(scales == 0, 1.0, scales)).astype(np.int32)
    k = codes.shape[0]
    return {
        "qweight": pack_gptq_qweight(codes, bits),
        "qzeros": pack_gptq_qzeros(zeros, bits),
        "scales": scales.astype(np.float16),
        "g_idx": (np.arange(k, dtype=np.int32) // group_size),
    }


def split_packed_n(p, splits: list[int]):
    """Split a stacked fused PackedLinear along N at the given boundaries
    (e.g. qkv -> q/k/v, gate_up -> gate/up). All per-N arrays slice
    together; group-wise quant params are per output column, so the split
    tensors are exactly what separate quantization would have produced."""
    import dataclasses

    outs = []
    start = 0
    for width in splits:
        outs.append(
            dataclasses.replace(
                p,
                qweight=p.qweight[..., start : start + width],
                scales=p.scales[..., start : start + width],
                szeros=p.szeros[..., start : start + width],
                combo=None if p.combo is None else p.combo[..., start : start + width],
                bias=None if p.bias is None else p.bias[..., start : start + width],
                out_features=width,
            )
        )
        start += width
    return outs


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


# family-specific non-linear tensor names: (embed, final_norm_w,
# final_norm_b|None, input_norm, post_attn_norm)
_FAMILY_AUX_NAMES = {
    "llama": ("model.embed_tokens.weight", "model.norm.weight", None,
              "input_layernorm", "post_attention_layernorm"),
    "opt": ("model.decoder.embed_tokens.weight",
            "model.decoder.final_layer_norm.weight",
            "model.decoder.final_layer_norm.bias",
            "self_attn_layer_norm", "final_layer_norm"),
    "falcon": ("transformer.word_embeddings.weight", "transformer.ln_f.weight",
               "transformer.ln_f.bias", "input_layernorm",
               "post_attention_layernorm"),
    "bloom": ("transformer.word_embeddings.weight", "transformer.ln_f.weight",
              "transformer.ln_f.bias", "input_layernorm",
              "post_attention_layernorm"),
    "mpt": ("transformer.wte.weight", "transformer.norm_f.weight", None,
            "norm_1", "norm_2"),
}


def export_gptq(params, cfg: ModelConfig, path: str, *, bits: int = 2,
                group_size: int = 128) -> None:
    """Write a GPTQ-format safetensors checkpoint + configs to `path`.

    Handles every importable family (llama-likes by default; falcon / bloom /
    mpt / opt re-fuse q/k/v in the family's HF layout), dense QAT trees
    (RTN-quantized here, identical math to the reference converter), and
    PACKED serving trees — including fused qkv / gate_up leaves, which are
    split along N (exact: quant groups are per output column) and re-emitted
    without requantization."""
    from safetensors.numpy import save_file

    from ..quant.packing import PackedLinear

    os.makedirs(path, exist_ok=True)
    family = cfg.model_type if cfg.model_type in _FAMILY_LAYER_MAPS else "llama"
    layer_map = _FAMILY_LAYER_MAPS[family]
    prefix = _FAMILY_LAYER_PREFIX[family]
    embed_name, fnw, fnb, in_norm, post_norm = _FAMILY_AUX_NAMES[family]

    out: dict[str, np.ndarray] = {}
    out[embed_name] = np.asarray(params["embed"], np.float16)
    fn = params["final_norm"]
    if isinstance(fn, dict):
        out[fnw] = np.asarray(fn["w"], np.float16)
        if fnb:
            out[fnb] = np.asarray(fn["b"], np.float16)
    else:
        out[fnw] = np.asarray(fn, np.float16)
    if "lm_head" in params:
        out["lm_head.weight"] = np.ascontiguousarray(
            np.asarray(params["lm_head"]["w"], np.float16).T
        )

    layers = dict(params["layers"])
    L = cfg.num_layers
    dh, hq, hkv = cfg.actual_head_dim, cfg.num_heads, cfg.num_kv_heads

    # fused PACKED leaves -> split views under the standard names
    if "qkv" in layers and isinstance(layers["qkv"], PackedLinear):
        q, k, v = split_packed_n(
            layers.pop("qkv"), [hq * dh, hkv * dh, hkv * dh]
        )
        layers.update({"q": q, "k": k, "v": v})
    if "gate_up" in layers and isinstance(layers["gate_up"], PackedLinear):
        g, u = split_packed_n(
            layers.pop("gate_up"), [cfg.intermediate_size, cfg.intermediate_size]
        )
        layers.update({"gate": g, "up": u})

    def emit(name: str, leaf, i: int, theirs: str):
        if isinstance(leaf, PackedLinear):
            tensors = packed_layer_to_gptq(leaf, i, leaf.bits, leaf.group_size)
        else:
            w = leaf["w"] if isinstance(leaf, dict) else leaf
            tensors = layer_to_gptq(np.asarray(w[i]), bits, group_size)
        for tname, arr in tensors.items():
            out[f"{prefix}.{i}.{theirs}.{tname}"] = arr
        if isinstance(leaf, dict) and leaf.get("b") is not None:
            out[f"{prefix}.{i}.{theirs}.bias"] = np.asarray(leaf["b"][i], np.float16)

    for ours, theirs in layer_map.items():
        if ours == "__qkv__":
            for i in range(L):
                fused = fuse_qkv_hf(
                    cfg,
                    layers["q"]["w"][i], layers["k"]["w"][i], layers["v"]["w"][i],
                )
                tensors = layer_to_gptq(fused, bits, group_size)
                for tname, arr in tensors.items():
                    out[f"{prefix}.{i}.{theirs}.{tname}"] = arr
            continue
        if ours not in layers:
            continue
        leaf = layers[ours]
        for i in range(L):
            emit(ours, leaf, i, theirs)
    for norm_ours, norm_theirs in (
        ("input_norm", in_norm),
        ("post_attn_norm", post_norm),
        ("mlp_norm", "ln_mlp"),
    ):
        if norm_ours not in layers:
            continue
        leaf = layers[norm_ours]
        arr = leaf["w"] if isinstance(leaf, dict) else leaf
        for i in range(L):
            out[f"{prefix}.{i}.{norm_theirs}.weight"] = np.asarray(
                arr[i], np.float16
            )
            if isinstance(leaf, dict) and "b" in leaf:
                out[f"{prefix}.{i}.{norm_theirs}.bias"] = np.asarray(
                    leaf["b"][i], np.float16
                )
    # falcon new-arch names its input norm ln_attn (dual-norm blocks)
    if family == "falcon" and "mlp_norm" in layers:
        for i in range(L):
            for suffix in ("weight", "bias"):
                key = f"{prefix}.{i}.{in_norm}.{suffix}"
                if key in out:
                    out[f"{prefix}.{i}.ln_attn.{suffix}"] = out.pop(key)

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
