"""Import HF Llama-family checkpoints (safetensors) into the stacked pytree.

Replaces the reference's reliance on transformers AutoModelForCausalLM
(quantization/clip_utils.py:310-326) with a direct safetensors -> jnp loader:
no torch graph, no per-module surgery; weights are transposed to the [K, N]
x@W convention and stacked along the layer axis for lax.scan.
"""

from __future__ import annotations

import glob
import json
import os

import jax.numpy as jnp
import numpy as np

from .config import ModelConfig

try:
    from safetensors import safe_open

    HAVE_SAFETENSORS = True
except ImportError:  # pragma: no cover
    HAVE_SAFETENSORS = False


_HF_LAYER_MAP = {
    "input_norm": ("input_layernorm.weight", False),
    "post_attn_norm": ("post_attention_layernorm.weight", False),
    "q": ("self_attn.q_proj.weight", True),
    "k": ("self_attn.k_proj.weight", True),
    "v": ("self_attn.v_proj.weight", True),
    "o": ("self_attn.o_proj.weight", True),
    "gate": ("mlp.gate_proj.weight", True),
    "up": ("mlp.up_proj.weight", True),
    "down": ("mlp.down_proj.weight", True),
    "q_norm": ("self_attn.q_norm.weight", False),
    "k_norm": ("self_attn.k_norm.weight", False),
    # gemma3 sandwich norms
    "pre_ffn_norm": ("pre_feedforward_layernorm.weight", False),
    "post_ffn_norm": ("post_feedforward_layernorm.weight", False),
}
_HF_BIAS_MAP = {
    "q": "self_attn.q_proj.bias",
    "k": "self_attn.k_proj.bias",
    "v": "self_attn.v_proj.bias",
}


def _load_all_tensors(path: str) -> dict[str, np.ndarray]:
    tensors: dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    for f in files:
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                tensors[name] = st.get_tensor(name)
    return tensors


def _to_np(t: np.ndarray) -> np.ndarray:
    # numpy lacks bfloat16; safetensors numpy framework returns ml_dtypes bf16,
    # which jnp.asarray accepts directly.
    return t


def load_hf_checkpoint(path: str, cfg: ModelConfig | None = None, dtype=jnp.bfloat16):
    """Load an HF checkpoint dir -> (params, cfg)."""
    if cfg is None:
        cfg = ModelConfig.from_pretrained(path)
    raw = _load_all_tensors(path)

    def get(name):
        if name in raw:
            return raw[name]
        alt = "model." + name
        if alt in raw:
            return raw[alt]
        raise KeyError(name)

    def has(name):
        return name in raw or ("model." + name) in raw

    L = cfg.num_layers
    layers: dict[str, object] = {}

    # Phi-3 stores fused qkv_proj / gate_up_proj — split to our layout
    phi3_fused = has("model.layers.0.self_attn.qkv_proj.weight")

    def fused_split(i: int):
        qkv = _to_np(get(f"model.layers.{i}.self_attn.qkv_proj.weight"))  # [Nq+2Nkv, K]
        gu = _to_np(get(f"model.layers.{i}.mlp.gate_up_proj.weight"))  # [2F, K]
        qs, kvs = cfg.q_size, cfg.kv_size
        return {
            "q": qkv[:qs].T,
            "k": qkv[qs : qs + kvs].T,
            "v": qkv[qs + kvs :].T,
            "gate": gu[: cfg.intermediate_size].T,
            "up": gu[cfg.intermediate_size :].T,
        }

    for ours, (theirs, transpose) in _HF_LAYER_MAP.items():
        if ours in ("q_norm", "k_norm") and not cfg.qk_norm:
            continue
        if ours in ("pre_ffn_norm", "post_ffn_norm") and not cfg.sandwich_norm:
            continue
        if phi3_fused and ours in ("q", "k", "v", "gate", "up"):
            stacked = np.stack(
                [np.ascontiguousarray(fused_split(i)[ours]) for i in range(L)]
            )
            layers[ours] = jnp.asarray(stacked).astype(dtype)
            continue
        per_layer = []
        for i in range(L):
            t = _to_np(get(f"model.layers.{i}.{theirs}"))
            if transpose:
                t = np.ascontiguousarray(t.T)  # HF [out, in] -> ours [K, N]
            per_layer.append(t)
        layers[ours] = jnp.asarray(np.stack(per_layer)).astype(dtype)

    for ours, theirs in _HF_BIAS_MAP.items():
        if has(f"model.layers.0.{theirs}"):
            stacked = np.stack([_to_np(get(f"model.layers.{i}.{theirs}")) for i in range(L)])
            layers[ours] = {"w": layers[ours], "b": jnp.asarray(stacked).astype(dtype)}

    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        if not isinstance(layers[name], dict):
            layers[name] = {"w": layers[name]}

    params = {
        "embed": jnp.asarray(_to_np(get("model.embed_tokens.weight"))).astype(dtype),
        "final_norm": jnp.asarray(_to_np(get("model.norm.weight"))).astype(dtype),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings and has("lm_head.weight"):
        lm = _to_np(get("lm_head.weight"))
        params["lm_head"] = {"w": jnp.asarray(np.ascontiguousarray(lm.T)).astype(dtype)}
    return params, cfg


def save_hf_checkpoint(params, cfg: ModelConfig, path: str, dtype=None):
    """Export back to HF-layout safetensors (single shard) + config.json,
    parity with the reference's consolidated save (train/train.py:139-145).

    dtype: optional numpy/ml_dtypes dtype to cast float tensors on save —
    the reference's convert_bf16_to_fp16.py as a flag."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)

    def cast(a: np.ndarray) -> np.ndarray:
        if dtype is not None and a.dtype.kind not in ("i", "u", "b"):
            return a.astype(dtype)
        return a

    out: dict[str, np.ndarray] = {}
    out["model.embed_tokens.weight"] = cast(np.asarray(params["embed"]))
    out["model.norm.weight"] = cast(np.asarray(params["final_norm"]))
    L = cfg.num_layers
    for ours, (theirs, transpose) in _HF_LAYER_MAP.items():
        if ours not in params["layers"]:
            continue
        leaf = params["layers"][ours]
        arr = leaf["w"] if isinstance(leaf, dict) else leaf
        for i in range(L):
            t = np.asarray(arr[i])
            if transpose:
                t = np.ascontiguousarray(t.T)
            out[f"model.layers.{i}.{theirs}"] = cast(t)
        if isinstance(leaf, dict) and "b" in leaf and ours in _HF_BIAS_MAP:
            for i in range(L):
                out[f"model.layers.{i}.{_HF_BIAS_MAP[ours]}"] = cast(np.asarray(leaf["b"][i]))
    if "lm_head" in params:
        out["lm_head.weight"] = cast(np.ascontiguousarray(np.asarray(params["lm_head"]["w"]).T))
    # ml_dtypes bf16 arrays save fine via safetensors numpy backend
    save_file(out, os.path.join(path, "model.safetensors"))
    cfg_json = {
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_position_embeddings,
        "tie_word_embeddings": cfg.tie_word_embeddings,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg_json, f, indent=2)
