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
    if files:
        for f in files:
            with safe_open(f, framework="numpy") as st:
                for name in st.keys():
                    tensors[name] = st.get_tensor(name)
        return tensors
    # torch .bin shard fallback (the format train/convert_pt_to_safetensor.py
    # exists to merge away; loading it directly makes the converter optional)
    bins = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if not bins:
        raise FileNotFoundError(f"no .safetensors or pytorch_model*.bin under {path}")
    import ml_dtypes
    import torch

    for f in bins:
        sd = torch.load(f, map_location="cpu", weights_only=True)
        for name, t in sd.items():
            if t.dtype == torch.bfloat16:
                tensors[name] = t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
            else:
                tensors[name] = t.numpy()
    return tensors


def _to_np(t: np.ndarray) -> np.ndarray:
    # numpy lacks bfloat16; safetensors numpy framework returns ml_dtypes bf16,
    # which jnp.asarray accepts directly.
    return t


def _load_falcon(raw: dict, cfg: ModelConfig, dtype):
    """Falcon checkpoints (tiiuae/falcon-7b layout; reference
    inference/models/falcon.py, clip_utils.py get_blocks 'falcon' branch).

    The fused query_key_value weight has three layouts (HF
    modeling_falcon.py `_split_heads`):
    - multi-query (falcon-7b, num_kv_heads=1): sequential [H*dh | dh | dh]
    - full-MHA (falcon-rw, multi_query=False): per-head interleave [H, 3, dh]
    - new_decoder_architecture (40B/180B, cfg.parallel_mlp_norm): kv-grouped
      interleave [Hkv, q_per_kv+2, dh], plus dual ln_attn/ln_mlp norms.
    """
    L = cfg.num_layers
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.actual_head_dim
    q_rows = hq * dh
    kv_rows = hkv * dh

    def split_qkv(qkv):  # [(hq+2*hkv)*dh, K] -> q/k/v in model head order
        kdim = qkv.shape[-1]
        if cfg.parallel_mlp_norm:
            q_per = hq // hkv
            g = np.asarray(qkv).reshape(hkv, q_per + 2, dh, kdim)
            return (
                g[:, :q_per].reshape(q_rows, kdim),
                g[:, q_per].reshape(kv_rows, kdim),
                g[:, q_per + 1].reshape(kv_rows, kdim),
            )
        if hkv == hq:  # falcon-rw full MHA: [H, 3, dh] per-head interleave
            g = np.asarray(qkv).reshape(hq, 3, dh, kdim)
            return tuple(g[:, j].reshape(q_rows, kdim) for j in range(3))
        return qkv[:q_rows], qkv[q_rows : q_rows + kv_rows], qkv[q_rows + kv_rows :]

    names = ("input_norm_w", "input_norm_b", "q", "k", "v", "o", "up", "down")
    if cfg.parallel_mlp_norm:
        names += ("mlp_norm_w", "mlp_norm_b")
    layers: dict = {n: [] for n in names}
    for i in range(L):
        p = f"transformer.h.{i}"
        qkv = raw[f"{p}.self_attention.query_key_value.weight"]  # [(H+2hkv)*dh, K]
        q, k, v = split_qkv(qkv)
        layers["q"].append(q.T)
        layers["k"].append(k.T)
        layers["v"].append(v.T)
        layers["o"].append(raw[f"{p}.self_attention.dense.weight"].T)
        layers["up"].append(raw[f"{p}.mlp.dense_h_to_4h.weight"].T)
        layers["down"].append(raw[f"{p}.mlp.dense_4h_to_h.weight"].T)
        if cfg.parallel_mlp_norm:
            layers["input_norm_w"].append(raw[f"{p}.ln_attn.weight"])
            layers["input_norm_b"].append(raw[f"{p}.ln_attn.bias"])
            layers["mlp_norm_w"].append(raw[f"{p}.ln_mlp.weight"])
            layers["mlp_norm_b"].append(raw[f"{p}.ln_mlp.bias"])
        else:
            layers["input_norm_w"].append(raw[f"{p}.input_layernorm.weight"])
            layers["input_norm_b"].append(raw[f"{p}.input_layernorm.bias"])

    def stack(xs):
        return jnp.asarray(np.stack([np.ascontiguousarray(x) for x in xs])).astype(dtype)

    out_layers = {
        "input_norm": {"w": stack(layers["input_norm_w"]), "b": stack(layers["input_norm_b"])},
        "q": {"w": stack(layers["q"])},
        "k": {"w": stack(layers["k"])},
        "v": {"w": stack(layers["v"])},
        "o": {"w": stack(layers["o"])},
        "up": {"w": stack(layers["up"])},
        "down": {"w": stack(layers["down"])},
    }
    if cfg.parallel_mlp_norm:
        out_layers["mlp_norm"] = {
            "w": stack(layers["mlp_norm_w"]), "b": stack(layers["mlp_norm_b"])
        }
    if not cfg.parallel_block:
        # falcon variants with parallel_attn=False carry a post-attention norm
        out_layers["post_attn_norm"] = {
            "w": stack([raw[f"transformer.h.{i}.post_attention_layernorm.weight"] for i in range(L)]),
            "b": stack([raw[f"transformer.h.{i}.post_attention_layernorm.bias"] for i in range(L)]),
        }
    params = {
        "embed": jnp.asarray(raw["transformer.word_embeddings.weight"]).astype(dtype),
        "final_norm": {
            "w": jnp.asarray(raw["transformer.ln_f.weight"]).astype(dtype),
            "b": jnp.asarray(raw["transformer.ln_f.bias"]).astype(dtype),
        },
        "layers": out_layers,
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in raw:
        params["lm_head"] = {
            "w": jnp.asarray(np.ascontiguousarray(raw["lm_head.weight"].T)).astype(dtype)
        }
    return params


def _load_mpt(raw: dict, cfg: ModelConfig, dtype):
    """MPT checkpoints (mosaicml/mpt-7b layout; reference
    inference/models/mpt.py, clip_utils.py get_blocks 'mpt' branch).
    Wqkv [3D, D] splits sequentially; LayerNorms have no bias (no_bias=True),
    stored here with explicit zero biases for the layernorm leaf format."""
    L = cfg.num_layers
    d = cfg.hidden_size
    kv = cfg.kv_size

    def stack(xs):
        return jnp.asarray(np.stack([np.ascontiguousarray(x) for x in xs])).astype(dtype)

    def norm(prefix):
        w = stack([raw[f"transformer.blocks.{i}.{prefix}.weight"] for i in range(L)])
        bias_key = f"transformer.blocks.0.{prefix}.bias"
        if bias_key in raw:
            b = stack([raw[f"transformer.blocks.{i}.{prefix}.bias"] for i in range(L)])
        else:
            b = jnp.zeros_like(w)
        return {"w": w, "b": b}

    qs, ks, vs, os_, ups, downs = [], [], [], [], [], []
    for i in range(L):
        p = f"transformer.blocks.{i}"
        wqkv = raw[f"{p}.attn.Wqkv.weight"]  # [D + 2*kv, D]
        qs.append(wqkv[:d].T)
        ks.append(wqkv[d : d + kv].T)
        vs.append(wqkv[d + kv :].T)
        os_.append(raw[f"{p}.attn.out_proj.weight"].T)
        ups.append(raw[f"{p}.ffn.up_proj.weight"].T)
        downs.append(raw[f"{p}.ffn.down_proj.weight"].T)
    out_layers = {
        "input_norm": norm("norm_1"),
        "post_attn_norm": norm("norm_2"),
        "q": {"w": stack(qs)},
        "k": {"w": stack(ks)},
        "v": {"w": stack(vs)},
        "o": {"w": stack(os_)},
        "up": {"w": stack(ups)},
        "down": {"w": stack(downs)},
    }
    fw = jnp.asarray(raw["transformer.norm_f.weight"]).astype(dtype)
    fb = (
        jnp.asarray(raw["transformer.norm_f.bias"]).astype(dtype)
        if "transformer.norm_f.bias" in raw
        else jnp.zeros_like(fw)
    )
    return {
        "embed": jnp.asarray(raw["transformer.wte.weight"]).astype(dtype),
        "final_norm": {"w": fw, "b": fb},
        "layers": out_layers,
    }


def _load_opt(raw: dict, cfg: ModelConfig, dtype):
    """OPT checkpoints (facebook/opt-* layout; reference clip_utils get_blocks
    OPTForCausalLM branch). Learned positions table kept with its +2 offset;
    biases on every projection and norm."""
    L = cfg.num_layers

    def t(name):
        key = f"model.decoder.{name}"
        if key not in raw:
            key = f"decoder.{name}"
        return raw[key]

    def stack(fn):
        return jnp.asarray(np.stack([np.ascontiguousarray(fn(i)) for i in range(L)])).astype(dtype)

    def linear(name):
        leaf = {"w": stack(lambda i: t(f"layers.{i}.{name}.weight").T)}
        if f"model.decoder.layers.0.{name}.bias" in raw or f"decoder.layers.0.{name}.bias" in raw:
            leaf["b"] = stack(lambda i: t(f"layers.{i}.{name}.bias"))
        return leaf

    def norm(name):
        return {
            "w": stack(lambda i: t(f"layers.{i}.{name}.weight")),
            "b": stack(lambda i: t(f"layers.{i}.{name}.bias")),
        }

    layers = {
        "input_norm": norm("self_attn_layer_norm"),
        "post_attn_norm": norm("final_layer_norm"),
        "q": linear("self_attn.q_proj"),
        "k": linear("self_attn.k_proj"),
        "v": linear("self_attn.v_proj"),
        "o": linear("self_attn.out_proj"),
        "up": linear("fc1"),
        "down": linear("fc2"),
    }
    params = {
        "embed": jnp.asarray(t("embed_tokens.weight")).astype(dtype),
        "pos_embed": jnp.asarray(t("embed_positions.weight")).astype(dtype),
        "final_norm": {
            "w": jnp.asarray(t("final_layer_norm.weight")).astype(dtype),
            "b": jnp.asarray(t("final_layer_norm.bias")).astype(dtype),
        },
        "layers": layers,
    }
    return params


def _load_bloom(raw: dict, cfg: ModelConfig, dtype):
    """Bloom checkpoints (bigscience/bloom-* layout; reference clip_utils
    get_blocks BloomForCausalLM branch). The fused query_key_value is
    PER-HEAD interleaved [H, 3, dh, K] — split accordingly."""
    L = cfg.num_layers
    H, dh = cfg.num_heads, cfg.actual_head_dim

    def stack(fn):
        return jnp.asarray(np.stack([np.ascontiguousarray(fn(i)) for i in range(L)])).astype(dtype)

    def norm(prefix):
        return {
            "w": stack(lambda i: raw[f"transformer.h.{i}.{prefix}.weight"]),
            "b": stack(lambda i: raw[f"transformer.h.{i}.{prefix}.bias"]),
        }

    def qkv_part(i, which):  # which: 0=q, 1=k, 2=v
        w = raw[f"transformer.h.{i}.self_attention.query_key_value.weight"]
        return w.reshape(H, 3, dh, -1)[:, which].reshape(H * dh, -1).T  # [K, H*dh]

    def qkv_bias(i, which):
        b = raw[f"transformer.h.{i}.self_attention.query_key_value.bias"]
        return b.reshape(H, 3, dh)[:, which].reshape(H * dh)

    def lin(wfn, bfn=None):
        leaf = {"w": stack(wfn)}
        if bfn is not None:
            leaf["b"] = stack(bfn)
        return leaf

    layers = {
        "input_norm": norm("input_layernorm"),
        "post_attn_norm": norm("post_attention_layernorm"),
        "q": lin(lambda i: qkv_part(i, 0), lambda i: qkv_bias(i, 0)),
        "k": lin(lambda i: qkv_part(i, 1), lambda i: qkv_bias(i, 1)),
        "v": lin(lambda i: qkv_part(i, 2), lambda i: qkv_bias(i, 2)),
        "o": lin(
            lambda i: raw[f"transformer.h.{i}.self_attention.dense.weight"].T,
            lambda i: raw[f"transformer.h.{i}.self_attention.dense.bias"],
        ),
        "up": lin(
            lambda i: raw[f"transformer.h.{i}.mlp.dense_h_to_4h.weight"].T,
            lambda i: raw[f"transformer.h.{i}.mlp.dense_h_to_4h.bias"],
        ),
        "down": lin(
            lambda i: raw[f"transformer.h.{i}.mlp.dense_4h_to_h.weight"].T,
            lambda i: raw[f"transformer.h.{i}.mlp.dense_4h_to_h.bias"],
        ),
    }
    return {
        "embed": jnp.asarray(raw["transformer.word_embeddings.weight"]).astype(dtype),
        "embed_norm": {
            "w": jnp.asarray(raw["transformer.word_embeddings_layernorm.weight"]).astype(dtype),
            "b": jnp.asarray(raw["transformer.word_embeddings_layernorm.bias"]).astype(dtype),
        },
        "final_norm": {
            "w": jnp.asarray(raw["transformer.ln_f.weight"]).astype(dtype),
            "b": jnp.asarray(raw["transformer.ln_f.bias"]).astype(dtype),
        },
        "layers": layers,
    }


def load_hf_checkpoint(path: str, cfg: ModelConfig | None = None, dtype=jnp.bfloat16):
    """Load an HF checkpoint dir -> (params, cfg). Families: llama/tinyllama,
    qwen2/3, phi3 (fused qkv), gemma2/3, falcon, mpt, opt, bloom — the
    reference's full get_blocks registry (clip_utils.py:234-290)."""
    if cfg is None:
        cfg = ModelConfig.from_pretrained(path)
    raw = _load_all_tensors(path)

    if any(k.startswith("transformer.blocks.") for k in raw):
        return _load_mpt(raw, cfg, dtype), cfg
    if "transformer.word_embeddings_layernorm.weight" in raw:
        return _load_bloom(raw, cfg, dtype), cfg
    if any(k.startswith("transformer.h.") for k in raw):
        return _load_falcon(raw, cfg, dtype), cfg
    if any("decoder.layers." in k for k in raw):
        return _load_opt(raw, cfg, dtype), cfg

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
