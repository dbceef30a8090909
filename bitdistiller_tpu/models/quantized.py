"""Packed-model construction: swap dense layer linears for PackedLinear.

The TPU analogue of real_quantize_model_weight + WQLinear packing
(quantization/quantizer.py:73-108, qmodule.py:70-146): every decoder linear
becomes int32-packed codes + group scales/zeros; embeddings, norms and
lm_head stay dense bf16 (the reference never quantizes lm_head,
qlinear.py:6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quant.packing import PackedLinear, pack_codes, quantize_pack_linear
from .config import ModelConfig
from .llama import LAYER_LINEARS


def _pack_stacked(w, bits, group_size, bias=None):
    """Quantize+pack a stacked [L, K, N] dense weight into a PackedLinear."""
    L, k, n = w.shape
    packed = jax.jit(jax.vmap(lambda wi: quantize_pack_linear(wi, bits, group_size)))(
        w.astype(jnp.float32)
    )
    return PackedLinear(
        qweight=packed.qweight,
        scales=packed.scales,
        szeros=packed.szeros,
        bias=bias,
        bits=bits,
        group_size=group_size if group_size > 0 else k,
        in_features=k,
        out_features=n,
    )


def pack_model(params, cfg: ModelConfig, bits: int, group_size: int = 128, fuse: bool = True):
    """Quantize+pack all layer linears of a dense param tree ([L, K, N] leaves).

    fuse=True concatenates q/k/v -> "qkv" and gate/up -> "gate_up" along the
    output dim before packing (one kernel launch each — parity with the
    reference's fused modules, inference/modules/fused_attn.py:304-370,
    fused_mlp.py:44-114; measured fastest at decode: 4 launches/layer).
    NB: quantization groups run along K, so fusing along N leaves per-group
    statistics identical to the unfused layout.
    """
    out = jax.tree_util.tree_map(lambda x: x, params)
    layers = params["layers"]
    todo = list(LAYER_LINEARS)
    if fuse:
        for parts, fused_name in ((("q", "k", "v"), "qkv"), (("gate", "up"), "gate_up")):
            if any(layers[p].get("b") is not None for p in parts):
                continue  # bias fusion not needed yet (llama family has none)
            w = jnp.concatenate([layers[p]["w"] for p in parts], axis=-1)
            out["layers"][fused_name] = _pack_stacked(w, bits, group_size)
            for p in parts:
                del out["layers"][p]
                todo.remove(p)
    for name in todo:
        leaf = layers[name]
        out["layers"][name] = _pack_stacked(leaf["w"], bits, group_size, leaf.get("b"))
    return out


def random_packed_params(
    cfg: ModelConfig, key, bits: int = 2, group_size: int = 128, dtype=jnp.bfloat16,
    fuse: bool = True,
):
    """Random packed model at full size without materializing fp weights —
    for kernel/serving benchmarks where weight values don't matter."""
    d, dh = cfg.hidden_size, cfg.actual_head_dim
    if fuse:
        shapes = {
            "qkv": (d, (cfg.num_heads + 2 * cfg.num_kv_heads) * dh),
            "o": (cfg.num_heads * dh, d),
            "gate_up": (d, 2 * cfg.intermediate_size),
            "down": (cfg.intermediate_size, d),
        }
    else:
        shapes = {
            "q": (d, cfg.num_heads * dh),
            "k": (d, cfg.num_kv_heads * dh),
            "v": (d, cfg.num_kv_heads * dh),
            "o": (cfg.num_heads * dh, d),
            "gate": (d, cfg.intermediate_size),
            "up": (d, cfg.intermediate_size),
            "down": (cfg.intermediate_size, d),
        }
    L = cfg.num_layers
    pack = 32 // bits
    keys = jax.random.split(key, len(shapes) + 2)
    layers = {
        "input_norm": jnp.ones((L, d), dtype),
        "post_attn_norm": jnp.ones((L, d), dtype),
    }
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, dh), dtype)
        layers["k_norm"] = jnp.ones((L, dh), dtype)

    @jax.jit
    def mk(key):
        out = {}
        for i, (name, (k_dim, n_dim)) in enumerate(shapes.items()):
            kk = jax.random.fold_in(key, i)
            qweight = jax.random.randint(
                kk, (L, k_dim // pack, n_dim), -(2**31), 2**31 - 1, jnp.int32
            )
            ng = k_dim // group_size
            scales = jnp.full((L, ng, n_dim), 0.01, jnp.float32)
            szeros = jnp.full((L, ng, n_dim), 0.01 * (2 ** (bits - 1)), jnp.float32)
            out[name] = (qweight, scales, szeros)
        return out

    packed_arrays = mk(keys[0])
    for name, (k_dim, n_dim) in shapes.items():
        qw, sc, sz = packed_arrays[name]
        layers[name] = PackedLinear(
            qweight=qw, scales=sc, szeros=sz, bias=None,
            bits=bits, group_size=group_size, in_features=k_dim, out_features=n_dim,
        )

    params = {
        "embed": (jax.random.normal(keys[1], (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
        "final_norm": jnp.ones((d,), dtype),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {
            "w": (jax.random.normal(keys[2], (d, cfg.vocab_size), jnp.float32) * 0.02).astype(dtype)
        }
    return params
