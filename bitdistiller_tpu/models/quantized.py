"""Packed-model construction and checkpoint IO: swap dense layer linears for
PackedLinear, save/load the packed artifact.

The TPU analogue of real_quantize_model_weight + WQLinear packing
(quantization/quantizer.py:73-108, qmodule.py:70-146): every decoder linear
becomes int32-packed codes + group scales/zeros; embeddings, norms and
lm_head stay dense bf16 (the reference never quantizes lm_head,
qlinear.py:6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quant.packing import PackedLinear, quantize_pack_linear
from .config import ModelConfig
from .llama import LAYER_LINEARS


def _pack_stacked(w, bits, group_size, bias=None, native: bool | None = None):
    """Quantize+pack a stacked [L, K, N] dense weight into a PackedLinear.

    Uses the multithreaded C++ packer (native/) on host when available —
    the conversion hot path for 7B-class checkpoints; falls back to the
    vmapped JAX implementation (bit-identical, tests/test_native.py).
    """
    import numpy as np

    L, k, n = w.shape
    if native is None:
        from ..native import native_available

        native = native_available()
    if native:
        from ..native import quantize_pack_native

        host = np.asarray(w, dtype=np.float32)
        qws, ss, szs = [], [], []
        for i in range(L):
            qw, s, sz = quantize_pack_native(host[i], bits, group_size)
            qws.append(qw)
            ss.append(s)
            szs.append(sz)
        packed_arrays = (
            jnp.asarray(np.stack(qws)),
            jnp.asarray(np.stack(ss)),
            jnp.asarray(np.stack(szs)),
        )
    else:
        packed = jax.jit(
            jax.vmap(lambda wi: quantize_pack_linear(wi, bits, group_size))
        )(w.astype(jnp.float32))
        packed_arrays = (packed.qweight, packed.scales, packed.szeros)
    from ..quant.packing import make_scale_combo

    return PackedLinear(
        qweight=packed_arrays[0],
        scales=packed_arrays[1],
        szeros=packed_arrays[2],
        bias=bias,
        bits=bits,
        group_size=group_size if group_size > 0 else k,
        in_features=k,
        out_features=n,
        combo=make_scale_combo(packed_arrays[1], packed_arrays[2]),
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
    todo = [n for n in LAYER_LINEARS if n in layers]
    if fuse:
        for parts, fused_name in ((("q", "k", "v"), "qkv"), (("gate", "up"), "gate_up")):
            if not all(p in layers for p in parts):
                continue  # plain-MLP families have no 'gate'
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

    from ..quant.packing import make_scale_combo

    packed_arrays = mk(keys[0])
    for name, (k_dim, n_dim) in shapes.items():
        qw, sc, sz = packed_arrays[name]
        layers[name] = PackedLinear(
            qweight=qw, scales=sc, szeros=sz, bias=None,
            bits=bits, group_size=group_size, in_features=k_dim, out_features=n_dim,
            combo=make_scale_combo(sc, sz),
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


# ---------------------------------------------------------------------------
# Packed checkpoint artifact (replaces the reference's torch .pt dump,
# inference/dump_quant.py:52-65 / utils/load_quant.py:85-159)
# ---------------------------------------------------------------------------


def save_packed_checkpoint(path, packed_params, cfg: ModelConfig, *, bits: int,
                           group_size: int):
    """Write packed params + config to a directory (npz + json)."""
    import json
    import os

    import numpy as np

    os.makedirs(path, exist_ok=True)
    flat = {}

    def to_np(x):
        # np.savez cannot represent ml_dtypes bfloat16 (round-trips as void);
        # store floats as f32 and restore the model dtype on load
        a = np.asarray(x)
        if a.dtype.kind not in ("i", "u", "b"):
            a = a.astype(np.float32)
        return a

    def put(prefix, leaf):
        if isinstance(leaf, PackedLinear):
            flat[f"{prefix}/qweight"] = np.asarray(leaf.qweight)
            flat[f"{prefix}/scales"] = to_np(leaf.scales)
            flat[f"{prefix}/szeros"] = to_np(leaf.szeros)
            if leaf.bias is not None:
                flat[f"{prefix}/bias"] = to_np(leaf.bias)
            flat[f"{prefix}/__meta"] = np.asarray(
                [leaf.bits, leaf.group_size, leaf.in_features, leaf.out_features]
            )
        elif isinstance(leaf, dict):
            for k, v in leaf.items():
                put(f"{prefix}/{k}", v)
        else:
            flat[prefix] = to_np(leaf)

    for k, v in packed_params.items():
        put(k, v)
    np.savez(os.path.join(path, "packed.npz"), **flat)
    meta = {
        "bits": bits,
        "group_size": group_size,
        "config": {
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_layers": cfg.num_layers,
            "num_heads": cfg.num_heads,
            "num_kv_heads": cfg.num_kv_heads,
            "head_dim": cfg.head_dim,
            "rms_norm_eps": cfg.rms_norm_eps,
            "rope_theta": cfg.rope_theta,
            "max_position_embeddings": cfg.max_position_embeddings,
            "tie_word_embeddings": cfg.tie_word_embeddings,
            "attention_bias": cfg.attention_bias,
            "qk_norm": cfg.qk_norm,
            "hidden_act": cfg.hidden_act,
            "dtype": cfg.dtype,
        },
    }
    with open(os.path.join(path, "quant_config.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_packed_checkpoint(path):
    """Load a packed checkpoint dir -> (params, cfg)."""
    import json
    import os

    import numpy as np

    with open(os.path.join(path, "quant_config.json")) as f:
        meta = json.load(f)
    cfg = ModelConfig(**meta["config"])
    data = np.load(os.path.join(path, "packed.npz"))

    tree: dict = {}
    packed_groups: dict = {}
    for key in data.files:
        parts = key.split("/")
        if parts[-1] in ("qweight", "scales", "szeros", "bias", "__meta"):
            packed_groups.setdefault("/".join(parts[:-1]), {})[parts[-1]] = data[key]
        else:
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            arr = jnp.asarray(data[key])
            if jnp.issubdtype(arr.dtype, jnp.floating):
                arr = arr.astype(jnp.dtype(cfg.dtype))
            node[parts[-1]] = arr
    from ..quant.packing import make_scale_combo

    for prefix, fields in packed_groups.items():
        b, g, kf, nf = (int(v) for v in fields["__meta"])
        scales = jnp.asarray(fields["scales"])
        szeros = jnp.asarray(fields["szeros"])
        leaf = PackedLinear(
            qweight=jnp.asarray(fields["qweight"]),
            scales=scales,
            szeros=szeros,
            bias=jnp.asarray(fields["bias"]) if "bias" in fields else None,
            bits=b, group_size=g, in_features=kf, out_features=nf,
            combo=make_scale_combo(scales, szeros),  # derived, not stored
        )
        node = tree
        parts = prefix.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree, cfg
