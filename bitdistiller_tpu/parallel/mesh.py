"""Device mesh + sharding rules.

TPU-native replacement for the reference's distribution stack (DeepSpeed
ZeRO DP over NCCL, train/config/zero.json; DDP generation, generate.py:176):
one `jax.sharding.Mesh` with axes

    dp — data parallel (batch dim; optimizer state sharded here = ZeRO)
    tp — tensor parallel (attention heads / ffn / vocab; ICI collectives)

Collectives are emitted by XLA from sharding annotations, not hand-written.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


# ---------------------------------------------------------------------------
# Parameter partition specs
# ---------------------------------------------------------------------------

# Megatron-style TP sharding of the stacked-layer param tree ([L, K, N] leaves):
#   column-parallel (shard N): q, k, v, gate, up      -> P(None, fsdp, "tp")
#   row-parallel    (shard K): o, down                -> P(None, "tp", fsdp)
# and the embedding/lm_head over vocab. `fsdp_axis="dp"` additionally shards
# the other matrix dim over dp — the ZeRO-3 analogue; None = pure DP
# (replicated params, sharded data/optimizer handled by the train step).
_COL = ("q", "k", "v", "gate", "up")
_ROW = ("o", "down")


_COL_FUSED = ("qkv", "gate_up")  # fused projections shard their concat (N) axis


def param_specs_from_params(params, fsdp_axis: str | None = None) -> dict:
    """Derive the partition-spec tree from the ACTUAL param tree structure —
    works for every family (falcon's single-norm parallel block, mpt's
    bias-less layernorms, gemma sandwich norms, qwen biases) because it
    mirrors whatever leaves exist instead of assuming the llama layout.
    """
    f = fsdp_axis

    def rep(leaf):
        return P(*([None] * leaf.ndim))

    def linear_spec(name, leaf):
        col = name in _COL or name in _COL_FUSED
        out: dict = {"w": P(None, f, "tp") if col else P(None, "tp", f)}
        if isinstance(leaf, dict) and "b" in leaf:
            out["b"] = P(None, "tp") if col else P(None, None)
        return out

    layers: dict = {}
    for name, leaf in params["layers"].items():
        if name in _COL or name in _ROW or name in _COL_FUSED:
            layers[name] = linear_spec(name, leaf)
        else:  # norms and other per-layer vectors: replicated
            layers[name] = jax.tree_util.tree_map(rep, leaf)
    specs = {
        "embed": P("tp", f),  # vocab-sharded embedding
        "final_norm": jax.tree_util.tree_map(rep, params["final_norm"]),
        "layers": layers,
    }
    if "lm_head" in params:
        specs["lm_head"] = {"w": P(f, "tp")}
    # any other top-level leaves (pos_embed, embed_norm, ...) replicate
    for key in params:
        if key not in specs:
            specs[key] = jax.tree_util.tree_map(rep, params[key])
    return specs


def param_specs(cfg: ModelConfig, fsdp_axis: str | None = None) -> dict:
    """Spec tree for init_params(cfg)'s structure (derived from an abstract
    init so it can never drift from the real tree)."""
    from ..models import llama

    shapes = jax.eval_shape(
        lambda: llama.init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    )
    return param_specs_from_params(shapes, fsdp_axis)


def packed_param_specs(cfg: ModelConfig) -> dict:
    """Partition specs when layer linears are PackedLinear leaves (unfused
    q/k/v/gate/up/down layout — TP sharding of the fused qkv/gate_up concat
    axis would split gate from up across shards; use pack_model(fuse=False)
    for multi-chip serving).

    qweight [L, K//pack, N] / scales / szeros [L, K//G, N] shard like the
    dense weight: column-parallel shards N (lanes), row-parallel shards the
    packed K rows (both K//pack and K//G divide evenly for tp | 8 on 7B
    shapes).
    """
    specs = param_specs(cfg)
    for name in _COL:
        specs["layers"][name] = P(None, None, "tp")
    for name in _ROW:
        specs["layers"][name] = P(None, "tp", None)
    return specs


def kv_cache_specs(quantized: bool = False):
    """KV cache [L, B, Hkv, T, Dh]: batch over dp, kv heads over tp.
    quantized=True adds specs for the int8 cache's [L, B, Hkv, T] scales."""
    from ..models.llama import KVCache

    kv = P(None, "dp", "tp", None, None)
    if quantized:
        s = P(None, "dp", "tp", None)
        return KVCache(k=kv, v=kv, k_scale=s, v_scale=s)
    return KVCache(k=kv, v=kv)


def shard_packed_model(params, mesh: Mesh, cfg: ModelConfig):
    """device_put a packed (unfused, pack_model(fuse=False)) param tree with
    Megatron TP sharding. PackedLinear leaves shard qweight/scales/szeros
    together along N (column-parallel) or packed-K rows (row-parallel)."""
    import dataclasses as dc

    from ..quant.packing import PackedLinear

    specs = packed_param_specs(cfg)

    def put_leaf(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, spec))

    out = {k: v for k, v in params.items()}
    out["embed"] = put_leaf(params["embed"], specs["embed"])
    out["final_norm"] = jax.tree_util.tree_map(
        put_leaf, params["final_norm"], specs["final_norm"]
    )
    if "lm_head" in params:
        out["lm_head"] = {"w": put_leaf(params["lm_head"]["w"], specs["lm_head"]["w"])}
    layers = {}
    for name, leaf in params["layers"].items():
        spec = specs["layers"].get(name)
        if isinstance(leaf, PackedLinear):
            layers[name] = dc.replace(
                leaf,
                qweight=put_leaf(leaf.qweight, spec),
                scales=put_leaf(leaf.scales, spec),
                szeros=put_leaf(leaf.szeros, spec),
                combo=put_leaf(leaf.combo, spec),
                bias=put_leaf(leaf.bias, P(None, spec[2]) if spec[2] else P(None, None))
                if leaf.bias is not None
                else None,
            )
        elif isinstance(leaf, dict):
            layers[name] = {k: put_leaf(v, spec[k] if isinstance(spec, dict) else spec) for k, v in leaf.items()}
        else:
            layers[name] = put_leaf(leaf, spec if spec is not None else P(None, None))
    out["layers"] = layers
    return out


def zero_extend_spec(spec: P, shape: tuple, dp_size: int, axis: str = "dp") -> P:
    """ZeRO-2 moment sharding: extend a param spec with `axis` on the first
    unsharded dim whose size divides evenly by dp. Falls back to the original
    spec (replicated over dp) for small/indivisible leaves.

    Reference: DeepSpeed ZeRO stage 2 shards optimizer state over data ranks
    (train/config/zero.json); with pjit the same effect is an out_sharding on
    the Adam moments — XLA then reduce-scatters grads into the moment shard
    and all-gathers the param update, like ZeRO's bucketed collectives.
    """
    entries = list(spec) + [None] * (len(shape) - len(spec))
    if axis in entries:
        return spec  # already sharded over dp (ZeRO-3 / fsdp params)
    for d, (e, n) in enumerate(zip(entries, shape)):
        if e is None and n % dp_size == 0 and n >= dp_size:
            entries[d] = axis
            return P(*entries)
    return spec


def opt_state_specs(opt, params, specs, dp_size: int, zero_stage: int = 2):
    """Partition-spec tree for `opt.init(params)`'s state.

    Param-shaped leaves (Adam mu/nu, MultiSteps acc_grads) get the param's
    spec, extended over dp when zero_stage >= 2 (if the params are already
    fsdp/dp-sharded — stage 3 — the spec passes through unchanged). Scalar
    bookkeeping (step counts) is replicated.
    """
    import optax

    shapes = jax.eval_shape(opt.init, params)
    if zero_stage < 2:
        ext = lambda sds, spec: spec
    else:
        ext = lambda sds, spec: zero_extend_spec(spec, sds.shape, dp_size)
    return optax.tree_map_params(
        opt, ext, shapes, specs, transform_non_params=lambda sds: P(),
    )


def shard_params(params, mesh: Mesh, specs) -> dict:
    """Device_put the param tree according to the spec tree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: x is None,
    )


def batch_spec() -> P:
    return P("dp")
