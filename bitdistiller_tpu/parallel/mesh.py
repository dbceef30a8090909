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


def param_specs(cfg: ModelConfig, fsdp_axis: str | None = None) -> dict:
    f = fsdp_axis
    layers: dict = {
        "input_norm": P(None, None),
        "post_attn_norm": P(None, None),
    }
    for name in _COL:
        layers[name] = {"w": P(None, f, "tp")}
    for name in _ROW:
        layers[name] = {"w": P(None, "tp", f)}
    if cfg.attention_bias:
        for name in ("q", "k", "v"):
            layers[name]["b"] = P(None, "tp")
    if cfg.mlp_bias:
        for name in ("gate", "up"):
            layers[name]["b"] = P(None, "tp")
        layers["down"]["b"] = P(None, None)
    if cfg.qk_norm:
        layers["q_norm"] = P(None, None)
        layers["k_norm"] = P(None, None)
    specs = {
        "embed": P("tp", f),  # vocab-sharded embedding
        "final_norm": P(None),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = {"w": P(f, "tp")}
    return specs


def packed_param_specs(cfg: ModelConfig) -> dict:
    """Partition specs when layer linears are PackedLinear leaves.

    qweight [L, K//pack, N] / scales / szeros [L, K//G, N] shard like the
    dense weight: column-parallel shards N (lanes), row-parallel shards the
    packed K rows (both K//pack and K//G divide evenly for tp | 8 on 7B
    shapes).
    """
    specs = param_specs(cfg)
    for name in _COL:
        specs["layers"][name] = PackedLinearSpec(P(None, None, "tp"))
    for name in _ROW:
        specs["layers"][name] = PackedLinearSpec(P(None, "tp", None))
    return specs


def PackedLinearSpec(spec: P):
    from ..quant.packing import PackedLinear

    return PackedLinear(
        qweight=spec, scales=spec, szeros=spec, bias=None,
        bits=0, group_size=0, in_features=0, out_features=0,
    )


def shard_params(params, mesh: Mesh, specs) -> dict:
    """Device_put the param tree according to the spec tree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: x is None,
    )


def batch_spec() -> P:
    return P("dp")
