"""GPipe-style pipeline parallelism over a `pp` mesh axis.

The reference reaches pipeline parallelism only through vLLM — its teacher
generator falls back to PP when a model's KV heads don't divide the tensor
degree (data/generation/generate_vllm.py:18-19); the in-house engine has
none. Here PP is a first-class mesh axis, TPU-style: the decoder's stacked
layer params ([L, ...] leaves) are sharded along L over `pp`, and the
forward runs one `shard_map` program in which every stage scans its LOCAL
L/S layers and hands the activation to the next stage with
`lax.ppermute`, microbatch-pipelined (fill/drain schedule) so all stages
stay busy after the first S-1 ticks.

Scope (v1): the cache-less forward (prefill / eval / the KD teacher+student
forward) on uniform-layer configs — the slice that PP actually buys memory
headroom for. Decode serving uses TP (parallel/mesh.py), matching the
reference's deployment practice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import llama
from ..models.config import ModelConfig
from ..models.layers import (
    apply_norm,
    linear,
    rope_cos_sin,
    rope_scaling_params,
)


def make_pp_mesh(pp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < pp:
        raise ValueError(f"pp={pp} > device count {len(devices)}")
    import numpy as np

    return Mesh(np.asarray(devices[:pp]), axis_names=("pp",))


def pp_param_specs(params) -> dict:
    """Layer-stacked leaves ([L, ...]) shard along L over `pp`; everything
    else (embed / final_norm / lm_head) replicates."""

    def spec_tree(tree, layered):
        return jax.tree_util.tree_map(
            lambda _: P("pp") if layered else P(), tree
        )

    out = {}
    for k, v in params.items():
        out[k] = spec_tree(v, layered=(k == "layers"))
    return out


def shard_params_pp(params, mesh: Mesh):
    specs = pp_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def pipeline_forward(
    params,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, S] int32; B % n_micro == 0
    mesh: Mesh,
    *,
    n_micro: int = 2,
    quantizer=None,
    logits_dtype=jnp.float32,
) -> jnp.ndarray:
    """Cache-less decoder forward, pipelined over the mesh's `pp` axis.

    Schedule (GPipe): at tick t, stage s processes microbatch (t - s); the
    activation advances one stage per tick via ppermute. n_micro + S - 1
    ticks total; every stage runs every tick (SPMD — invalid ticks compute
    on don't-care data and are masked at the boundaries), so the bubble
    fraction is the usual (S-1)/(n_micro+S-1).

    Returns logits [B, S, V] — verified identical to llama.forward on the
    same params (tests/test_pipeline_parallel.py).
    """
    S = mesh.shape["pp"]
    if cfg.num_layers % S != 0:
        raise ValueError(f"num_layers {cfg.num_layers} % pp {S} != 0")
    b, s = tokens.shape
    if b % n_micro != 0:
        raise ValueError(f"batch {b} % n_micro {n_micro} != 0")
    mb = b // n_micro
    compute_dtype = jnp.dtype(cfg.dtype)

    # --- replicated pre/post stages (tiny next to the layer stack) -------
    h = params["embed"][tokens].astype(compute_dtype)
    if cfg.embedding_multiplier != 1.0:
        h = h * jnp.asarray(cfg.embedding_multiplier, compute_dtype)
    positions = jnp.arange(s)[None, :]
    inv_freq, rope_mscale = rope_scaling_params(
        cfg, cfg.actual_head_dim, cfg.rope_theta
    )
    cos, sin = rope_cos_sin(
        positions, cfg.actual_head_dim, cfg.rope_theta, compute_dtype,
        inv_freq=inv_freq, mscale=rope_mscale,
    )
    micro = h.reshape(n_micro, mb, s, -1)

    lp_stack = params["layers"]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(pp_param_specs({"layers": lp_stack})["layers"], P()),
        out_specs=P(),
    )
    def run_pipeline(local_layers, micro_in):
        stage = jax.lax.axis_index("pp")
        n_ticks = n_micro + S - 1

        def local_block(x):
            def body(hidden, lp):
                new_h, _ = llama._block(
                    cfg, lp, hidden, cos, sin, None, None, 0, quantizer
                )
                return new_h, None

            y, _ = jax.lax.scan(body, x, local_layers)
            return y

        def tick(carry, t):
            x, outs = carry
            y = local_block(x)
            # pass forward one stage (ring: the wrap-around edge only ever
            # carries don't-care data — stage 0 sources fresh microbatches)
            y_prev = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % S) for i in range(S)]
            )
            # the LAST stage emits microbatch t-(S-1) at this tick
            out_m = t - (S - 1)
            emit = jnp.logical_and(stage == S - 1, out_m >= 0)
            outs = jax.lax.cond(
                emit,
                lambda o: jax.lax.dynamic_update_slice(
                    o, y[None], (jnp.maximum(out_m, 0), 0, 0, 0)
                ),
                lambda o: o,
                outs,
            )
            # stage 0 ingests microbatch t+1 next tick; others take the
            # handed-forward activation
            nxt = jnp.clip(t + 1, 0, n_micro - 1)
            x_next = jnp.where(
                stage == 0, jax.lax.dynamic_index_in_dim(
                    micro_in, nxt, axis=0, keepdims=False
                ), y_prev,
            )
            return (x_next, outs), None

        x0 = jax.lax.dynamic_index_in_dim(micro_in, 0, axis=0, keepdims=False)
        outs0 = jnp.zeros_like(micro_in)
        # the layer params are pp-varying, so the scan carry becomes
        # varying after one tick — mark the (replicated) initial values
        # accordingly for shard_map's varying-axes checker
        pcast = getattr(jax.lax, "pcast", lambda x, axes, to: x)
        x0 = pcast(x0, ("pp",), to="varying")
        outs0 = pcast(outs0, ("pp",), to="varying")
        (x, outs), _ = jax.lax.scan(
            tick, (x0, outs0), jnp.arange(n_ticks, dtype=jnp.int32)
        )
        # only the last stage holds real outputs — select it across the axis
        mask = (stage == S - 1).astype(outs.dtype)
        return jax.lax.psum(outs * mask, "pp")

    hidden = run_pipeline(lp_stack, micro).reshape(b, s, -1)

    hidden = apply_norm(
        params["final_norm"], hidden, cfg.rms_norm_eps, cfg.norm_offset
    )
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = hidden @ params["embed"].T.astype(hidden.dtype)
    else:
        logits = linear(params["lm_head"], hidden)
    return logits.astype(logits_dtype)
