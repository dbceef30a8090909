"""AutoClip: per-group asymmetric clip-range search on calibration activations.

Reference parity (quantization/autoclip.py:13-207):
  * per linear layer (skipping q/k projections, :96-98), per output channel,
    per K-group: grid search over (1 - i/n_grid) shrink factors of the group
    max and min independently — n_grid=20, max_shrink=0.5 => 10x10 grid;
  * objective: MSE between (input_feat * w).sum over the group and the same
    with clamp+fake-quantized w, on <=512 sampled tokens (:47-65);
  * weights are clipped in place after each block; activations for the next
    block are produced by the *unclipped* block (:183 vs :197 ordering);
  * output artifact: {name: (max_val, min_val)} per linear, saved to disk.

TPU-first: the whole per-layer search is one jitted function — a lax.scan
over the 100 grid points and lax.map over output-channel chunks replace the
reference's python loops; activation capture is plain functional forwarding
(no hooks).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.layers import linear
from .core import fake_quant_int, fake_quant_nf3

CLIP_SKIP = ("q", "k")  # qk bmm is hard to clip precisely (autoclip.py:97)


def clip_linears(cfg: ModelConfig) -> tuple[str, ...]:
    """Clip targets for this architecture: every linear except q/k
    (autoclip.py:96-98 skip list). Gated MLPs clip gate+up, plain MLPs
    (falcon/mpt) only up."""
    names = ["v", "o"]
    if cfg.mlp_style == "gated":
        names += ["gate", "up"]
    else:
        names += ["up"]
    return tuple(names + ["down"])


def capture_block_inputs(
    cfg: ModelConfig, lp, h: jnp.ndarray, cos, sin, mask, attn_bias=None
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Run llama._block itself with a capturing linear hook, returning
    (next_hidden, {linear_name: input}).

    Running the REAL block (not a hand-written mirror) makes capture correct
    for every family flag combination — parallel_block (falcon),
    plain MLP (falcon/mpt), LayerNorm leaves, sandwich norms (gemma),
    ALiBi (mpt) — the way the reference's nn.Linear forward hooks are
    (autoclip.py:170-180).
    """
    from ..models import llama

    caps: dict[str, jnp.ndarray] = {}

    def capture_lin(name, leaf, x):
        caps[name] = x
        return linear(leaf, x)

    new_h, _ = llama._block(
        cfg, lp, h, cos, sin, mask, None, 0, None,
        attn_bias=attn_bias, linear_fn=capture_lin,
    )
    return new_h, caps


def _quantize_for_search(w, quant_type: str, n_bit: int, group_size: int):
    if quant_type == "int":
        return fake_quant_int(w, n_bit, group_size, ste=False)
    if quant_type == "nf3":
        return fake_quant_nf3(w, group_size, ste=False)
    raise ValueError(f"quant_type must be 'int' or 'nf3', got {quant_type!r}")


@functools.partial(
    jax.jit,
    static_argnames=("quant_type", "n_bit", "group_size", "n_grid", "max_shrink", "oc_chunk"),
)
def search_layer_clip(
    w_kn: jnp.ndarray,  # [K, N]
    input_feat: jnp.ndarray,  # [T, K] sampled tokens
    *,
    quant_type: str,
    n_bit: int,
    group_size: int,
    n_grid: int = 20,
    max_shrink: float = 0.5,
    oc_chunk: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (best_max, best_min), each [N, K//G] — per-OC per-group clips."""
    k, n = w_kn.shape
    g = group_size if group_size > 0 else k
    ng = k // g
    # [N, ng, G] per-OC grouped weights (transposed: OC leads like the ref)
    w = w_kn.astype(jnp.float32).T.reshape(n, ng, g)
    feat = input_feat.astype(jnp.float32).reshape(-1, ng, g)  # [T, ng, G]

    steps = int(max_shrink * n_grid)
    shrinks = 1.0 - jnp.arange(steps, dtype=jnp.float32) / n_grid  # [steps]
    # all (pos, neg) combos, scanned sequentially to bound memory
    combo = jnp.stack(
        jnp.meshgrid(shrinks, shrinks, indexing="ij"), axis=-1
    ).reshape(-1, 2)  # [steps^2, 2]

    def per_chunk(w_c):  # w_c: [C, ng, G]
        org_max = w_c.max(axis=-1, keepdims=True)  # [C, ng, 1]
        org_min = w_c.min(axis=-1, keepdims=True)
        org_out = jnp.einsum("tgk,cgk->ctg", feat, w_c)  # [C, T, ng]

        def step(carry, sh):
            best_err, best_max, best_min = carry
            max_val = org_max * sh[0]
            min_val = org_min * sh[1]
            cur = jnp.clip(w_c, min_val, max_val)
            q = _quantize_for_search(cur, quant_type, n_bit, g)
            out = jnp.einsum("tgk,cgk->ctg", feat, q)
            err = jnp.mean((out - org_out) ** 2, axis=1)[:, :, None]  # [C, ng, 1]
            better = err < best_err
            return (
                jnp.where(better, err, best_err),
                jnp.where(better, max_val, best_max),
                jnp.where(better, min_val, best_min),
            ), None

        init = (jnp.full_like(org_max, 1e9), org_max, org_min)
        (err, bmax, bmin), _ = jax.lax.scan(step, init, combo)
        return bmax[..., 0], bmin[..., 0]  # [C, ng]

    if n % oc_chunk == 0 and n > oc_chunk:
        w_chunks = w.reshape(n // oc_chunk, oc_chunk, ng, g)
        bmax, bmin = jax.lax.map(per_chunk, w_chunks)
        return bmax.reshape(n, ng), bmin.reshape(n, ng)
    return per_chunk(w)


def apply_clip_to_weight(w_kn: jnp.ndarray, max_val: jnp.ndarray, min_val: jnp.ndarray):
    """Clamp [K, N] weight by per-(OC, group) ranges ([N, K//G] each)."""
    k, n = w_kn.shape
    ng = max_val.shape[1]
    g = k // ng
    w = w_kn.astype(jnp.float32).T.reshape(n, ng, g)
    w = jnp.clip(w, min_val[..., None], max_val[..., None])
    return w.reshape(n, k).T.astype(w_kn.dtype)


def run_autoclip(
    params,
    cfg: ModelConfig,
    calib_tokens: np.ndarray,  # [n_blocks, block_size] int32
    *,
    quant_type: str = "int",
    n_bit: int = 2,
    group_size: int = 128,
    n_sample_token: int = 512,
    apply: bool = True,
    progress: Callable[[str], None] = lambda s: None,
) -> dict:
    """Layer-wise clip search over the whole model.

    Returns {"clip": {layer_idx: {name: (max_val, min_val)}}} (numpy arrays)
    and, if apply=True, mutates a copy of params with clipped weights
    (returned as result["params"]).
    """
    compute_dtype = jnp.dtype(cfg.dtype)
    tokens = jnp.asarray(calib_tokens, jnp.int32)
    nb, s = tokens.shape
    h = params["embed"][tokens].astype(compute_dtype)
    if cfg.embedding_multiplier != 1.0:
        h = h * jnp.asarray(cfg.embedding_multiplier, compute_dtype)
    positions = jnp.arange(s)[None, :]
    from ..models.layers import rope_cos_sin

    cos, sin = rope_cos_sin(positions, cfg.actual_head_dim, cfg.rope_theta, compute_dtype)
    # sliding-window mask (phi3/mistral single-window; gemma2/3 per-layer)
    per_layer_sliding = bool(cfg.sliding_layers) and cfg.sliding_window is not None
    mask_sliding = base_mask = None
    cos_l = sin_l = None
    if cfg.sliding_window:
        allow = jnp.tril(jnp.ones((s, s), bool)) & (
            jnp.arange(s)[None, :] > jnp.arange(s)[:, None] - cfg.sliding_window
        )
        if per_layer_sliding:
            mask_sliding = allow[None, None]
            cos_l, sin_l = rope_cos_sin(
                positions, cfg.actual_head_dim,
                cfg.rope_local_theta or cfg.rope_theta, compute_dtype,
            )
        else:
            base_mask = allow[None, None]  # every layer slides

    # ALiBi bias for MPT-family capture (full causal: keys are the queries)
    attn_bias = None
    if cfg.alibi:
        from ..models.layers import alibi_slopes

        slopes = alibi_slopes(cfg.num_heads)
        q_pos = jnp.broadcast_to(positions, (nb, s))
        dist = (q_pos[:, :, None] - q_pos[:, None, :]).astype(jnp.float32)
        attn_bias = -slopes[None, :, None, None] * jnp.maximum(dist, 0.0)[:, None]

    capture = jax.jit(
        lambda lp, h, c, si, m: capture_block_inputs(cfg, lp, h, c, si, m, attn_bias)
    )

    targets = clip_linears(cfg)
    out_params = jax.tree_util.tree_map(lambda x: x, params)
    clip_results: dict = {}
    stacked = params["layers"]
    for li in range(cfg.num_layers):
        lp = jax.tree_util.tree_map(lambda x: x[li], stacked)
        if per_layer_sliding and cfg.sliding_layers[li]:
            c, si, m = cos_l, sin_l, mask_sliding
        else:
            c, si, m = cos, sin, base_mask
        h, caps = capture(lp, h, c, si, m)  # next-block inputs: UNCLIPPED weights
        layer_clips = {}
        for name in targets:
            feat = caps[name].reshape(-1, caps[name].shape[-1])  # [B*S, K]
            stride = max(feat.shape[0] // n_sample_token, 1)
            feat = feat[::stride]
            bmax, bmin = search_layer_clip(
                lp[name]["w"],
                feat,
                quant_type=quant_type,
                n_bit=n_bit,
                group_size=group_size,
            )
            layer_clips[name] = (np.asarray(bmax), np.asarray(bmin))
            if apply:
                clipped = apply_clip_to_weight(lp[name]["w"], bmax, bmin)
                out_params["layers"][name]["w"] = (
                    out_params["layers"][name]["w"].at[li].set(clipped)
                )
        clip_results[li] = layer_clips
        progress(f"layer {li + 1}/{cfg.num_layers}")
    return {"clip": clip_results, "params": out_params if apply else params}


# ---------------------------------------------------------------------------
# Clip cache artifact IO (.npz replaces the reference's torch .pt cache,
# autoclip.py:226-231 / train.py:450-458)
# ---------------------------------------------------------------------------


def save_clip_cache(path: str, clip: dict) -> None:
    flat = {}
    for li, layer in clip.items():
        for name, (mx, mn) in layer.items():
            flat[f"{li}/{name}/max"] = mx
            flat[f"{li}/{name}/min"] = mn
    np.savez(path, **flat)


def load_clip_cache(path: str) -> dict:
    data = np.load(path)
    clip: dict = {}
    for key in data.files:
        li_s, name, kind = key.split("/")
        li = int(li_s)
        clip.setdefault(li, {}).setdefault(name, [None, None])
        clip[li][name][0 if kind == "max" else 1] = data[key]
    return {
        li: {name: tuple(v) for name, v in layer.items()} for li, layer in clip.items()
    }


def apply_clip_cache(params, clip: dict) -> dict:
    """Clamp weights from a loaded clip cache (clip_utils.py:329-347 parity)."""
    out = jax.tree_util.tree_map(lambda x: x, params)
    for li, layer in clip.items():
        for name, (mx, mn) in layer.items():
            w = out["layers"][name]["w"]
            clipped = apply_clip_to_weight(w[li], jnp.asarray(mx), jnp.asarray(mn))
            out["layers"][name]["w"] = w.at[li].set(clipped)
    return out
