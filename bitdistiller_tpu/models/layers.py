"""Functional building blocks for the decoder: linear dispatch, RMSNorm, RoPE,
attention, MLP. Pure functions over param pytrees; no module framework.

Numerics follow HF's Llama implementation (rotate-half RoPE, f32 RMSNorm
accumulation) so weights imported from HF checkpoints reproduce logits. The
QAT fake-quant forward mirrors the reference's QLinear on-the-fly weight
quantization (quantization/qlinear.py:63-77): latent weights live in the
params pytree, the quantizer runs inside every forward, gradients flow via STE.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant_matmul import quant_matmul
from ..quant.packing import PackedLinear

# A "linear" param leaf is either
#   {"w": [K, N], "b"?: [N]}                      dense / fake-quant
#   {"qweight", "scales", "szeros", "b"?, meta}   packed (PackedLinear fields)
Quantizer = Optional[Callable[[jnp.ndarray], jnp.ndarray]]


def _ring_tp_size() -> int:
    """tp axis size when the overlapped ring TP path should engage:
    BITDISTILLER_RING_TP=1 AND an ambient mesh (jax.set_mesh) with a
    tp axis of size > 1. 0 otherwise."""
    import os

    if os.environ.get("BITDISTILLER_RING_TP") != "1":
        return 0
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or "tp" not in getattr(mesh, "axis_names", ()):
        return 0
    return int(mesh.shape["tp"])


def ring_linear(p: PackedLinear, x: jnp.ndarray, tp: int) -> jnp.ndarray:
    """Row-parallel packed matmul with the all-reduce folded into a ring of
    chunk matmuls (parallel/overlap.py): each ppermute hop overlaps the next
    N-chunk's dequant-matmul, instead of one big psum serializing after the
    full matmul. Env-gated alternative to XLA's collective scheduling for
    the two row-parallel linears (o_proj, down_proj) of a TP-sharded packed
    model — the mechanism behind BASELINE's >=85% multi-host decode scaling
    target, measurable per-pod via BITDISTILLER_RING_TP=1."""
    import dataclasses

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.overlap import ring_all_reduce_matmul

    mesh = jax.sharding.get_abstract_mesh()
    pack = 32 // p.bits
    if (
        p.bias is not None  # ring partials would add the bias tp times
        or p.qweight.shape[0] % tp
        or p.scales.shape[0] % tp
        or p.out_features % tp
    ):
        return quant_matmul(x, p)
    k_local = p.in_features // tp
    wspec = dataclasses.replace(
        p,
        qweight=P("tp", None), scales=P("tp", None), szeros=P("tp", None),
        combo=None if p.combo is None else P("tp", None),
        bias=None,
    )

    def body(xl, wl):
        wl = dataclasses.replace(wl, in_features=k_local)
        return ring_all_reduce_matmul(xl, wl, "tp")

    x2 = x.reshape(-1, x.shape[-1])
    out = shard_map(
        body, mesh=mesh, in_specs=(P(None, "tp"), wspec),
        out_specs=P(None, None), check_rep=False,
    )(x2, p)
    return out.reshape(*x.shape[:-1], p.out_features)


def linear(params, x: jnp.ndarray, quantizer: Quantizer = None,
           row_parallel: bool = False) -> jnp.ndarray:
    """Apply a linear layer in whichever representation the params carry:
    dense/fake-quant dict, PackedLinear, or a StackedPacked layer view
    (stacked packed weights + layer index from the model's layer scan)."""
    from ..ops.quant_matmul import StackedPacked, _slice_stacked

    if isinstance(params, (PackedLinear, StackedPacked)):
        if row_parallel:
            tp = _ring_tp_size()
            if tp > 1:
                if isinstance(params, StackedPacked):
                    params = _slice_stacked(params)
                return ring_linear(params, x, tp)
        return quant_matmul(x, params)
    w = params["w"]
    if quantizer is not None:
        # quantize in the weight's OWN dtype: the reference QLinear runs the
        # Ste* quantizer math on the bf16 student weights directly
        # (qlinear.py:63-77 with the bf16 model of train.py:394-397), so
        # bf16-latent QAT quantizing in bf16 is the faithful semantics — and
        # skips an f32 materialization of every weight per forward. f32
        # callers (PTQ eval on f32 imports) keep full-precision math.
        w = quantizer(w).astype(x.dtype)
    else:
        w = w.astype(x.dtype)
    out = x @ w
    b = params.get("b")
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """T5/Llama RMS norm; variance in f32 (matches HF LlamaRMSNorm)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray | None,
               eps: float) -> jnp.ndarray:
    """Standard LayerNorm (mean-subtracting) — Falcon/MPT norm."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    out = xf * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def apply_norm(leaf, x: jnp.ndarray, eps: float, offset: float = 0.0) -> jnp.ndarray:
    """Norm dispatch: array leaf -> RMSNorm; {'w','b'} dict -> LayerNorm.

    offset: gemma-style unit offset on the rms weight (out = x_hat*(w+offset+0))."""
    if isinstance(leaf, dict):
        return layer_norm(x, leaf["w"], leaf.get("b"), eps)
    if offset:
        return rms_norm(x, leaf.astype(jnp.float32) + offset, eps)
    return rms_norm(x, leaf, eps)


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    """Standard ALiBi head slopes (MPT parity, inference/models/mpt.py:22-45)."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        return jnp.asarray(pow2_slopes(n_heads), jnp.float32)
    closest = 2 ** math.floor(math.log2(n_heads))
    base = pow2_slopes(closest)
    extra = pow2_slopes(2 * closest)[0::2][: n_heads - closest]
    return jnp.asarray(base + extra, jnp.float32)


def alibi_bias(n_heads: int, q_pos: jnp.ndarray, k_pos: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, T] additive bias: -slope_h * (q_pos - k_pos), clamped >= ...

    q_pos: [B, S] absolute positions, k_pos: [T] absolute positions.
    """
    slopes = alibi_slopes(n_heads)  # [H]
    dist = q_pos[:, :, None].astype(jnp.float32) - k_pos[None, None, :].astype(jnp.float32)
    dist = jnp.maximum(dist, 0.0)  # future positions are masked anyway
    return -slopes[None, :, None, None] * dist[:, None, :, :]


def rope_scaling_params(cfg, head_dim: int, theta: float):
    """(inv_freq [head_dim/2], attention_scale) with the config's rope
    scaling applied. Matches transformers' ROPE_INIT_FUNCTIONS (the path
    the reference inherits for llama-3.1 / gemma3 / phi3 checkpoints):
    - linear: inv_freq / factor
    - llama3: long wavelengths scaled by 1/factor, short kept, smooth
      interpolation in between (modeling_rope_utils._compute_llama3_parameters)
    - longrope: per-dim factor table (long when the deployed
      max_position exceeds the original pretraining length, else short),
      plus the sqrt(1 + ln(s)/ln(orig)) attention magnitude factor.
      transformers picks long/short per CALL by current seq length; here
      the choice is static per config (max_position_embeddings), which is
      the deployed-context behavior.
    """
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
    )
    typ = cfg.rope_scaling_type
    if typ is None:
        return jnp.asarray(inv_freq), 1.0
    if typ == "linear":
        return jnp.asarray(inv_freq / cfg.rope_scaling_factor), 1.0
    if typ == "llama3":
        orig = float(cfg.rope_original_max_position or 8192)
        factor = cfg.rope_scaling_factor
        low_wavelen = orig / cfg.rope_low_freq_factor
        high_wavelen = orig / cfg.rope_high_freq_factor
        wavelen = 2.0 * np.pi / inv_freq
        scaled = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
        smooth = (orig / wavelen - cfg.rope_low_freq_factor) / (
            cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
        )
        smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        mid = (wavelen < low_wavelen) & (wavelen > high_wavelen)
        return jnp.asarray(np.where(mid, smoothed, scaled)), 1.0
    if typ == "longrope":
        orig = float(cfg.rope_original_max_position or cfg.max_position_embeddings)
        long_ctx = cfg.max_position_embeddings > orig
        table = cfg.rope_long_factor if long_ctx else cfg.rope_short_factor
        factors = np.asarray(table, np.float32)
        scale = cfg.max_position_embeddings / orig
        mscale = (
            float(np.sqrt(1.0 + np.log(scale) / np.log(orig))) if scale > 1.0 else 1.0
        )
        return jnp.asarray(inv_freq / factors), mscale
    if typ == "yarn":
        # transformers _compute_yarn_parameters: NTK-by-parts — interpolate
        # low-frequency dims by 1/factor, extrapolate high-frequency dims,
        # linear ramp between the beta_fast/beta_slow correction dims;
        # attention magnitude scaled by 0.1 ln(factor) + 1.
        factor = cfg.rope_scaling_factor
        orig = float(cfg.rope_original_max_position or cfg.max_position_embeddings)
        mscale = (
            cfg.rope_attention_factor
            if cfg.rope_attention_factor is not None
            else 0.1 * float(np.log(factor)) + 1.0
        )

        def correction_dim(num_rotations):
            return (head_dim * np.log(orig / (num_rotations * 2 * np.pi))) / (
                2 * np.log(theta)
            )

        low = max(float(np.floor(correction_dim(cfg.rope_beta_fast))), 0.0)
        high = min(float(np.ceil(correction_dim(cfg.rope_beta_slow))), head_dim - 1.0)
        if low == high:
            high += 0.001  # avoid a zero-width ramp (transformers does the same)
        ramp = np.clip(
            (np.arange(head_dim // 2, dtype=np.float32) - low) / (high - low), 0, 1
        )
        extrap_weight = 1.0 - ramp
        inv_scaled = inv_freq / factor * (1 - extrap_weight) + inv_freq * extrap_weight
        return jnp.asarray(inv_scaled), float(mscale)
    raise ValueError(f"unknown rope_scaling_type {typ!r}")


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float, dtype=jnp.float32,
    inv_freq: jnp.ndarray | None = None, mscale: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for rotate-half RoPE. positions: [...]; out [..., head_dim]."""
    if inv_freq is None:
        inv_freq = 1.0 / (
            theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
        )
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return (jnp.cos(emb) * mscale).astype(dtype), (jnp.sin(emb) * mscale).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [..., S, H, D]; cos/sin: [..., S, D] (broadcast over heads)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[..., None, :]
    s = sin[..., None, :]
    return (x * c + rotated * s).astype(x.dtype)


def _activation(name: str):
    if name == "silu":
        return jax.nn.silu
    if name == "gelu":
        return jax.nn.gelu
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown activation {name}")


def cached_attention(
    q: jnp.ndarray,  # [B, S, Hq, D]
    ck: jnp.ndarray,  # [B, Hkv, T, D] read-only cache (head-major)
    cv: jnp.ndarray,
    k_new: jnp.ndarray,  # [B, S, Hkv, D] fresh tokens
    v_new: jnp.ndarray,
    mask: jnp.ndarray,  # [B, 1, S, T+S] bool
    bias: jnp.ndarray | None = None,  # [B, Hq, S, T+S] additive (ALiBi)
    k_scale: jnp.ndarray | None = None,  # [B, Hkv, T] — ck holds int8 codes
    v_scale: jnp.ndarray | None = None,  # [B, Hkv, T] — cv holds int8 codes
) -> jnp.ndarray:
    """Decode/prefill attention over cache ++ fresh without materializing the
    concatenated KV (a per-layer cache copy would dominate decode bandwidth).
    Only the score tensors are concatenated (tiny).

    Quantized (int8) cache: scales are per (head, token) — per token t,
    q·(s_t·k_t) = s_t·(q·k_t) and Σ_t p_t·(s_t·v_t) = Σ_t (p_t·s_t)·v_t, so
    both scales fold into the tiny score/prob matrices in f32 and the
    dequantized KV is NEVER materialized: HBM reads stay 1 byte/element
    (the whole point — decode at long context is KV-traffic-bound)."""
    b, s, hq, d = q.shape
    hkv, t = ck.shape[1], ck.shape[2]
    rep = hq // hkv
    qg = q.reshape(b, s, hkv, rep, d)
    scale = 1.0 / jnp.sqrt(d).astype(jnp.float32)
    # int8 codes enter the MXU as bf16 (|code| <= 127 is exact in bf16); the
    # convert fuses into the dot's operand read
    ck_m = ck if k_scale is None else ck.astype(q.dtype)
    sc_cache = jnp.einsum("bshrd,bhtd->bhrst", qg, ck_m, preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        sc_cache = sc_cache * k_scale[:, :, None, None, :].astype(jnp.float32)
    sc_new = jnp.einsum("bshrd,bthd->bhrst", qg, k_new, preferred_element_type=jnp.float32) * scale
    scores = jnp.concatenate([sc_cache, sc_new], axis=-1)  # [B,Hkv,rep,S,T+S]
    if bias is not None:
        scores = scores + bias.reshape(b, hkv, rep, *bias.shape[-2:]).astype(jnp.float32)
    scores = jnp.where(mask[:, :, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    p_cache = probs[..., :t]
    if v_scale is not None:
        p_cache = p_cache * v_scale[:, :, None, None, :].astype(jnp.float32)
    p_cache = p_cache.astype(q.dtype)
    cv_m = cv if v_scale is None else cv.astype(q.dtype)
    p_new = probs[..., t:].astype(v_new.dtype)
    out = jnp.einsum("bhrst,bhtd->bshrd", p_cache, cv_m) + jnp.einsum(
        "bhrst,bthd->bshrd", p_new, v_new
    )
    return out.reshape(b, s, hq, d)


def flash_train_attention(
    q: jnp.ndarray,  # [B, S, Hq, D]
    k: jnp.ndarray,  # [B, S, Hkv, D] (GQA/MQA: Hkv may divide Hq)
    v: jnp.ndarray,
    attn_mask: jnp.ndarray | None = None,  # [B, S] padding mask (1 = real)
) -> jnp.ndarray:
    """Blockwise causal attention for the TRAINING forward/backward (stock
    jax pallas TPU flash kernel, differentiable).

    The XLA path (causal_attention) materializes [B, H, S, S] f32 score and
    prob tensors per layer — ~134 MB/layer at the 0.5B KD recipe (bs 2 x
    1024), read+written in fwd and again in the remat'd bwd; that HBM
    traffic dominated the round-3 train-step profile. The flash kernel keeps
    scores in VMEM blocks. Padding enters as segment ids (pad tokens get
    segment 0, real tokens 1 — pad rows are excluded from real rows'
    softmax exactly like the mask path; pad rows' own outputs are garbage
    either way and sit under label -100).

    Shape generality (round 5 — the round-4 gate excluded GQA students like
    TinyLlama/Qwen and odd sequence lengths):
      * GQA/MQA: K/V heads are repeated to Hq before the kernel (the stock
        kernel is MHA-only). The repeat materializes [B, S, Hq, D] copies —
        tiny next to the [S, S] score tensors the kernel avoids.
      * S % 128 != 0: padded up to the block size; pad rows enter as
        segment-0 ids so real rows never attend to them, then sliced off.
      * D % 128 != 0: zero-padded to 128 (zero query/key lanes add nothing
        to scores; zero value lanes produce output lanes that get sliced
        off). sm_scale uses the REAL head dim.

    Callers still gate on: no ALiBi, no sliding window, no additive bias.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, s, hq, d = q.shape
    hkv = k.shape[2]
    if hkv != hq:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    s_pad = (-s) % 128
    d_pad = (-d) % 128
    if s_pad or attn_mask is not None:
        ids = (
            jnp.ones((b, s), jnp.int32)
            if attn_mask is None
            else attn_mask.astype(jnp.int32)
        )
        if s_pad:
            ids = jnp.pad(ids, ((0, 0), (0, s_pad)))
        seg = SegmentIds(q=ids, kv=ids)
    else:
        seg = None
    if s_pad or d_pad:
        pad = ((0, 0), (0, s_pad), (0, 0), (0, d_pad))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    # NB on CPU the stock kernel needs pltpu.force_tpu_interpret_mode()
    # around the WHOLE computation (trace + lowering + run) — tests wrap
    # their forward calls; the opt-in env gate means CPU never lands here
    # accidentally.
    out = flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        segment_ids=seg,
        causal=True,
        sm_scale=1.0 / (d ** 0.5),
    )
    out = out.transpose(0, 2, 1, 3)
    if s_pad or d_pad:
        out = out[:, :s, :, :d]
    return out


def causal_attention(
    q: jnp.ndarray,  # [B, S, Hq, D]
    k: jnp.ndarray,  # [B, T, Hkv, D]
    v: jnp.ndarray,  # [B, T, Hkv, D]
    mask: jnp.ndarray | None,  # [B, 1, S, T] additive or bool, or None = causal
    *,
    causal_offset: int = 0,
    bias: jnp.ndarray | None = None,  # [B, Hq, S, T] additive (ALiBi)
) -> jnp.ndarray:
    """GQA scaled-dot-product attention; f32 softmax accumulation."""
    b, s, hq, d = q.shape
    t = k.shape[1]
    hkv = k.shape[2]
    rep = hq // hkv
    qg = q.reshape(b, s, hkv, rep, d)
    scores = jnp.einsum(
        "bshrd,bthd->bhrst", qg, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(d).astype(jnp.float32)
    if bias is not None:
        scores = scores + bias.reshape(b, hkv, rep, s, t).astype(jnp.float32)
    if mask is None:
        q_pos = jnp.arange(s)[:, None] + causal_offset
        k_pos = jnp.arange(t)[None, :]
        allow = k_pos <= q_pos  # [S, T]
        scores = jnp.where(allow[None, None, None], scores, -jnp.inf)
    else:
        if mask.dtype == jnp.bool_:
            scores = jnp.where(mask[:, :, None], scores, -jnp.inf)
        else:
            scores = scores + mask[:, :, None].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhrst,bthd->bshrd", probs.astype(v.dtype), v)
    return out.reshape(b, s, hq, d)
