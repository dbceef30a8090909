"""Flash-decode attention: online-softmax single-token attention over the
static KV cache, one (batch, kv-head) program streaming contiguous [T, D]
cache planes.

TPU-native replacement for the reference's FasterTransformer masked MHA
(inference/kernels/csrc/attention/ft_attention.cpp:111-181 + ~4k LoC of
decoder_masked_multihead_attention kernels). Not a translation: FT assigns a
thread-block per (head, batch) over a warp-packed K layout; here a Pallas
grid cell per (batch, kv-head) consumes the head-major [B, Hkv, T, D] cache
(llama.KVCache) with the T axis blocked and "arbitrary" so the online
max/sum/accumulator live in VMEM scratch across T-steps. The XLA two-piece
attention (models/layers.py:cached_attention) materializes [B,Hkv,rep,S,T+S]
score tensors — fine at T=256, ruinous at T=2048; this kernel keeps scores
at [rep, block_t] per step.

Semantics: cache rows are valid strictly below `start` (per-slot lengths,
continuous batching), the fresh token sits at position `start` and attends
to itself; optional sliding window masks rows <= start - window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _fd_kernel(
    start_ref,  # SMEM (B, 1) int32: per-slot cache lengths (full array)
    q_ref,  # (1, 1, rep, D)
    k_ref,  # (1, 1, block_t, D)
    v_ref,  # (1, 1, block_t, D)
    kn_ref,  # (1, 1, 1, D) fresh key
    vn_ref,  # (1, 1, 1, D) fresh value
    o_ref,  # (1, 1, rep, D) output
    m_s,  # VMEM (rep_pad, 128) f32 running max (broadcast over lanes)
    l_s,  # VMEM (rep_pad, 128) f32 running denom
    acc_s,  # VMEM (rep_pad, D) f32 running numerator
    *,
    block_t: int,
    rep: int,
    window: int | None,
):
    t_step = pl.program_id(2)
    nt = pl.num_programs(2)
    start = start_ref[pl.program_id(0), 0]
    scale = 1.0 / (q_ref.shape[-1] ** 0.5)

    @pl.when(t_step == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, _NEG)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    t0 = t_step * block_t

    @pl.when(t0 < start)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)  # [rep, D]
        k = k_ref[0, 0]  # [block_t, D]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [rep, block_t]
        t_idx = t0 + jax.lax.broadcasted_iota(jnp.int32, (rep, block_t), 1)
        valid = t_idx < start
        if window is not None:
            valid = valid & (t_idx > start - window)
        s = jnp.where(valid, s, _NEG)

        m_old = m_s[:rep, :1]  # [rep, 1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)  # [rep, 1]
        p = jnp.exp(s - m_new)  # [rep, block_t]
        p = jnp.where(valid, p, 0.0)  # exp(_NEG - m) can round to junk
        l_new = l_s[:rep, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rep, D]
        acc_s[:rep, :] = acc_s[:rep, :] * alpha + pv
        m_s[:rep, :] = jnp.broadcast_to(m_new, m_s[:rep, :].shape)
        l_s[:rep, :] = jnp.broadcast_to(l_new, l_s[:rep, :].shape)

    @pl.when(t_step == nt - 1)
    def _():
        # fold in the fresh token (position `start`, always visible) and
        # normalize. With an empty cache (start=0) this is the whole result.
        q = q_ref[0, 0].astype(jnp.float32)
        kn = kn_ref[0, 0].astype(jnp.float32)  # [1, D]
        s_new = jnp.sum(q * kn, axis=-1, keepdims=True) * scale  # [rep, 1]
        m_old = m_s[:rep, :1]
        m_f = jnp.maximum(m_old, s_new)
        alpha = jnp.exp(m_old - m_f)
        p_new = jnp.exp(s_new - m_f)  # [rep, 1]
        l_f = l_s[:rep, :1] * alpha + p_new
        vn = vn_ref[0, 0].astype(jnp.float32)  # [1, D]
        acc = acc_s[:rep, :] * alpha + p_new * vn
        o_ref[0, 0] = (acc / l_f).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_t", "window", "attn_len", "interpret")
)
def flash_decode_attention(
    q: jnp.ndarray,  # [B, 1, Hq, D] single fresh token per sequence
    ck: jnp.ndarray,  # [B, Hkv, T, D] head-major cache
    cv: jnp.ndarray,
    k_new: jnp.ndarray,  # [B, 1, Hkv, D]
    v_new: jnp.ndarray,
    start: jnp.ndarray,  # [B] int32 per-slot cache lengths
    *,
    block_t: int = 256,
    window: int | None = None,
    attn_len: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, 1, Hq, D]; exact same math as cached_attention at S=1.

    attn_len (static) bounds the KV-block GRID: cache planes past it are
    never DMA'd, so HBM traffic scales with the engine's length bucket
    instead of T_max. (An XLA-level slice cannot do this: slices feeding a
    scan or a dot materialize a copy — measured +1 ms/step at 7B. The
    kernel grid is the only place the read set is truly controlled.)
    Callers must guarantee every start < attn_len."""
    b, s, hq, d = q.shape
    assert s == 1, "flash decode is the S=1 path"
    hkv, t = ck.shape[1], ck.shape[2]
    rep = hq // hkv
    while t % block_t != 0:
        block_t //= 2
    if attn_len is not None and attn_len < t:
        # partial trailing block is fine: `start` masking covers it
        nt = max(1, -(-attn_len // block_t))
    else:
        nt = t // block_t
    qg = q.reshape(b, hkv, rep, d)
    kng = k_new.reshape(b, hkv, 1, d)
    vng = v_new.reshape(b, hkv, 1, d)
    rep_pad = max(rep, 8)

    kernel = functools.partial(
        _fd_kernel, block_t=block_t, rep=rep, window=window
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, hkv, nt),
        in_specs=[
            pl.BlockSpec((b, 1), lambda i, h, tt: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, rep, d), lambda i, h, tt: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, block_t, d), lambda i, h, tt: (i, h, tt, 0)),
            pl.BlockSpec((1, 1, block_t, d), lambda i, h, tt: (i, h, tt, 0)),
            pl.BlockSpec((1, 1, 1, d), lambda i, h, tt: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, d), lambda i, h, tt: (i, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, d), lambda i, h, tt: (i, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((rep_pad, 128), jnp.float32),
            pltpu.VMEM((rep_pad, 128), jnp.float32),
            pltpu.VMEM((rep_pad, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * nt * block_t * d,
            bytes_accessed=2 * b * hkv * nt * block_t * d * ck.dtype.itemsize,
            transcendentals=b * hq * nt * block_t,
        ),
        interpret=interpret,
    )(start.reshape(b, 1), qg, ck, cv, kng, vng)
    return out.reshape(b, 1, hq, d)
