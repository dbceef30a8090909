"""Llama-family decoder as pure functions over a stacked-layer param pytree.

TPU-first design notes:
  * All decoder layers are stacked along a leading L axis and iterated with
    `jax.lax.scan` — one compiled block regardless of depth, remat-friendly
    (`jax.checkpoint` on the block body = the reference's gradient
    checkpointing, scripts/train/train.sh:38).
  * Three weight representations flow through the same forward: dense bf16,
    fake-quant QAT (quantizer closure applied to every linear weight inside
    the scan body — parity with QLinear's quantize-on-forward,
    quantization/qlinear.py:63-77), and packed low-bit (PackedLinear leaves
    dispatched to the Pallas dequant-matmul).
  * KV cache is a statically-shaped [L, B, T_max, Hkv, Dh] buffer updated with
    dynamic_update_slice — the TPU analogue of the reference's preallocated
    cache (inference/models/llama.py:110-138) without the FT packed-K layout.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .layers import (
    Quantizer,
    apply_norm,
    apply_rope,
    cached_attention,
    causal_attention,
    flash_train_attention,
    linear,
    rms_norm,
    rope_cos_sin,
    rope_scaling_params,
    _activation,
)

Params = dict
LAYER_LINEARS = ("q", "k", "v", "o", "gate", "up", "down")
# names matching the reference's clip-skip list (autoclip.py:96-98): q/k are
# never clipped due to the qk matmul sensitivity
CLIP_SKIP = ("q", "k")


class KVCache(NamedTuple):
    """Static KV cache, head-major: [L, B, Hkv, T, D].

    T is the MINOR-side dim so each (batch, head)'s cache is a contiguous
    [T, D] plane — the decode attention kernel streams it at full HBM
    bandwidth (the reference's FT packed-K layout [B,H,Dh/8,L,8] solves the
    same problem for CUDA warps, ft_attention.cpp:111-181).

    dtype=int8 stores symmetric per-(layer,batch,head,token) quantized codes
    with f32 scales — halves decode KV traffic vs bf16 (the long-context
    decode bottleneck; the reference has no KV quantization, this is a
    beyond-parity capability). Scales fold into the attention score/prob
    matrices exactly (layers.cached_attention), so nothing is dequantized."""

    k: jnp.ndarray  # [L, B, Hkv, T, Dh]
    v: jnp.ndarray  # [L, B, Hkv, T, Dh]
    k_scale: Optional[jnp.ndarray] = None  # [L, B, Hkv, T] when k is int8
    v_scale: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def init(cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.actual_head_dim)
        if jnp.dtype(dtype) == jnp.int8:
            sshape = shape[:-1]
            return KVCache(
                k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(sshape, jnp.float32),
                v_scale=jnp.zeros(sshape, jnp.float32),
            )
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 per-token quantization along the trailing head_dim:
    x [..., T, D] -> (codes int8 [..., T, D], scale f32 [..., T])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    codes = jnp.round(x.astype(jnp.float32) / scale[..., None])
    return codes.astype(jnp.int8), scale


def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16) -> Params:
    """Random init (tests / from-scratch); layout matches hf_import output."""
    keys = jax.random.split(key, 10)
    d, hq, hkv, dh = (
        cfg.hidden_size,
        cfg.num_heads,
        cfg.num_kv_heads,
        cfg.actual_head_dim,
    )
    ffn = cfg.intermediate_size
    L = cfg.num_layers

    def dense(key, shape, scale=None):
        scale = scale or (1.0 / jnp.sqrt(shape[-2]))
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    def lin(key, k_dim, n_dim, bias=False):
        leaf = {"w": dense(key, (L, k_dim, n_dim))}
        if bias:
            leaf["b"] = jnp.zeros((L, n_dim), dtype)
        return leaf

    def norm_leaf():
        if cfg.norm_type == "layernorm":
            return {"w": jnp.ones((L, d), dtype), "b": jnp.zeros((L, d), dtype)}
        return jnp.ones((L, d), dtype)

    layers = {
        "input_norm": norm_leaf(),
        "q": lin(keys[0], d, hq * dh, cfg.attention_bias),
        "k": lin(keys[1], d, hkv * dh, cfg.attention_bias),
        "v": lin(keys[2], d, hkv * dh, cfg.attention_bias),
        "o": lin(keys[3], hq * dh, d, cfg.attention_out_bias),
        "up": lin(keys[5], d, ffn, cfg.mlp_bias),
        "down": lin(keys[6], ffn, d, cfg.mlp_bias),
    }
    if not cfg.parallel_block:
        layers["post_attn_norm"] = norm_leaf()
    if cfg.parallel_mlp_norm:
        layers["mlp_norm"] = norm_leaf()
    if cfg.sandwich_norm:
        layers["pre_ffn_norm"] = norm_leaf()
        layers["post_ffn_norm"] = norm_leaf()
    if cfg.mlp_style == "gated":
        layers["gate"] = lin(keys[4], d, ffn, cfg.mlp_bias)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, dh), dtype)
        layers["k_norm"] = jnp.ones((L, dh), dtype)
    final_norm = (
        {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}
        if cfg.norm_type == "layernorm"
        else jnp.ones((d,), dtype)
    )
    params = {
        "embed": dense(keys[7], (cfg.vocab_size, d), scale=0.02),
        "final_norm": final_norm,
        "layers": layers,
    }
    if cfg.learned_pos_embeddings:
        params["pos_embed"] = dense(
            keys[9],
            (cfg.max_position_embeddings + cfg.pos_embedding_offset, d),
            scale=0.02,
        )
    if cfg.embedding_norm:
        params["embed_norm"] = {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"w": dense(keys[8], (d, cfg.vocab_size))}
    return params


def _block(
    cfg: ModelConfig,
    lp: Params,
    h: jnp.ndarray,  # [B, S, D]
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: jnp.ndarray | None,
    cache_kv: tuple | None,  # (ck, cv, k_scale|None, v_scale|None), [B,Hkv,T,Dh]
    cache_pos,
    quantizer: Quantizer,
    causal_offset: int = 0,
    keep_kv: bool = False,
    attn_bias: jnp.ndarray | None = None,  # ALiBi [B, Hq, S, T(+S)]
    linear_fn=None,  # (name, leaf, x) -> y hook; AutoClip capture plugs in here
    flash2_args=None,  # (ck_full, cv_full, li, start, window, attn_len, interp)
    train_flash: jnp.ndarray | None | bool = None,  # [B,S] mask | True (no pad)
):
    b, s, d = h.shape
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.actual_head_dim
    # o/down are the row-parallel linears under TP: their packed matmuls may
    # route through the env-gated ring collective-matmul (layers.ring_linear)
    lin = linear_fn or (
        lambda name, leaf, x: linear(
            leaf, x, quantizer, row_parallel=name in ("o", "down")
        )
    )

    from jax.ad_checkpoint import checkpoint_name

    def _named(x):
        # tags the attention-side projection outputs for the "save_qkvo"
        # remat policy (save qkv/o dots + qweight, recompute the MLP —
        # drops the [B, S, I] intermediates that dominate activation HBM)
        return checkpoint_name(x, "qkvo_proj")

    x = apply_norm(lp["input_norm"], h, cfg.rms_norm_eps, cfg.norm_offset)
    if "qkv" in lp:
        # fused qkv projection — one kernel launch (parity with the
        # reference's make_quant_attn fusion, inference/modules/fused_attn.py:304-370)
        qkv = _named(lin("qkv", lp["qkv"], x))
        q_sz, kv_sz = hq * dh, hkv * dh
        q = qkv[..., :q_sz].reshape(b, s, hq, dh)
        k = qkv[..., q_sz : q_sz + kv_sz].reshape(b, s, hkv, dh)
        v = qkv[..., q_sz + kv_sz :].reshape(b, s, hkv, dh)
    else:
        q = _named(lin("q", lp["q"], x)).reshape(b, s, hq, dh)
        k = _named(lin("k", lp["k"], x)).reshape(b, s, hkv, dh)
        v = _named(lin("v", lp["v"], x)).reshape(b, s, hkv, dh)
    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
    if cfg.use_rope:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    if flash2_args is not None:
        # Stacked flash-decode: the scan carries only the layer index; the
        # kernel reads this layer's [B, Hkv, T, D] planes in place out of the
        # full stacked cache (no xs slice -> no HBM->HBM copy; see
        # ops/decode_attention.py). cache_kv is None in this mode.
        from ..ops.decode_attention import flash_decode_stacked

        ckf, cvf, ksf, vsf, li2, start2, window2, alen2, interp2 = flash2_args
        # int8 cache: fresh k/v stay bf16 here (the kernel folds them
        # unscaled, like cached_attention's sc_new) and `forward` quantizes
        # them once at the write-back
        fresh_dtype = k.dtype if ksf is not None else ckf.dtype
        attn = flash_decode_stacked(
            q, ckf, cvf, li2, k.astype(fresh_dtype), v.astype(fresh_dtype),
            start2, k_scale=ksf, v_scale=vsf,
            window=window2, attn_len=alen2, interpret=interp2,
        )
        new_cache = (k.astype(fresh_dtype), v.astype(fresh_dtype))
    elif cache_kv is not None:
        # Read-only cache + appended fresh k/v: the scan never rewrites the
        # [T_max] cache buffer (a full-cache write per layer per step would
        # dominate decode bandwidth); the new tokens are written back once
        # after the scan by `forward`.
        ck, cv, ks, vs = cache_kv
        fresh_dtype = k.dtype if ks is not None else ck.dtype
        attn = cached_attention(
            q, ck, cv, k.astype(fresh_dtype), v.astype(fresh_dtype), mask,
            bias=attn_bias, k_scale=ks, v_scale=vs,
        )
        # fresh tokens stay full-precision here; `forward` quantizes them
        # once at the single write-back when the cache is int8
        wb_dtype = k.dtype if ks is not None else ck.dtype
        new_cache = (k.astype(wb_dtype), v.astype(wb_dtype))
    elif train_flash is not None:
        # training fwd/bwd: blockwise flash attention (no [S, S] score
        # materialization); `forward` gates the eligibility conditions
        attn = flash_train_attention(
            q, k, v, None if train_flash is True else train_flash
        )
        new_cache = (k, v) if keep_kv else None
    else:
        attn = causal_attention(
            q, k, v, mask, causal_offset=causal_offset, bias=attn_bias
        )
        new_cache = (k, v) if keep_kv else None

    attn_out = _named(
        lin("o", lp["o"], attn.reshape(b, s, hq * dh).astype(h.dtype))
    )
    act = _activation(cfg.hidden_act)
    if cfg.parallel_block:
        # falcon-style: attention and MLP summed into the residual together;
        # new_decoder_architecture gives the MLP its own norm (ln_mlp)
        if cfg.parallel_mlp_norm:
            mlp_in = apply_norm(lp["mlp_norm"], h, cfg.rms_norm_eps, cfg.norm_offset)
        else:
            mlp_in = x
    elif cfg.sandwich_norm:
        # gemma3-style: post-attn norm on the attention OUTPUT, extra
        # pre/post-feedforward norms around the MLP
        h = h + apply_norm(lp["post_attn_norm"], attn_out, cfg.rms_norm_eps, cfg.norm_offset)
        mlp_in = apply_norm(lp["pre_ffn_norm"], h, cfg.rms_norm_eps, cfg.norm_offset)
    else:
        h = h + attn_out
        mlp_in = apply_norm(lp["post_attn_norm"], h, cfg.rms_norm_eps, cfg.norm_offset)
    if cfg.mlp_style == "plain":
        mid = act(lin("up", lp["up"], mlp_in))
    elif "gate_up" in lp:
        gu = lin("gate_up", lp["gate_up"], mlp_in)
        gate, up = gu[..., : cfg.intermediate_size], gu[..., cfg.intermediate_size :]
        mid = act(gate) * up
    else:
        mid = act(lin("gate", lp["gate"], mlp_in)) * lin("up", lp["up"], mlp_in)
    mlp = lin("down", lp["down"], mid)
    if cfg.parallel_block:
        return h + attn_out + mlp, new_cache
    if cfg.sandwich_norm:
        mlp = apply_norm(lp["post_ffn_norm"], mlp, cfg.rms_norm_eps, cfg.norm_offset)
    return h + mlp, new_cache


def forward(
    params: Params,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, S] int32
    *,
    quantizer: Quantizer = None,
    cache: Optional[KVCache] = None,
    cache_pos: int | jnp.ndarray = 0,  # scalar, or [B] for per-slot positions
    kv_valid: Optional[jnp.ndarray] = None,  # [B, T] bool — engine-provided
    attn_len: Optional[int] = None,  # static: read only cache[:attn_len]
    attn_mask: Optional[jnp.ndarray] = None,  # [B, S] padding mask (training)
    remat: bool | str = False,  # True/"full" | "save_quantized" | "save_dots" | "save_qkvo"
    return_kv: bool = False,  # cache-less mode: also return per-layer k/v
    logits_dtype=jnp.float32,
    use_train_flash: bool | None = None,  # training flash attention override
    # (beats the BITDISTILLER_TRAIN_FLASH env; e.g. the KD step enables it
    # for the TEACHER forward only — fwd-only flash skips the [B,H,S,S]
    # score materialization without paying the kernel's bwd recompute)
    flash2: bool | None = None,  # explicit flash_decode_stacked override
    # (beats the BITDISTILLER_FLASH2 env); the engine turns it OFF inside
    # its horizon scans — a pallas consumer inside an outer lax.scan
    # re-materializes per iteration (+3.2 ms/step measured at 7B)
) -> tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the decoder. Returns (logits [B, S, V], updated cache / prompt KV).

    cache_pos may be a vector of per-sequence positions (continuous batching:
    every slot decodes at its own length). Single-token decode on TPU routes
    attention through the stacked Pallas flash-decode kernel
    (ops/decode_attention.py, online softmax over whole head-group planes);
    everything else uses the XLA two-piece attention.

    attn_len (static) bounds the cache READ window via the flash-decode
    kernel's grid (writes still land in the full [T_max] buffer; callers must
    guarantee all valid cache positions are < attn_len). NB measured on v5e:
    at rep<=2 GQA shapes a bounded-grid kernel's per-cell overhead exceeds
    the traffic saving, so the serving engine instead sizes the cache BUFFER
    itself by length buckets (serve/engine.py:_ensure_cache) — which is what
    the reference's FT mmha achieves with its tlength-based launch config
    (csrc/attention/decoder_masked_multihead_attention.cu:30-60).
    """
    b, s = tokens.shape
    compute_dtype = jnp.dtype(cfg.dtype)
    h = params["embed"][tokens].astype(compute_dtype)
    if cfg.embedding_multiplier != 1.0:
        h = h * jnp.asarray(cfg.embedding_multiplier, compute_dtype)

    pos_vec = jnp.asarray(cache_pos)
    per_slot = pos_vec.ndim == 1
    if per_slot:
        positions = pos_vec[:, None] + jnp.arange(s)[None, :]  # [B, S]
    else:
        positions = (jnp.arange(s) + pos_vec)[None, :]  # [1, S]
    if cfg.embedding_norm:  # bloom: LayerNorm on the token embeddings
        h = apply_norm(params["embed_norm"], h, cfg.rms_norm_eps)
    if cfg.learned_pos_embeddings:  # opt: absolute table with historic offset
        h = h + params["pos_embed"][positions + cfg.pos_embedding_offset].astype(
            compute_dtype
        )
    # rope scaling (llama3/linear/longrope) applies to the GLOBAL rope;
    # gemma3's local-attention layers keep their unscaled local theta
    inv_freq, rope_mscale = rope_scaling_params(
        cfg, cfg.actual_head_dim, cfg.rope_theta
    )
    cos, sin = rope_cos_sin(positions, cfg.actual_head_dim, cfg.rope_theta,
                            compute_dtype, inv_freq=inv_freq, mscale=rope_mscale)
    # gemma2/3: sliding layers rotate with their own (local) theta
    per_layer_sliding = bool(cfg.sliding_layers) and cfg.sliding_window is not None
    if per_layer_sliding:
        cos_l, sin_l = rope_cos_sin(
            positions, cfg.actual_head_dim,
            cfg.rope_local_theta or cfg.rope_theta, compute_dtype,
        )

    def build_mask(window: Optional[int]):
        """[B, 1, S, T(+S)] boolean mask for a given sliding window
        (None = global); returns None when pure causal suffices."""
        if cache is not None:
            # attention runs over [cache (read-only, T_max) ++ fresh tokens]:
            # cache slots valid strictly below cache_pos; fresh token j sits
            # at absolute position cache_pos + j and is causally visible.
            t = cache.k.shape[3]
            k_pos = jnp.arange(t)[None, None, :]  # [1, 1, T]
            start = pos_vec.reshape(-1, 1, 1) if per_slot else pos_vec.reshape(1, 1, 1)
            allow_cache = jnp.broadcast_to(k_pos < start, (b, s, t))
            allow_new = jnp.broadcast_to(
                jnp.arange(s)[None, :] <= jnp.arange(s)[:, None], (b, s, s)
            )
            m = jnp.concatenate([allow_cache, allow_new], axis=-1)  # [B, S, T+S]
            if kv_valid is not None:
                pad = jnp.ones((b, s), bool)
                m = m & jnp.concatenate([kv_valid, pad], axis=-1)[:, None, :]
            if window:
                k_abs = jnp.concatenate(
                    [jnp.broadcast_to(jnp.arange(t)[None], (b, t)),
                     jnp.broadcast_to(positions, (b, s))], axis=-1)  # [B, T+S]
                q_abs = jnp.broadcast_to(positions, (b, s))
                m = m & (k_abs[:, None, :] > q_abs[:, :, None] - window)
            return m[:, None]  # [B, 1, S, T+S]
        if attn_mask is not None or window:
            allow = jnp.tril(jnp.ones((s, s), bool))
            if window:
                allow = allow & (
                    jnp.arange(s)[None, :] > jnp.arange(s)[:, None] - window
                )
            am = attn_mask if attn_mask is not None else jnp.ones((b, s), jnp.int32)
            return allow[None, None] & am[:, None, None, :].astype(bool)
        return None  # pure causal, handled inside attention

    if per_layer_sliding:
        mask_sliding = build_mask(cfg.sliding_window)
        mask_global = build_mask(None)
        if mask_global is None:  # explicit causal so both masks share a shape
            mask_global = jnp.broadcast_to(
                jnp.tril(jnp.ones((s, s), bool))[None, None], mask_sliding.shape
            )
        mask = None  # selected per layer inside the scan
    else:
        mask = build_mask(cfg.sliding_window)

    # ALiBi position bias (MPT family): computed once, shared by all layers
    attn_bias = None
    if cfg.alibi:
        from .layers import alibi_slopes

        slopes = alibi_slopes(cfg.num_heads)
        q_pos = jnp.broadcast_to(positions, (b, s))
        if cache is not None:
            t = cache.k.shape[3]
            # cache rows sit at absolute positions 0..T-1; fresh token j at
            # positions[:, j] — one distance matrix over [T ++ S] keys
            k_abs = jnp.concatenate(
                [jnp.broadcast_to(jnp.arange(t)[None], (b, t)), q_pos], axis=-1
            )  # [B, T+S]
        else:
            k_abs = q_pos  # full causal: keys are the queries
        dist = (q_pos[:, :, None] - k_abs[:, None, :]).astype(jnp.float32)
        attn_bias = -slopes[None, :, None, None] * jnp.maximum(dist, 0.0)[:, None]

    lp_stack = params["layers"]
    sliding_flags = (
        jnp.asarray(cfg.sliding_layers, bool) if per_layer_sliding else None
    )
    # Packed leaves do NOT ride the scan's xs: a scanned-over (dynamically
    # sliced) operand feeding a pallas call materializes an HBM->HBM copy of
    # every layer's weights (~3.1 ms/step at 7B decode, profiled). Instead
    # the scan carries only the layer INDEX and each block reads its layer
    # in place through the scalar-prefetch kernel (ops/quant_matmul.py:
    # StackedPacked / _qmm_kernel_stacked).
    from ..ops.quant_matmul import StackedPacked
    from ..quant.packing import PackedLinear as _PL

    packed_names = tuple(
        nm for nm, leaf in lp_stack.items() if isinstance(leaf, _PL)
    )
    scan_lp = (
        {nm: l for nm, l in lp_stack.items() if nm not in packed_names}
        if packed_names
        else lp_stack
    )

    def with_packed(lp_sliced, li):
        if not packed_names:
            return lp_sliced
        lp = dict(lp_sliced)
        for nm in packed_names:
            lp[nm] = StackedPacked(lp_stack[nm], li)
        return lp

    # Stacked flash-decode eligibility (ops/decode_attention.py — the ONE
    # Pallas decode-attention route; everything else is the XLA two-piece
    # attention): S=1, uniform layer mode, no ALiBi bias, no engine kv_valid
    # override. The first-generation per-layer kernel
    # (experimental/flash_decode.py) is retired to tests-only.
    if cache is not None and (attn_len is None or attn_len >= cache.k.shape[3]):
        attn_len = None
    flash_ok = (
        cache is not None
        and s == 1
        and not cfg.alibi
        and kv_valid is None
        and not per_layer_sliding
    )
    # The stacked kernel keeps the cache OUT of the scan xs (no per-layer
    # slice copy) and streams whole head-group [T, D] planes. DEFAULT on
    # TPU — measured wins over the XLA two-piece attention in every decode
    # config (round 4: bf16 headline 444.2 vs 441.7 tok/s; int8-KV batch 16
    # 800.6 vs 569.8 = +40%, the int8 planes stream at full bandwidth
    # instead of ~0.6x). BITDISTILLER_FLASH2=0 restores the XLA path; =1
    # forces it on CPU (interpret mode — tests only).
    flash2_env = os.environ.get("BITDISTILLER_FLASH2")
    if flash2 is not None:
        flash2_on = flash2
    else:
        flash2_on = (
            flash2_env == "1"
            or (flash2_env is None and jax.default_backend() == "tpu")
        )
    flash2_proto = None
    flash2_scales = (None, None)
    if flash_ok and flash2_on:
        start_vec = (pos_vec if per_slot else jnp.full((b,), pos_vec)).astype(jnp.int32)
        flash2_proto = (
            start_vec, cfg.sliding_window, attn_len,
            jax.default_backend() != "tpu",
        )
        if cache.quantized:
            # pre-pad the int8 scale planes for the kernel's 8-sublane
            # blocks ONCE per step — padding inside the per-layer call
            # would materialize the whole padded stack every layer
            # (measured ~1.2 GB/dispatch of junk traffic at hkv=4)
            from ..ops.decode_attention import (
                pad_scales_for_flash,
                plan_head_group,
            )

            hg = plan_head_group(
                cfg.num_kv_heads, cache.k.shape[3], cfg.actual_head_dim
            )
            flash2_scales = (
                pad_scales_for_flash(cache.k_scale, hg),
                pad_scales_for_flash(cache.v_scale, hg),
            )
    else:
        attn_len = None  # the XLA path always streams the full window

    def select_layer_mode(flag):
        """Pick (cos, sin, mask) for a layer by its sliding/global flag."""
        if flag is None:
            return cos, sin, mask
        c = jnp.where(flag, cos_l, cos)
        si = jnp.where(flag, sin_l, sin)
        m = jnp.where(flag, mask_sliding, mask_global)
        return c, si, m

    # Training/prefill flash attention (stock pallas TPU kernel via
    # layers.flash_train_attention). Eligibility is static: full causal (+
    # padding) attention, any GQA/S/D shape (the wrapper repeats KV heads
    # and pads S/D to the kernel blocks). Opt-in while under evaluation
    # (BITDISTILLER_TRAIN_FLASH=1): at the 0.5B seq-1024 reference recipe
    # the XLA score-materializing path measured FASTER (the kernel's bwd
    # recompute costs more than the [S,S] traffic at that scale —
    # NOTES_NEXT_ROUND round-4 finding 5); re-test at longer S.
    train_flash = None
    tf_on = (
        use_train_flash
        if use_train_flash is not None
        else os.environ.get("BITDISTILLER_TRAIN_FLASH", "0") == "1"
    )
    if (
        cache is None
        and tf_on
        and not cfg.alibi
        and cfg.sliding_window is None
        and not per_layer_sliding
        and attn_bias is None
    ):
        train_flash = True if attn_mask is None else attn_mask

    def body(carry, layer_in):
        hidden = carry
        if cache is not None and flash2_proto is not None:
            # flash2 mode: xs carries only (lp, li); per_layer_sliding is
            # excluded by flash_ok so no flag rides along
            lp, li = layer_in
            start2, window2, alen2, interp2 = flash2_proto
            new_h, new_kv = _block(
                cfg, with_packed(lp, li), hidden, cos, sin, None, None,
                cache_pos, quantizer, attn_bias=attn_bias,
                flash2_args=(cache.k, cache.v, *flash2_scales,
                             li, start2, window2, alen2, interp2),
            )
            return new_h, new_kv
        if cache is None:
            if sliding_flags is not None:
                lp, li, flag = layer_in
            else:
                (lp, li), flag = layer_in, None
            c, si, m = select_layer_mode(flag)
            new_h, kv = _block(
                cfg, with_packed(lp, li), hidden, c, si, m, None, 0, quantizer,
                keep_kv=return_kv, attn_bias=attn_bias, train_flash=train_flash,
            )
            return new_h, kv
        if sliding_flags is not None:
            lp, li, ck, cv, ks, vs, flag = layer_in
        else:
            (lp, li, ck, cv, ks, vs), flag = layer_in, None
        c, si, m = select_layer_mode(flag)
        new_h, new_kv = _block(
            cfg, with_packed(lp, li), hidden, c, si, m, (ck, cv, ks, vs),
            cache_pos, quantizer,
            attn_bias=attn_bias,
        )
        return new_h, new_kv

    if remat:
        if remat == "save_quantized":
            # recompute activations but NOT the per-layer weight fake-quant:
            # trades one extra in-memory copy of the quantized weights for
            # the backward pass's quantization recompute
            body = jax.checkpoint(
                body, prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names("qweight"),
            )
        elif remat == "save_dots":
            # save every non-batched matmul output (the projections/MLP —
            # NOT the [B,H,S,S] attention scores, which are batched dots and
            # would blow the budget) plus the fake-quantized weights: the
            # backward recomputes only elementwise glue, so the step does
            # ~8N useful flops instead of 10N, at ~(activations + one weight
            # copy) extra HBM vs "full"
            body = jax.checkpoint(
                body, prevent_cse=False,
                policy=jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    jax.checkpoint_policies.save_only_these_names("qweight"),
                ),
            )
        elif remat == "save_qkvo":
            # save_dots minus the MLP intermediates: keeps the attention
            # projections (qkv/o) + quantized weights but recomputes the
            # [B, S, I] gate/up/mid tensors in bwd — the activation-HBM
            # heavyweights at SwiGLU widths — to fit larger micro-batches
            # than save_dots (round-4 NOTES: save_dots OOMs at 0.5B bs>=8)
            body = jax.checkpoint(
                body, prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "qweight", "qkvo_proj"
                ),
            )
        else:
            body = jax.checkpoint(body, prevent_cse=False)

    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    if cache is None:
        base_xs = (scan_lp, layer_ids)
        xs = base_xs + (sliding_flags,) if sliding_flags is not None else base_xs
        h, kv = jax.lax.scan(body, h, xs)
        new_cache = KVCache(k=kv[0], v=kv[1]) if return_kv else None
    else:
        if flash2_proto is not None:
            # the cache is read in place by the kernel — only (lp, li) ride xs
            h, (nk, nv) = jax.lax.scan(body, h, (scan_lp, layer_ids))
        else:
            cache_xs = (scan_lp, layer_ids, cache.k, cache.v,
                        cache.k_scale, cache.v_scale)
            xs = (cache_xs + (sliding_flags,) if sliding_flags is not None
                  else cache_xs)
            h, (nk, nv) = jax.lax.scan(body, h, xs)
        # single small write-back of the fresh tokens: blocks emit
        # [L, B, S, Hkv, D] -> transpose to the cache's head-major layout
        nk = nk.transpose(0, 1, 3, 2, 4)  # [L, B, Hkv, S, D]
        nv = nv.transpose(0, 1, 3, 2, 4)
        if cache.quantized:
            nk, nks = quantize_kv(nk)
            nv, nvs = quantize_kv(nv)
        if per_slot:
            # per-slot positions: scatter each batch row at its own offset
            def upd(buf_b, new_b, p):  # [L, H, T, D], [L, H, S, D]
                return jax.lax.dynamic_update_slice(buf_b, new_b, (0, 0, p, 0))

            def supd(buf_b, new_b, p):  # [L, H, T], [L, H, S]
                return jax.lax.dynamic_update_slice(buf_b, new_b, (0, 0, p))

            vupd = jax.vmap(upd, in_axes=(1, 1, 0), out_axes=1)
            vsupd = jax.vmap(supd, in_axes=(1, 1, 0), out_axes=1)
            new_cache = KVCache(
                k=vupd(cache.k, nk, pos_vec), v=vupd(cache.v, nv, pos_vec),
                k_scale=vsupd(cache.k_scale, nks, pos_vec) if cache.quantized else None,
                v_scale=vsupd(cache.v_scale, nvs, pos_vec) if cache.quantized else None,
            )
        else:
            new_cache = KVCache(
                k=jax.lax.dynamic_update_slice(cache.k, nk, (0, 0, 0, cache_pos, 0)),
                v=jax.lax.dynamic_update_slice(cache.v, nv, (0, 0, 0, cache_pos, 0)),
                k_scale=jax.lax.dynamic_update_slice(
                    cache.k_scale, nks, (0, 0, 0, cache_pos)
                ) if cache.quantized else None,
                v_scale=jax.lax.dynamic_update_slice(
                    cache.v_scale, nvs, (0, 0, 0, cache_pos)
                ) if cache.quantized else None,
            )

    h = apply_norm(params["final_norm"], h, cfg.rms_norm_eps, cfg.norm_offset)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = h @ params["embed"].T.astype(h.dtype)
    else:
        logits = linear(params["lm_head"], h)
    return logits.astype(logits_dtype), new_cache


def fake_quant_weights(params: Params, quantizer) -> Params:
    """Apply a fake quantizer to all layer linear weights once (PTQ-style,
    parity with test/test_utils.py:68-85 pseudo_quantize_model_weight)."""
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    for name in LAYER_LINEARS:
        if name not in out["layers"]:
            continue  # e.g. no 'gate' for plain-MLP families
        leaf = out["layers"][name]
        w = leaf["w"].astype(jnp.float32)
        leaf["w"] = jax.vmap(quantizer)(w).astype(params["layers"][name]["w"].dtype)
    return out


def quantize_layer_weights(params: Params, quantizer) -> Params:
    """Differentiable one-shot weight quantization, bit-identical to what
    `linear()` would compute in-forward (layers.py:101-109): the quantizer
    runs in the weight's OWN dtype (no f32 upcast — the reference QLinear
    quantizes the bf16 student weights directly, qlinear.py:63-77), and
    gradients flow through the STE/scale paths exactly as in-forward QAT.

    Returned tree drops into `forward(..., quantizer=None)` unchanged. Used
    by the fused grad-accumulation step (train/trainer.py
    make_fused_train_step) to pay the fake-quant fwd+bwd ONCE per optimizer
    cycle instead of once per micro-batch."""
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    for name in LAYER_LINEARS:
        if name not in out["layers"]:
            continue  # e.g. no 'gate' for plain-MLP families
        leaf = out["layers"][name]
        out["layers"][name] = dict(leaf, w=jax.vmap(quantizer)(leaf["w"]))
    return out
