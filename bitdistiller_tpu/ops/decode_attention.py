"""Stacked flash-decode attention: single-token attention over the full
[L, B, Hkv, T, D] KV cache, reading each layer's planes in place via a
scalar-prefetched layer index.

TPU-native replacement for the reference's FasterTransformer masked MHA
(inference/kernels/csrc/attention/ft_attention.cpp:111-181 + ~4k LoC of
decoder_masked_multihead_attention kernels). Second-generation design built
on the round-3 kernel findings (NOTES_ROUND2/NEXT_ROUND):

  1. SCAN-SLICE COPY: inside the per-layer lax.scan, an xs slice of the cache
     feeding a pallas call materializes an HBM->HBM copy of the whole layer's
     KV (~270 MB/layer at 7B/T=2048). Like ops/quant_matmul.StackedPacked,
     the scan carries only the layer INDEX; the kernel's BlockSpec index_map
     picks the layer out of the stacked cache, so the DMA reads the planes in
     place. The retired first-generation kernel (experimental/flash_decode.py)
     consumed xs slices.
  2. SINGLE-PASS, BIG BLOCKS: one grid cell covers a GROUP of kv heads with
     the WHOLE [T, D] plane per head when VMEM allows (the round-3 tile
     lesson: many small blocks lose to one streaming pass; the old kernel
     used [256, D] blocks and an online softmax across 8 T-steps). The
     contiguous K block per cell is hg*T*D*2 bytes — multi-MB DMAs.
  3. CELL-AWARE VMEM BUDGET: Mosaic double-buffers input blocks only when the
     grid has >1 cell, so the (hg, bt) policy sizes K+V double-buffered
     against the measured ~12 MB usable window (see _plan_blocks).

The online-softmax scratch is kept so T larger than the VMEM budget still
works (nt > 1 T-steps), but the block planner prefers nt == 1.

Semantics match models/layers.cached_attention at S=1: cache rows valid
strictly below `start` (per-slot lengths, continuous batching), the fresh
token sits at position `start` and attends to itself; optional sliding
window masks rows <= start - window.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30

# usable VMEM window for the double-buffered KV blocks (bytes). v5e-measured
# prior, same provenance as quant_matmul's decode budget; overridable for
# other TPU generations without code edits.
_KV_VMEM_BUDGET = int(os.environ.get("BITDISTILLER_FD_VMEM", 11_800_000))


def _plan_blocks(hkv: int, t: int, d: int, itemsize: int,
                 budget: int = None, quantized: bool = False) -> tuple[int, int]:
    """Pick (head_group hg, T-block bt): whole-T single pass if it fits,
    then the measured-fastest head group for the dtype. The double-buffered
    K+V block pair (4 * hg * bt * d * itemsize bytes) is held under the
    VMEM budget by first shrinking bt, then (extreme T on small-VMEM
    parts) the head group."""
    budget = budget or _KV_VMEM_BUDGET

    def fits(hg, bt):
        return 4 * hg * bt * d * itemsize <= budget

    if quantized:
        # hg=8 streams the int8 codes at 731.9 GB/s of ACTUAL bytes
        # (1419 GB/s bf16-equivalent, round-4 slope probe) — full bandwidth.
        # hkv % 8 != 0 (e.g. 4-KV-head GQA) takes the largest divisor: the
        # scale planes are padded/interleaved to 8 sublanes per grid cell by
        # the caller (see flash_decode_stacked), so any hg works.
        hg = max(g for g in range(1, min(hkv, 8) + 1) if hkv % g == 0)
    else:
        # hg=2 measured fastest on v5e (744.8 GB/s vs 712 at hg=4, 732 at
        # hg=1, T=2048 whole-plane blocks — round-4 slope probe): small
        # cells keep the grid deep enough for Mosaic's input double-
        # buffering to fully overlap the DMAs.
        hg = 2 if hkv % 2 == 0 else 1
    bt = t
    while not fits(hg, bt) and bt > 256:
        bt = (bt + 1) // 2
    while not fits(hg, bt) and hg > 1:
        hg = max(g for g in range(1, hg) if hkv % g == 0)
    return hg, bt


def plan_head_group(hkv: int, t: int, d: int, itemsize: int = 1) -> int:
    """The head group the int8 kernel will use for this cache shape —
    callers pre-padding scale planes must pad for the same hg."""
    return _plan_blocks(hkv, t, d, itemsize, quantized=True)[0]


def pad_scales_for_flash(sc: jnp.ndarray, hg: int) -> jnp.ndarray:
    """Re-layout int8-KV scale planes for the kernel's 8-sublane blocks:
    [L, B, Hkv, T] -> [L, B, G, hg->8, T] -> [L, B, G*8, T] (G = Hkv//hg,
    junk rows beyond hg per group are never read). Identity bitcast when
    hg == 8. Call ONCE per decode step, outside the layer scan — the pad
    materializes a (<2x scales) copy."""
    L, b, hkv, t = sc.shape
    g = hkv // hg
    sc = sc.astype(jnp.float32).reshape(L, b, g, hg, t)
    if hg < 8:
        sc = jnp.pad(sc, ((0, 0), (0, 0), (0, 0), (0, 8 - hg), (0, 0)))
    return sc.reshape(L, b, g * 8, t)


def _fd2_kernel(
    li_ref,  # scalar prefetch (1,) int32: layer index (used by index_maps)
    start_ref,  # scalar prefetch (B,) int32: per-slot cache lengths
    q_ref,  # (1, hg, rep, D)
    k_ref,  # (1, 1, hg, bt, D) layer plane block (bf16, or int8 codes)
    v_ref,  # (1, 1, hg, bt, D)
    *rest,  # [ks_ref, vs_ref: (1, 1, 8, bt) f32, rows >= hg real] if quantized, then
    # kn_ref (1, hg, 1, D), vn_ref, o_ref (1, hg, rep, D), scratch m/l/acc
    bt: int,
    hg: int,
    rep: int,
    window: int | None,
    quantized: bool,
):
    if quantized:
        ks_ref, vs_ref, kn_ref, vn_ref, o_ref, m_s, l_s, acc_s = rest
    else:
        ks_ref = vs_ref = None
        kn_ref, vn_ref, o_ref, m_s, l_s, acc_s = rest
    it = pl.program_id(2)
    nt = pl.num_programs(2)
    start = start_ref[pl.program_id(0)]
    scale = 1.0 / (q_ref.shape[-1] ** 0.5)

    @pl.when(it == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, _NEG)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    t0 = it * bt

    @pl.when(t0 < start)
    def _():
        for g in range(hg):  # static unroll over the head group
            q = q_ref[0, g].astype(jnp.float32)  # [rep, D]
            k = k_ref[0, 0, g]  # [bt, D]
            s = jax.lax.dot_general(
                q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [rep, bt]
            if quantized:
                # per-token scale folds into the TINY score row — the int8
                # codes are never dequantized in HBM-sized tensors (same
                # identity as layers.cached_attention: q·(s_t k_t) = s_t(q·k_t))
                s = s * ks_ref[0, 0, g : g + 1, :]
            t_idx = t0 + jax.lax.broadcasted_iota(jnp.int32, (rep, bt), 1)
            valid = t_idx < start
            if window is not None:
                valid = valid & (t_idx > start - window)
            s = jnp.where(valid, s, _NEG)
            r0 = g * rep
            m_old = m_s[r0 : r0 + rep, :1]  # [rep, 1]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            p = jnp.exp(s - m_new)
            p = jnp.where(valid, p, 0.0)  # exp(_NEG - m) can round to junk
            l_new = l_s[r0 : r0 + rep, :1] * alpha + jnp.sum(
                p, axis=-1, keepdims=True
            )
            if quantized:
                # Σ_t p_t (s_t v_t) = Σ_t (p_t s_t) v_t — scale the prob row
                pq = (p * vs_ref[0, 0, g : g + 1, :]).astype(jnp.bfloat16)
                pv = jax.lax.dot_general(
                    pq, v_ref[0, 0, g].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [rep, D]
            else:
                pv = jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_ref[0, 0, g],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [rep, D]
            acc_s[r0 : r0 + rep, :] = acc_s[r0 : r0 + rep, :] * alpha + pv
            m_s[r0 : r0 + rep, :] = jnp.broadcast_to(
                m_new, m_s[r0 : r0 + rep, :].shape
            )
            l_s[r0 : r0 + rep, :] = jnp.broadcast_to(
                l_new, l_s[r0 : r0 + rep, :].shape
            )

    @pl.when(it == nt - 1)
    def _():
        # fold in the fresh token (position `start`, always visible) and
        # normalize; with start == 0 this is the whole result
        for g in range(hg):
            q = q_ref[0, g].astype(jnp.float32)
            kn = kn_ref[0, g, 0].astype(jnp.float32)[None, :]  # [1, D]
            s_new = jnp.sum(q * kn, axis=-1, keepdims=True) * scale  # [rep, 1]
            r0 = g * rep
            m_old = m_s[r0 : r0 + rep, :1]
            m_f = jnp.maximum(m_old, s_new)
            alpha = jnp.exp(m_old - m_f)
            p_new = jnp.exp(s_new - m_f)
            l_f = l_s[r0 : r0 + rep, :1] * alpha + p_new
            vn = vn_ref[0, g, 0].astype(jnp.float32)[None, :]
            acc = acc_s[r0 : r0 + rep, :] * alpha + p_new * vn
            o_ref[0, g] = (acc / l_f).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window", "attn_len", "head_group", "block_t", "interpret"),
)
def flash_decode_stacked(
    q: jnp.ndarray,  # [B, 1, Hq, D] single fresh token per sequence
    ck: jnp.ndarray,  # [L, B, Hkv, T, D] FULL stacked cache (read in place)
    cv: jnp.ndarray,
    li: jnp.ndarray,  # scalar int32 layer index
    k_new: jnp.ndarray,  # [B, 1, Hkv, D]
    v_new: jnp.ndarray,
    start: jnp.ndarray,  # [B] int32 per-slot cache lengths
    *,
    k_scale: jnp.ndarray | None = None,  # [L, B, Hkv, T] f32 — ck is int8
    v_scale: jnp.ndarray | None = None,
    window: int | None = None,
    attn_len: int | None = None,
    head_group: int | None = None,
    block_t: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, 1, Hq, D]; same math as cached_attention at S=1.

    int8 cache (k_scale/v_scale given): the kernel DMAs 1-byte code planes
    and folds the per-(head, token) scales into the tiny score/prob rows in
    VMEM — the round-3 finding was that XLA's convert-fused int8 reads
    stream at only ~0.6x the bf16 GB/s; a plane-block DMA is dtype-blind,
    so this turns the int8 capacity win into a bytes win.

    attn_len (static) bounds the T grid: cache planes past it are never
    DMA'd. Callers must guarantee every start < attn_len."""
    b, s, hq, d = q.shape
    assert s == 1, "flash decode is the S=1 path"
    L, _, hkv, t, _ = ck.shape
    rep = hq // hkv
    quantized = k_scale is not None
    hg, bt = _plan_blocks(hkv, t, d, ck.dtype.itemsize, quantized=quantized)
    if head_group is not None:
        hg = head_group
    if block_t is not None:
        bt = block_t
    if quantized:
        # The [.., 8, bt] f32 scale-plane block needs 8 sublanes for the TPU
        # lowering, so each grid cell's hg scale rows get their own 8-row
        # segment (pad_scales_for_flash): [L, B, Hkv, T] -> [L, B, G*8, T].
        # This lifts the round-4 hkv % 8 == 0 restriction (the reference's
        # FT kernel handles arbitrary num_kv_heads,
        # decoder_masked_multihead_attention.h:1-184). Callers that invoke
        # the kernel per LAYER (the model's decode scan) MUST pre-pad ONCE
        # outside the scan — padding here would materialize the whole
        # padded stack every layer (measured ~1.2 GB/dispatch of junk
        # traffic at hkv=4). Pre-padded inputs are detected by shape.
        g = hkv // hg
        if k_scale.shape[2] == hkv and (hg < 8 or g * 8 != hkv):
            k_scale = pad_scales_for_flash(k_scale, hg)
            v_scale = pad_scales_for_flash(v_scale, hg)
        elif k_scale.shape[2] != g * 8:
            raise ValueError(
                f"scale planes have head dim {k_scale.shape[2]}; expected "
                f"{hkv} (raw) or {g * 8} (pre-padded for hg={hg} — see "
                "pad_scales_for_flash/plan_head_group)"
            )
        k_scale = k_scale.astype(jnp.float32)
        v_scale = v_scale.astype(jnp.float32)
    t_lim = t if attn_len is None or attn_len > t else attn_len
    nt = max(1, -(-t_lim // bt))

    qg = q.reshape(b, hkv, rep, d)
    kng = k_new.reshape(b, hkv, 1, d)
    vng = v_new.reshape(b, hkv, 1, d)
    rows = hg * rep
    rows_pad = max(rows, 8)

    kernel = functools.partial(
        _fd2_kernel, bt=bt, hg=hg, rep=rep, window=window, quantized=quantized
    )
    plane_spec = pl.BlockSpec(
        (1, 1, hg, bt, d), lambda i, h, tt, li, st: (li[0], i, h, tt, 0)
    )
    scale_spec = pl.BlockSpec(
        (1, 1, 8, bt), lambda i, h, tt, li, st: (li[0], i, h, tt)
    )
    new_spec = pl.BlockSpec((1, hg, 1, d), lambda i, h, tt, li, st: (i, h, 0, 0))
    in_specs = [
        pl.BlockSpec((1, hg, rep, d), lambda i, h, tt, li, st: (i, h, 0, 0)),
        plane_spec,
        plane_spec,
    ]
    operands = [qg, ck, cv]
    if quantized:
        in_specs += [scale_spec, scale_spec]
        operands += [k_scale, v_scale]
    in_specs += [new_spec, new_spec]
    operands += [kng, vng]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv // hg, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, hg, rep, d), lambda i, h, tt, li, st: (i, h, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_pad, 128), jnp.float32),
            pltpu.VMEM((rows_pad, 128), jnp.float32),
            pltpu.VMEM((rows_pad, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * nt * bt * d,
            bytes_accessed=2 * b * hkv * nt * bt * d * ck.dtype.itemsize,
            transcendentals=b * hq * nt * bt,
        ),
        interpret=interpret,
    )(
        jnp.reshape(li, (1,)).astype(jnp.int32),
        start.astype(jnp.int32),
        *operands,
    )
    return out.reshape(b, 1, hq, d)
