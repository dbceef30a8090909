"""Packed sub-byte weight storage for the low-bit inference path.

Reference parity: quantization/qmodule.py:41-146 packs int2/int4 codes into
int32 words along the *input-channel* axis ([OC, IC/pack] with CUDA-warp-friendly
ordering). Here the layout is redesigned for TPU tiling instead of translated:

  qweight : int32 [K // pack, N]   pack = 32 // bits (16 @ int2, 8 @ int4)
  scales  : f32   [K // G, N]
  szeros  : f32   [K // G, N]      (= zeros * scales, so dequant is one FMA)

* N (output features) is the minor/lane dimension -> a [*, 128] tile maps
  directly onto VPU lanes and MXU columns; unpacking is a per-lane shift+mask.
* K is packed in a *half-word pair layout* within each group, chosen so the
  Pallas kernel can unpack straight to bf16 with two integer ops per pair of
  codes: with R = G // pack packed rows per group, code k_local of a group
  maps to word r = (k_local % 2R) // 2, half-word b = k_local & 1, bit-field
  f = (k_local // 2R) + b * pack/2 (i.e. fields 0..pack/2-1 live in the low
  16 bits, pack/2..pack-1 in the high 16 bits). Extraction i of a word block
  ((w >> bits*i) & 0x000m000m, biased into a bf16 exponent, then
  pltpu.bitcast -> sublane pairs) yields k rows [i*2R, (i+1)*2R) *in order*,
  so a static concat restores the whole group — no cross-lane shuffles.
* Dequant: w[k, n] = q[k, n] * scales[k//G, n] - szeros[k//G, n].

The weight convention is W : [K, N] (x @ W), i.e. transposed from HF's [out, in].
Group statistics are per (output feature, K-group), identical group contents to
the reference's per-OC-row grouping.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qweight", "scales", "szeros", "bias", "combo"],
    meta_fields=["bits", "group_size", "in_features", "out_features", "a8_order"],
)
@dataclasses.dataclass
class PackedLinear:
    """Packed low-bit linear layer weights (a pytree; meta fields are static)."""

    qweight: jnp.ndarray  # int32 [K // pack, N]
    scales: jnp.ndarray  # f32 [K // G, N]
    szeros: jnp.ndarray  # f32 [K // G, N] == zeros * scales
    bias: jnp.ndarray | None
    bits: int
    group_size: int
    in_features: int
    out_features: int
    # int32 [K // G, N]: bf16(scales) bits in the low half-word, bf16(szeros)
    # in the high — ONE 4-byte read per group column on the decode hot path
    # instead of two f32 reads (scale traffic is ~12% of step bytes at int2).
    # Derived from scales/szeros; rebuilt on load when absent.
    combo: jnp.ndarray | None = None
    # True when qweight was repacked into the W{2,4}A8 kernel's byte
    # extraction order (ops/quant_matmul.py: repack_linear_a8): codes land
    # in natural k order straight out of the int8 bitcast, so the kernel
    # skips the per-call activation permutation gather. Only the A8 kernel
    # may consume such a layout; pair-layout consumers raise.
    a8_order: bool = False

    @property
    def pack(self) -> int:
        return 32 // self.bits


def make_scale_combo(scales: jnp.ndarray, szeros: jnp.ndarray) -> jnp.ndarray:
    """Pack (bf16(scales), bf16(szeros)) into one int32 word per group/lane.

    bf16 is a truncated f32, so the kernel recovers f32 values with a single
    shift/mask + bitcast. bf16 scale rounding changes dequantized weights by
    <= 2^-9 relative — see PARITY.md (deviation: reference stores fp16
    scales, qmodule.py:70-146).
    """
    sb = jax.lax.bitcast_convert_type(
        scales.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    zb = jax.lax.bitcast_convert_type(
        szeros.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((zb << 16) | sb, jnp.int32)


def _layout_dims(k: int, bits: int, group_size: int) -> tuple[int, int, int]:
    pack = 32 // bits
    g = group_size if group_size > 0 else k
    if k % g != 0:
        raise ValueError(f"K={k} must be divisible by group_size={g}")
    if g % pack != 0:
        raise ValueError(f"group_size={g} must be divisible by pack={pack}")
    return pack, g, g // pack


def pack_codes(q_kn: jnp.ndarray, bits: int, group_size: int = 128) -> jnp.ndarray:
    """Pack integer codes [K, N] (values in [0, 2^bits)) into int32 [K//pack, N].

    Pair layout: code k_local = i*2R + 2r + b  <->  word (g, r), field
    i + b*pack/2 (b = low/high half-word).
    """
    k, n = q_kn.shape
    pack, g, r = _layout_dims(k, bits, group_size)
    half = pack // 2
    # [K//G, i=half, R, b=2, N]
    q = q_kn.astype(jnp.uint32).reshape(k // g, half, r, 2, n)
    field = (
        jnp.arange(half, dtype=jnp.uint32)[None, :, None, None, None]
        + jnp.asarray([0, half], jnp.uint32)[None, None, None, :, None]
    )
    words = jnp.sum(q << (field * bits), axis=(1, 3), dtype=jnp.uint32)
    return words.reshape(k // pack, n).astype(jnp.int32)


def unpack_codes(qweight: jnp.ndarray, bits: int, group_size: int = 128) -> jnp.ndarray:
    """Unpack int32 [K//pack, N] back to integer codes [K, N] (XLA reference path)."""
    kp, n = qweight.shape
    pack = 32 // bits
    k = kp * pack
    _, g, r = _layout_dims(k, bits, group_size)
    half = pack // 2
    mask = jnp.uint32((1 << bits) - 1)
    w = qweight.astype(jnp.uint32).reshape(k // g, 1, r, 1, n)
    field = (
        jnp.arange(half, dtype=jnp.uint32)[None, :, None, None, None]
        + jnp.asarray([0, half], jnp.uint32)[None, None, None, :, None]
    )
    codes = (w >> (field * bits)) & mask  # [K//G, half, R, 2, N]
    return codes.reshape(k, n).astype(jnp.int32)


def quantize_pack_linear(
    w_kn: jnp.ndarray,
    bits: int,
    group_size: int = 128,
    bias: jnp.ndarray | None = None,
) -> PackedLinear:
    """Quantize a [K, N] weight matrix and pack it.

    Value semantics match quantizer.py:25-69 (get_scale_zp path): per-group
    asymmetric min/max scale/zero with round-half-even.
    """
    k, n = w_kn.shape
    g = group_size if group_size > 0 else k
    if k % g != 0:
        raise ValueError(f"K={k} not divisible by group_size={g}")
    wf = w_kn.astype(jnp.float32)
    wg = wf.reshape(k // g, g, n)
    max_int = 2**bits - 1
    max_val = wg.max(axis=1)  # [K//G, N]
    min_val = wg.min(axis=1)
    scales = jnp.clip(max_val - min_val, 1e-5, None) / max_int
    zeros = jnp.clip(-jnp.round(min_val / scales), 0, max_int)
    q = jnp.clip(
        jnp.round(wg / scales[:, None, :]) + zeros[:, None, :], 0, max_int
    ).astype(jnp.int32)
    qweight = pack_codes(q.reshape(k, n), bits, g)
    szeros = zeros * scales
    return PackedLinear(
        qweight=qweight,
        scales=scales,
        szeros=szeros,
        bias=None if bias is None else jnp.asarray(bias),
        bits=bits,
        group_size=g,
        in_features=k,
        out_features=n,
        combo=make_scale_combo(scales, szeros),
    )


def dequantize_linear(p: PackedLinear, dtype=jnp.float32) -> jnp.ndarray:
    """Reconstruct the dense [K, N] weight (XLA reference path)."""
    if p.a8_order:
        raise ValueError("qweight is in A8 extraction order; pair-layout dequant would scramble k")
    q = unpack_codes(p.qweight, p.bits, p.group_size).astype(jnp.float32)
    g = p.group_size
    scales = jnp.repeat(p.scales, g, axis=0)
    szeros = jnp.repeat(p.szeros, g, axis=0)
    return (q * scales - szeros).astype(dtype)
