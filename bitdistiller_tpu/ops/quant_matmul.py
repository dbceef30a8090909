"""Fused dequantize-matmul for packed sub-4-bit weights.

TPU-native replacement for the reference's CUDA/Triton dequant GEMM/GEMV
(inference/kernels/csrc/quantization/gemm_cuda_gen.cu:31-298,
gemv_cuda.cu:60-346, quantization/triton_kernels.py:22-100). Not a
translation: the packed layout is sublane-major per K-group (see
quant/packing.py) so in-kernel unpacking is a static concat of shift+mask
extractions with no cross-lane shuffles, and the group scale/zero correction
is applied to the *accumulator*, not per weight element:

    out[m, n] = sum_g  s[g, n] * (x[m, kg] @ q[kg, n]) - sz[g, n] * sum_k x[m, kg]

so the per-element dequant work is shift + mask + convert only; the
multiply/subtract happens once per (m, n, group) on the f32 accumulator.

Two code paths, same semantics:
  * `quant_matmul_xla` — pure-jnp reference (runs anywhere, used in tests).
  * `quant_matmul_pallas` — the Pallas TPU kernel (prefill GEMM and decode
    GEMV are the same kernel; decode is just M<=8 with a padded sublane tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.packing import PackedLinear, unpack_codes


def _group_sizes(p: PackedLinear) -> tuple[int, int, int]:
    pack = 32 // p.bits
    g = p.group_size
    return pack, g, p.in_features // g


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def quant_matmul_xla(x: jnp.ndarray, p: PackedLinear) -> jnp.ndarray:
    """x: [..., K] -> [..., N]; dense dequant then matmul (XLA fuses)."""
    codes = unpack_codes(p.qweight, p.bits, p.group_size).astype(x.dtype)  # [K, N]
    k, n = p.in_features, p.out_features
    g = p.group_size
    xf = x.reshape(-1, k)
    m = xf.shape[0]
    # grouped einsum keeps the scale/zero correction on the accumulator
    xg = xf.reshape(m, k // g, g)
    qg = codes.reshape(k // g, g, n)
    partial = jnp.einsum(
        "mgk,gkn->mgn", xg, qg, preferred_element_type=jnp.float32
    )
    xsum = xg.sum(axis=-1, dtype=jnp.float32)  # [m, K//G]
    out = jnp.einsum("mgn,gn->mn", partial, p.scales.astype(jnp.float32)) - jnp.einsum(
        "mg,gn->mn", xsum, p.szeros.astype(jnp.float32)
    )
    if p.bias is not None:
        out = out + p.bias.astype(out.dtype)
    return out.astype(x.dtype).reshape(*x.shape[:-1], n)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _dequant_block(qw_block, bits: int, out_dtype):
    """Unpack an int32 [G // pack, bn] block into [G, bn] codes (k-ordered).

    The sublane-major layout guarantees extraction i yields rows
    [i * G//pack, (i+1) * G//pack), so a static concat restores k order.
    """
    pack = 32 // bits
    mask = (1 << bits) - 1
    w = qw_block.astype(jnp.uint32)
    parts = [
        ((w >> jnp.uint32(bits * i)) & jnp.uint32(mask)).astype(jnp.int32)
        for i in range(pack)
    ]
    return jnp.concatenate(parts, axis=0).astype(out_dtype)


def _qmm_kernel(
    x_ref, qw_ref, s_ref, sz_ref, out_ref, acc_ref, *, bits: int, groups_per_step: int, group_size: int
):
    """Grid: (M/bm, N/bn, K/bk) with bk = groups_per_step * G."""
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pack = 32 // bits
    rows_per_group = group_size // pack
    x = x_ref[...]  # [bm, bk] compute dtype
    acc = acc_ref[...]
    for j in range(groups_per_step):
        qw = qw_ref[j * rows_per_group : (j + 1) * rows_per_group, :]
        codes = _dequant_block(qw, bits, x.dtype)  # [G, bn]
        xg = x[:, j * group_size : (j + 1) * group_size]  # [bm, G]
        partial = jnp.dot(xg, codes, preferred_element_type=jnp.float32)
        s = s_ref[j, :][None, :]  # [1, bn]
        sz = sz_ref[j, :][None, :]
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)  # [bm, 1]
        acc = acc + partial * s - xsum * sz
    acc_ref[...] = acc

    @pl.when(k_step == nk - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "block_m", "block_n", "groups_per_step"),
)
def _quant_matmul_pallas_2d(
    x,
    qweight,
    scales,
    szeros,
    *,
    bits: int,
    group_size: int,
    block_m: int,
    block_n: int,
    groups_per_step: int,
):
    m, k = x.shape
    n = qweight.shape[1]
    pack = 32 // bits
    g = group_size
    bk = groups_per_step * g
    assert k % bk == 0, (k, bk)
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n), k // bk)

    kernel = functools.partial(
        _qmm_kernel, bits=bits, groups_per_step=groups_per_step, group_size=g
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec(
                (groups_per_step * (g // pack), block_n), lambda i, j, kk: (kk, j)
            ),
            pl.BlockSpec((groups_per_step, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((groups_per_step, block_n), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n * bits // 8 + m * n * 2,
            transcendentals=0,
        ),
    )(x, qweight, scales, szeros)


def quant_matmul_pallas(
    x: jnp.ndarray,
    p: PackedLinear,
    *,
    block_m: int | None = None,
    block_n: int = 512,
    groups_per_step: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [..., K] -> [..., N] via the fused Pallas kernel."""
    k, n = p.in_features, p.out_features
    xf = x.reshape(-1, k)
    m = xf.shape[0]
    if block_m is None:
        block_m = min(128, max(8, _round_up(m, 8)))
    block_n = min(block_n, n)
    n_groups = k // p.group_size
    gps = groups_per_step
    while n_groups % gps != 0:
        gps //= 2
    # Mosaic needs the scales-block sublane dim to be a multiple of 8 or the
    # whole array; fall back to a single K step otherwise.
    if gps % 8 != 0 and gps != n_groups:
        gps = n_groups
    out = _quant_matmul_pallas_2d(
        xf,
        p.qweight,
        p.scales.astype(jnp.float32),
        p.szeros.astype(jnp.float32),
        bits=p.bits,
        group_size=p.group_size,
        block_m=block_m,
        block_n=block_n,
        groups_per_step=gps,
    )
    if p.bias is not None:
        out = out + p.bias.astype(out.dtype)
    return out.reshape(*x.shape[:-1], n)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def quant_matmul(x: jnp.ndarray, p: PackedLinear, *, use_pallas: bool | None = None):
    """Packed matmul; picks the Pallas kernel on TPU, XLA path elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        return quant_matmul_pallas(x, p)
    return quant_matmul_xla(x, p)
