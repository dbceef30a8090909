"""Fused packed MLP: out = (act(x@Wg) * (x@Wu)) @ Wd in ONE Pallas kernel.

TPU-native counterpart of the reference's fused MLP module
(inference/modules/fused_mlp.py:44-114), but deeper: the reference fuses only
gate/up; here the down-projection is fused too, so the intermediate [M, FFN]
activation never touches HBM and all three weight streams share one kernel
launch — pipeline warmup is paid once per layer instead of three times, which
measures as the dominant decode cost at small batch.

Grid: (M/bm, FFN/bf). For each ffn tile f:
    mid  = act(x @ Wg[:, f·bf:(f+1)·bf]) * (x @ Wu[:, ...])     [bm, bf]
    acc += mid @ Wd[f·bf:(f+1)·bf, :]                           [bm, D] VMEM
Weights are int2/int4 packed in the pair layout (quant/packing.py); dequant
uses the bf16 exponent-bias trick (ops/quant_matmul.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.packing import PackedLinear
from ..ops.quant_matmul import _BF16_TRICK, _dequant_block_bf16


def _packed_matmul_acc(x_ref, qw_ref, s_ref, sz_ref, row0, group0,
                       n_groups, bits, group_size, out_width, bm):
    """acc [bm, out_width] f32 for `n_groups` K-groups of one packed operand.

    All activation slicing goes through refs (Mosaic has no dynamic_slice on
    values); runs as a fori_loop so the kernel body stays small (a python
    unroll over 32+ groups made Mosaic compiles take >10 min)."""
    pack = 32 // bits
    rpg = group_size // pack
    offset = _BF16_TRICK[bits][3]

    def body(j, acc):
        qw = qw_ref[pl.ds(row0 + j * rpg, rpg), :]
        vals = _dequant_block_bf16(qw, bits)  # [G, bn] == q + offset
        xg = x_ref[:, pl.ds(j * group_size, group_size)]
        partial = jnp.dot(
            xg.astype(jnp.bfloat16), vals, preferred_element_type=jnp.float32
        )
        s = s_ref[pl.ds(group0 + j, 1), :]  # [1, bn]
        sz = sz_ref[pl.ds(group0 + j, 1), :]
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        return acc + partial * s - xsum * (sz + offset * s)

    init = jnp.zeros((bm, out_width), jnp.float32)
    return jax.lax.fori_loop(0, n_groups, body, init)


def _mlp_kernel(
    x_ref, g_qw_ref, g_s_ref, g_sz_ref, u_qw_ref, u_s_ref, u_sz_ref,
    d_qw_ref, d_s_ref, d_sz_ref, out_ref, acc_ref, mid_ref,
    *, bits: int, group_size: int, act: str, block_f: int,
):
    f_step = pl.program_id(1)
    nf = pl.num_programs(1)

    @pl.when(f_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = x_ref.shape[1]
    bm = x_ref.shape[0]
    n_groups_k = k // group_size

    bf = g_s_ref.shape[-1]
    gate = _packed_matmul_acc(x_ref, g_qw_ref, g_s_ref, g_sz_ref, 0, 0,
                              n_groups_k, bits, group_size, bf, bm)
    up = _packed_matmul_acc(x_ref, u_qw_ref, u_s_ref, u_sz_ref, 0, 0,
                            n_groups_k, bits, group_size, bf, bm)

    if act == "silu":
        mid = jax.nn.silu(gate) * up
    elif act == "gelu":
        mid = jax.nn.gelu(gate) * up
    else:
        mid = jax.nn.gelu(gate, approximate=True) * up
    mid_ref[...] = mid  # stage in VMEM so the down loop can ref-slice it

    n_groups_f = block_f // group_size
    acc_ref[...] += _packed_matmul_acc(
        mid_ref, d_qw_ref, d_s_ref, d_sz_ref,
        0,  # d_qw block spec already delivers this tile's rows
        f_step * n_groups_f,  # d scales carry the full FFN group axis
        n_groups_f, bits, group_size, d_s_ref.shape[-1], bm,
    )

    @pl.when(f_step == nf - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "act", "block_m", "block_f", "interpret"),
)
def _fused_mlp_2d(
    x, g_qw, g_s, g_sz, u_qw, u_s, u_sz, d_qw, d_s, d_sz,
    *, bits, group_size, act, block_m, block_f, interpret=False,
):
    m, k = x.shape
    ffn = g_qw.shape[1]
    d_out = d_qw.shape[1]
    pack = 32 // bits
    ngk = k // group_size
    ngf = ffn // group_size
    grid = (pl.cdiv(m, block_m), ffn // block_f)

    kernel = functools.partial(
        _mlp_kernel, bits=bits, group_size=group_size, act=act, block_f=block_f
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, f: (i, 0)),
            pl.BlockSpec((k // pack, block_f), lambda i, f: (0, f)),
            pl.BlockSpec((ngk, block_f), lambda i, f: (0, f)),
            pl.BlockSpec((ngk, block_f), lambda i, f: (0, f)),
            pl.BlockSpec((k // pack, block_f), lambda i, f: (0, f)),
            pl.BlockSpec((ngk, block_f), lambda i, f: (0, f)),
            pl.BlockSpec((ngk, block_f), lambda i, f: (0, f)),
            pl.BlockSpec((block_f // pack, d_out), lambda i, f: (f, 0)),
            pl.BlockSpec((ngf, d_out), lambda i, f: (0, 0)),
            pl.BlockSpec((ngf, d_out), lambda i, f: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d_out), lambda i, f: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, d_out), jnp.float32),
            pltpu.VMEM((block_m, block_f), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * (2 * k * ffn + ffn * d_out),
            bytes_accessed=int(
                (2 * k * ffn + ffn * d_out) * bits / 8 + m * k * 2 + m * d_out * 2
            ),
            transcendentals=m * ffn,
        ),
        interpret=interpret,
    )(x, g_qw, g_s, g_sz, u_qw, u_s, u_sz, d_qw, d_s, d_sz)


def _round_up(v, mult):
    return -(-v // mult) * mult


def fused_mlp(
    x: jnp.ndarray,
    gate: PackedLinear,
    up: PackedLinear,
    down: PackedLinear,
    act: str = "silu",
    *,
    block_f: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [..., K] -> [..., D] through the fused packed MLP kernel."""
    k = gate.in_features
    ffn = gate.out_features
    assert down.in_features == ffn and up.out_features == ffn
    while ffn % block_f != 0:
        block_f //= 2
    xf = x.reshape(-1, k)
    m = xf.shape[0]
    block_m = min(128, max(8, _round_up(m, 8)))
    out = _fused_mlp_2d(
        xf,
        gate.qweight, gate.scales.astype(jnp.float32), gate.szeros.astype(jnp.float32),
        up.qweight, up.scales.astype(jnp.float32), up.szeros.astype(jnp.float32),
        down.qweight, down.scales.astype(jnp.float32), down.szeros.astype(jnp.float32),
        bits=gate.bits,
        group_size=gate.group_size,
        act=act,
        block_m=block_m,
        block_f=block_f,
        interpret=interpret,
    )
    return out.reshape(*x.shape[:-1], down.out_features)
