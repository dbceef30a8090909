"""Fused dequantize-matmul for packed sub-4-bit weights.

TPU-native replacement for the reference's CUDA/Triton dequant GEMM/GEMV
(inference/kernels/csrc/quantization/gemm_cuda_gen.cu:31-298,
gemv_cuda.cu:60-346, quantization/triton_kernels.py:22-100). Not a
translation: the packed layout is the half-word *pair layout* (see
quant/packing.py) so in-kernel unpacking is a static concat of
shift+mask+bitcast extractions that build bf16 values directly (exponent-bias
trick, no int->float convert), and the group scale/zero correction is applied
to the *accumulator*, not per weight element:

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
from typing import NamedTuple

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
    if p.a8_order:
        raise ValueError("A8-ordered qweight cannot go through the pair-layout XLA path")
    k, n = p.in_features, p.out_features
    g = p.group_size
    # f32 compute: CPU XLA has no bf16xbf16->f32 dot thunk; on TPU the Pallas
    # kernel is the production path so this stays the portable reference.
    codes = unpack_codes(p.qweight, p.bits, p.group_size).astype(jnp.float32)
    xf = x.reshape(-1, k).astype(jnp.float32)
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


# bf16 exponent-bias trick: for code q in [0, 2^bits), the bf16 bit pattern
# of (2^bits + q) is EXP | (q << MANT_SHIFT), so a shift+mask+or per PAIR of
# codes (both 16-bit halves of each int32 lane at once) followed by a
# bitcast-to-bf16 dequantizes with ~2 integer ops per code and NO int->float
# convert. The +2^bits offset is folded into the zero-point correction.
# The offset must keep offset+q inside ONE binade: [2^bits, 2^{bits+1}).
_BF16_TRICK = {
    # bits: (pair_mask, mant_shift, exp_bits, offset)
    2: (0x00030003, 5, 0x40804080, 4.0),  # bf16(4+q) = 0x4080 | q<<5, q in [0,4)
    4: (0x000F000F, 3, 0x41804180, 16.0),  # bf16(16+q) = 0x4180 | q<<3, q in [0,16)
}


def _dequant_block_bf16(qw_block, bits: int):
    """Unpack an int32 [R, bn] one-group block into bf16 [G, bn] values equal
    to (codes + 2^bits), k-ordered under the pair layout (quant/packing.py)."""
    from jax.experimental.pallas import tpu as pltpu

    pair_mask, mant_shift, exp_bits, _ = _BF16_TRICK[bits]
    half = (32 // bits) // 2
    w = qw_block
    parts = []
    for i in range(half):
        t = jax.lax.shift_right_logical(w, bits * i) & pair_mask
        y = jax.lax.shift_left(t, mant_shift) | exp_bits
        parts.append(pltpu.bitcast(y, jnp.bfloat16))  # [2R, bn]
    return jnp.concatenate(parts, axis=0)  # [G, bn]


def _qmm_kernel(
    x_ref, qw_ref, c_ref, out_ref, acc_ref, *, bits: int, groups_per_step: int, group_size: int
):
    """Grid: (M/bm, N/bn, K/bk) with bk = groups_per_step * G.

    The combo ref carries the FULL group axis (blocked over N only) and is
    row-sliced per k-step — this frees groups_per_step from the Mosaic
    sublane divisibility constraint. Each combo word holds bf16(scale) bits
    in the low half and bf16(szero) bits in the high half: one 4-byte read
    per (group, lane), decoded with a shift/mask + bitcast (bf16 bits in the
    top 16 of an f32 word ARE that value in f32).
    """
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pack = 32 // bits
    rows_per_group = group_size // pack
    offset = _BF16_TRICK[bits][3]
    x = x_ref[...]  # [bm, bk] compute dtype
    acc = acc_ref[...]
    g0 = k_step * groups_per_step
    for j in range(groups_per_step):
        qw = qw_ref[j * rows_per_group : (j + 1) * rows_per_group, :]
        codes = _dequant_block_bf16(qw, bits)  # [G, bn] bf16 == q + 2^bits
        xg = x[:, j * group_size : (j + 1) * group_size]  # [bm, G]
        partial = jnp.dot(
            xg.astype(jnp.bfloat16), codes, preferred_element_type=jnp.float32
        )
        w = c_ref[g0 + j, :][None, :]  # [1, bn] int32 combo word
        s = pltpu.bitcast(jax.lax.shift_left(w, 16), jnp.float32)
        sz = pltpu.bitcast(w & jnp.int32(-65536), jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)  # [bm, 1]
        # fold the +2^bits unpack offset into the zero correction
        acc = acc + partial * s - xsum * (sz + offset * s)
    acc_ref[...] = acc

    @pl.when(k_step == nk - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _qmm_kernel_stacked(
    li_ref, x_ref, qw_ref, c_ref, out_ref, acc_ref,
    *, bits: int, groups_per_step: int, group_size: int
):
    """_qmm_kernel reading one layer of STACKED [L, ...] weights selected by
    a scalar-prefetched layer index: inside a lax.scan over layers, an XLA
    dynamic-slice feeding a pallas call MATERIALIZES the slice (an HBM->HBM
    copy of every weight, ~3.1 ms/step measured at 7B decode); with the
    index in the BlockSpec index_map the kernel DMAs the layer's blocks
    straight out of the stacked array. qw/c blocks carry a leading
    singleton layer dim."""
    del li_ref  # consumed by the index_maps
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pack = 32 // bits
    rows_per_group = group_size // pack
    offset = _BF16_TRICK[bits][3]
    x = x_ref[...]
    acc = acc_ref[...]
    g0 = k_step * groups_per_step
    for j in range(groups_per_step):
        qw = qw_ref[0, j * rows_per_group : (j + 1) * rows_per_group, :]
        codes = _dequant_block_bf16(qw, bits)
        xg = x[:, j * group_size : (j + 1) * group_size]
        partial = jnp.dot(
            xg.astype(jnp.bfloat16), codes, preferred_element_type=jnp.float32
        )
        w = c_ref[0, g0 + j, :][None, :]
        s = pltpu.bitcast(jax.lax.shift_left(w, 16), jnp.float32)
        sz = pltpu.bitcast(w & jnp.int32(-65536), jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + partial * s - xsum * (sz + offset * s)
    acc_ref[...] = acc

    @pl.when(k_step == nk - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "block_m", "block_n", "groups_per_step", "interpret"),
)
def _quant_matmul_pallas_2d_stacked(
    x,
    qweight,  # [L, K/pack, N]
    combo,  # [L, K/G, N]
    li,  # scalar int32 layer index
    *,
    bits: int,
    group_size: int,
    block_m: int,
    block_n: int,
    groups_per_step: int,
    interpret: bool = False,
):
    m, k = x.shape
    n = qweight.shape[2]
    pack = 32 // bits
    g = group_size
    bk = groups_per_step * g
    n_groups = k // g
    assert k % bk == 0, (k, bk)
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n), k // bk)
    kernel = functools.partial(
        _qmm_kernel_stacked, bits=bits, groups_per_step=groups_per_step,
        group_size=g,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, bk), lambda i, j, kk, li: (i, kk)),
            pl.BlockSpec(
                (1, groups_per_step * (g // pack), block_n),
                lambda i, j, kk, li: (li[0], kk, j),
            ),
            pl.BlockSpec((1, n_groups, block_n), lambda i, j, kk, li: (li[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk, li: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n * bits // 8 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.reshape(li, (1,)).astype(jnp.int32), x, qweight, combo)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "block_m", "block_n", "groups_per_step", "interpret"),
)
def _quant_matmul_pallas_2d(
    x,
    qweight,
    combo,
    *,
    bits: int,
    group_size: int,
    block_m: int,
    block_n: int,
    groups_per_step: int,
    interpret: bool = False,
):
    m, k = x.shape
    n = qweight.shape[1]
    pack = 32 // bits
    g = group_size
    bk = groups_per_step * g
    n_groups = k // g
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
            # full group axis, blocked over N only (sliced per k-step in-kernel)
            pl.BlockSpec((n_groups, block_n), lambda i, j, kk: (0, j)),
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
        interpret=interpret,
    )(x, qweight, combo)


def _combo_of(p: PackedLinear):
    if p.combo is not None:
        return p.combo
    # legacy artifacts without a stored combo: derive (costs an extra pass
    # per call — load paths should attach one via make_scale_combo instead)
    from ..quant.packing import make_scale_combo

    return make_scale_combo(p.scales, p.szeros)


# ---------------------------------------------------------------------------
# Tile policy: v5e-measured priors, overridable per backend
#
# The numbers below were measured on v5e (round 3). On another TPU generation
# or Mosaic release they may mistune, so every one of them resolves through
# (1) an installed policy (set_tile_policy / autotune_tile_policy), then
# (2) an env override, then (3) the v5e prior — no code edits needed.
# ---------------------------------------------------------------------------

_TILE_POLICY: dict[str, int] = {}

#   decode_vmem   VMEM budget for the single-K-pass decode qweight block
#                 (v5e has ~16 MiB; leave room for x, combo, accumulator)
#   stacked_vmem  cell-aware budget for the stacked kernel's whole block set
#   bn_cap        lane-block cap for small-m single-K-pass tiles
#   stacked_max_m beyond this m, slicing the layer once beats the stacked
#                 kernel (prefill amortizes the slice copy over many rows)
_TILE_PRIORS = {
    "decode_vmem": 11_800_000,
    "stacked_vmem": 15_000_000,
    "bn_cap": 4096,
    "stacked_max_m": 128,
}
_TILE_ENV = {
    "decode_vmem": "BITDISTILLER_QMM_VMEM",
    "stacked_vmem": "BITDISTILLER_QMM_STACKED_VMEM",
    "bn_cap": "BITDISTILLER_QMM_BN",
    "stacked_max_m": "BITDISTILLER_QMM_STACKED_MAX_M",
}


def tile_policy(key: str) -> int:
    if key in _TILE_POLICY:
        return _TILE_POLICY[key]
    import os

    v = os.environ.get(_TILE_ENV[key], "")
    return int(v) if v else _TILE_PRIORS[key]


def set_tile_policy(**kv: int) -> None:
    """Install measured tile-policy values (autotune_tile_policy calls this);
    pass key=None to drop an entry back to env/prior resolution."""
    for k, v in kv.items():
        if k not in _TILE_PRIORS:
            raise KeyError(f"unknown tile-policy key {k!r}")
        if v is None:
            _TILE_POLICY.pop(k, None)
        else:
            _TILE_POLICY[k] = int(v)


def autotune_tile_policy(p: PackedLinear, m: int = 8, *,
                         interpret: bool = False) -> dict:
    """Measure-once bn sweep for the current backend and install the winner.

    Times quant_matmul_pallas over bn ∈ {1024, 2048, 4096} (single-K-pass
    decode tiles) on a zeros activation of `m` rows and installs the fastest
    as bn_cap. VMEM budgets are deliberately NOT probed (OOM probing can
    wedge the backend) — override those via env on non-v5e hardware.
    Returns {bn: seconds} for the record."""
    from ..utils.profiling import autotune

    xz = jnp.zeros((m, p.in_features), jnp.bfloat16)

    def build(bn):
        def run(x):
            return quant_matmul_pallas(x, p, block_n=bn, interpret=interpret)

        return jax.jit(run) if not interpret else run

    best, results = autotune(build, (1024, 2048, 4096), xz)
    if best is not None:
        set_tile_policy(bn_cap=best)
    return results


def quant_matmul_pallas(
    x: jnp.ndarray,
    p: PackedLinear,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    groups_per_step: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [..., K] -> [..., N] via the fused Pallas kernel.

    Tile policy (measured on v5e, round 3): at decode widths (m <= 8) the
    fastest tiling is ONE K-pass per grid cell — gps = ALL groups when the
    qweight block fits VMEM — with bn ~ 4096. Per-matmul streaming at 7B
    shapes then sits at ~1.0-1.3x the HBM floor (qkv 48 -> 20 us, down
    38.5 -> 14.2 us vs the old (bn=2048, gps=8) default; gate_up is the
    straggler at ~2.2x). Round 2's "VPU-unpack-bound at ~2.5 vreg-ops/code"
    conclusion was an artifact of the old tile shape. Prefill (large m)
    keeps K-blocked tiles: the x block must also fit VMEM.

    When the group count is not a multiple of groups_per_step (e.g. llama
    down at gps 8: 86 groups), the matmul splits into a gps-aligned main
    region plus a small remainder call — but the decode policy prefers a
    single remainder-free pass (gps = n_groups) whenever it fits.
    """
    if p.a8_order:
        raise ValueError("A8-ordered qweight cannot go through the pair-layout Pallas path")
    k, n = p.in_features, p.out_features
    xf = x.reshape(-1, k)
    m = xf.shape[0]
    if block_m is None:
        # prefill sweep on v5e: bm=256 reaches 0.86 MFU at [4096, 4096xN]
        # shapes vs 0.78 at bm=128; decode (m<=8) keeps the minimal tile
        block_m = min(256, max(8, _round_up(m, 8)))
    g = p.group_size
    rpg = g // (32 // p.bits)
    n_groups = k // g
    if block_n is None or groups_per_step is None:
        # small-m (decode / short spec-verify) single-K-pass tiles measured
        # at ~1.0-1.3x HBM floor up to m=32; see quant_matmul_pallas_stacked
        if block_m <= 32:
            bn_cap = min(tile_policy("bn_cap"), n)
            vmem = tile_policy("decode_vmem")
            if groups_per_step is None:
                # whole-K pass if the qweight block fits the VMEM budget,
                # else the largest fitting power-of-two step
                if n_groups * rpg * bn_cap * 4 <= vmem:
                    groups_per_step = n_groups
                else:
                    groups_per_step = 8
                    while (
                        groups_per_step * 2 * rpg * bn_cap * 4 <= vmem
                        and groups_per_step * 2 <= n_groups
                    ):
                        groups_per_step *= 2
            if block_n is None:
                block_n = bn_cap
        else:
            if block_n is None:
                block_n = 2048
            if groups_per_step is None:
                groups_per_step = 8
    block_n = min(block_n, n)
    gps = min(groups_per_step, n_groups)
    combo = _combo_of(p)
    main_groups = (n_groups // gps) * gps

    run = functools.partial(
        _quant_matmul_pallas_2d,
        bits=p.bits,
        group_size=g,
        block_m=block_m,
        block_n=block_n,
        interpret=interpret,
    )
    out = run(
        xf[:, : main_groups * g],
        p.qweight[: main_groups * rpg],
        combo[:main_groups],
        groups_per_step=gps,
    )
    if main_groups < n_groups:
        rem = n_groups - main_groups
        out = out + run(
            xf[:, main_groups * g :],
            p.qweight[main_groups * rpg :],
            combo[main_groups:],
            groups_per_step=rem,
        )
    if p.bias is not None:
        out = out + p.bias.astype(out.dtype)
    return out.reshape(*x.shape[:-1], n)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def _materialize_min_m() -> int:
    import os

    return int(os.environ.get("BITDISTILLER_QMM_MATERIALIZE_M", "0") or 0)


def quant_matmul_materialize(x: jnp.ndarray, p: PackedLinear) -> jnp.ndarray:
    """Dequantize the whole weight to bf16 once, then a plain XLA matmul.

    At large M the fused kernel re-unpacks the weight for every M-block
    (grid M/bm x N/bn x K-steps); materializing pays one unpack + one bf16
    weight round-trip instead and lets the MXU run a stock GEMM.
    """
    from ..quant.packing import dequantize_linear

    w = dequantize_linear(p).astype(jnp.bfloat16)
    out = x.reshape(-1, p.in_features) @ w
    if p.bias is not None:
        out = out + p.bias.astype(out.dtype)
    return out.reshape(*x.shape[:-1], p.out_features)


def _a8_enabled() -> bool:
    import os

    return os.environ.get("BITDISTILLER_QMM_A8", "") not in ("", "0")


class StackedPacked(NamedTuple):
    """A view of one layer of a STACKED PackedLinear (arrays carry a leading
    [L] axis) selected by a traced layer index — the model's layer scan
    passes these instead of pre-sliced leaves so the Pallas kernel reads
    the layer's weights in place (no per-layer HBM copy)."""

    p: PackedLinear  # qweight [L, K/pack, N], combo [L, K/G, N]
    li: jnp.ndarray  # scalar int32


def _stacked_bn(m: int, p: PackedLinear) -> int | None:
    """Largest lane-block for a single-K-pass stacked call that fits VMEM
    (qweight block + x block + f32 accumulator + combo), or None."""
    k, n = p.in_features, p.out_features
    rpg = p.group_size // (32 // p.bits)
    n_groups = k // p.group_size
    bm = min(256, max(8, _round_up(m, 8)))
    bn_cap = tile_policy("bn_cap")
    budget = tile_policy("stacked_vmem")
    for bn in (bn_cap, bn_cap // 2, bn_cap // 4):
        bn = min(bn, n)
        # Mosaic double-buffers the input blocks BETWEEN grid cells; a
        # single-cell grid holds one copy of each (that's why decode m<=8
        # runs down at bn=4096: 13.1M single-buffered, while m=96 at the
        # same bn OOMs at 17.5M double-buffered)
        cells = -(-m // bm) * -(-n // bn)
        mult = 1 if cells == 1 else 2
        need = (
            mult * (
                n_groups * rpg * bn * 4  # qweight block
                + bm * k * 2  # x block
                + n_groups * bn * 4  # combo block
            )
            + bm * bn * 4  # accumulator scratch
            + bm * bn * 2  # out block
        )
        if need <= budget:
            return bn
    return None


def stacked_profitable(x: jnp.ndarray, p: PackedLinear) -> bool:
    """True when the scalar-prefetch stacked kernel beats slicing: small-m
    single-K-pass tiles only. MEASURED on v5e (7B shapes): stacked single-K
    wins at small m (m=16: 14.8 ms/forward vs 17.7 sliced; decode m<=8 is
    the big win), but stacked with MULTIPLE k-steps collapses (m=16 at
    gps=8: 46 ms vs 17.7) — the per-k-step re-DMA from the strided layer
    offset apparently defeats double-buffering. Beyond the m cap (prefill),
    slicing the layer once amortizes the copy over many rows."""
    k = p.in_features
    m = x.size // k
    if m > tile_policy("stacked_max_m"):
        return False
    return _stacked_bn(m, p) is not None


def quant_matmul_pallas_stacked(
    x: jnp.ndarray, p: PackedLinear, li, *, interpret: bool = False
) -> jnp.ndarray:
    """quant_matmul_pallas over one layer of stacked weights — single-K-pass
    tiles only (call sites gate on `stacked_profitable`); remainder split
    uses static row slices of the stacked arrays, which stay copy-free —
    the layer axis is untouched."""
    k, n = p.in_features, p.out_features
    xf = x.reshape(-1, k)
    m = xf.shape[0]
    block_m = min(256, max(8, _round_up(m, 8)))
    g = p.group_size
    rpg = g // (32 // p.bits)
    n_groups = k // g
    bn = _stacked_bn(m, p) or min(tile_policy("bn_cap"), n)
    gps = n_groups
    combo = _combo_of(p)
    main_groups = (n_groups // gps) * gps
    run = functools.partial(
        _quant_matmul_pallas_2d_stacked,
        bits=p.bits, group_size=g, block_m=block_m, block_n=bn,
        interpret=interpret,
    )
    out = run(
        xf[:, : main_groups * g],
        p.qweight[:, : main_groups * rpg],
        combo[:, :main_groups],
        li,
        groups_per_step=gps,
    )
    if main_groups < n_groups:
        out = out + run(
            xf[:, main_groups * g :],
            p.qweight[:, main_groups * rpg :],
            combo[:, main_groups:],
            li,
            groups_per_step=n_groups - main_groups,
        )
    if p.bias is not None:
        out = out + jax.lax.dynamic_index_in_dim(
            p.bias, li, keepdims=False
        ).astype(out.dtype)
    return out.reshape(*x.shape[:-1], n)


def _slice_stacked(sp: StackedPacked) -> PackedLinear:
    """Materialize one layer (the non-Pallas fallbacks accept plain leaves)."""
    import dataclasses

    take = lambda a: None if a is None else jax.lax.dynamic_index_in_dim(
        a, sp.li, keepdims=False
    )
    return dataclasses.replace(
        sp.p, qweight=take(sp.p.qweight), scales=take(sp.p.scales),
        szeros=take(sp.p.szeros), combo=take(sp.p.combo), bias=take(sp.p.bias),
    )


def quant_matmul(x: jnp.ndarray, p, *, use_pallas: bool | None = None):
    """Packed matmul; picks the Pallas kernel on TPU, XLA path elsewhere.

    BITDISTILLER_QMM_MATERIALIZE_M=<M> (experiment flag) routes calls with
    at least M rows through quant_matmul_materialize.
    BITDISTILLER_QMM_A8=1 (opt-in W{2,4}A8 serving mode) routes through the
    int8-MXU kernel — cheaper unpack, but per-token 8-bit activation
    quantization changes numerics; quality-sensitive paths keep A16.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if isinstance(p, StackedPacked):
        import os

        if (
            use_pallas
            and not p.p.a8_order
            and not _a8_enabled()
            and not _materialize_min_m()
            and stacked_profitable(x, p.p)
            and not os.environ.get("BITDISTILLER_NO_STACKED")  # A/B knob
        ):
            return quant_matmul_pallas_stacked(x, p.p, p.li)
        p = _slice_stacked(p)  # fallback paths take a plain layer leaf
    if p.a8_order:
        # weights were repacked for the A8 kernel; no other path can read them
        return quant_matmul_a8(x, p, interpret=not use_pallas)
    mm = _materialize_min_m()
    if mm and x.size // p.in_features >= mm:
        return quant_matmul_materialize(x, p)
    if use_pallas and _a8_enabled() and p.bits in (2, 4):
        return quant_matmul_a8(x, p)
    if use_pallas:
        return quant_matmul_pallas(x, p)
    return quant_matmul_xla(x, p)


# ---------------------------------------------------------------------------
# Experimental W{2,4}A8 path: int8 activations + int8 MXU matmul.
#
# Unpacking extracts codes straight into int8 *bytes* — (w >> bits*i) & mask
# yields FOUR codes per int32 lane per op (vs two for the bf16 trick), then a
# bitcast to int8 splits bytes onto sublanes. The resulting code order is a
# fixed permutation of k within each group (byte-quad over the pair layout),
# which is folded into the activations once outside the kernel — the dot is
# permutation-invariant. Out = sx_m * (s_g * (xi . q) - sz_g * sum(xi)).
# Activations quantize per-token symmetric int8 (sx = max|x|/127).
# ---------------------------------------------------------------------------


def _a8_perm(bits: int, group_size: int) -> "np.ndarray":
    """kmap[p] = source k (pair layout) for extraction-order row p."""
    import numpy as np

    pack = 32 // bits
    half = pack // 2
    R = group_size // pack
    cpb = 8 // bits  # codes per byte
    kmap = np.empty(group_size, np.int32)
    for i in range(cpb):
        for r in range(R):
            for j in range(4):  # byte lanes of the int32 word
                p = i * 4 * R + 4 * r + j
                f = cpb * j + i  # bit-field index in the word
                k = (f % half) * 2 * R + 2 * r + (f // half)
                kmap[p] = k
    return kmap


def _dequant_block_int8(qw_block, bits: int):
    """int32 [R, bn] one-group block -> int8 [G, bn] codes (extraction order)."""
    cpb = 8 // bits
    byte_mask = int.from_bytes(bytes([(1 << bits) - 1] * 4), "little")
    parts = []
    for i in range(cpb):
        t = jax.lax.shift_right_logical(qw_block, bits * i) & byte_mask
        parts.append(pltpu.bitcast(t, jnp.int8))  # [4R, bn]
    return jnp.concatenate(parts, axis=0)  # [G, bn]


def _qmm_a8_kernel(
    x_ref, qw_ref, s_ref, sz_ref, out_ref, acc_ref,
    *, bits: int, groups_per_step: int, group_size: int,
):
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pack = 32 // bits
    rpg = group_size // pack
    x = x_ref[...]  # [bm, bk] int8 (pre-permuted)
    acc = acc_ref[...]
    g0 = k_step * groups_per_step
    for j in range(groups_per_step):
        qw = qw_ref[j * rpg : (j + 1) * rpg, :]
        codes = _dequant_block_int8(qw, bits)  # [G, bn] int8
        xg = x[:, j * group_size : (j + 1) * group_size]
        partial = jax.lax.dot_general(
            xg, codes, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        s = s_ref[g0 + j, :][None, :]
        sz = sz_ref[g0 + j, :][None, :]
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        acc = acc + partial * s - xsum * sz
    acc_ref[...] = acc

    @pl.when(k_step == nk - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "block_m", "block_n", "groups_per_step", "interpret"),
)
def _quant_matmul_a8_2d(
    xi, qweight, scales, szeros,
    *, bits, group_size, block_m, block_n, groups_per_step, interpret=False,
):
    m, k = xi.shape
    n = qweight.shape[1]
    pack = 32 // bits
    g = group_size
    bk = groups_per_step * g
    n_groups = k // g
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n), k // bk)
    kernel = functools.partial(
        _qmm_a8_kernel, bits=bits, groups_per_step=groups_per_step, group_size=g
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec(
                (groups_per_step * (g // pack), block_n), lambda i, j, kk: (kk, j)
            ),
            pl.BlockSpec((n_groups, block_n), lambda i, j, kk: (0, j)),
            pl.BlockSpec((n_groups, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xi, qweight, scales, szeros)


def quant_matmul_a8(
    x: jnp.ndarray,
    p: PackedLinear,
    *,
    block_m: int | None = None,
    block_n: int = 2048,
    groups_per_step: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """W{2,4}A8 matmul: per-token int8 activations, int8 MXU, fused dequant.

    ~2x cheaper unpacking than the bf16 path (4 codes per op) at the cost of
    8-bit activation quantization (per-token symmetric)."""
    import numpy as np

    k, n = p.in_features, p.out_features
    xf = x.reshape(-1, k)
    m = xf.shape[0]
    sx = jnp.max(jnp.abs(xf.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-8)
    xi = jnp.clip(jnp.round(xf.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    if not p.a8_order:
        # pair-layout weights: fold the extraction permutation into x per call
        # (repack_linear_a8 folds it into the weights once instead)
        kmap = _a8_perm(p.bits, p.group_size)
        full_perm = (
            np.arange(k).reshape(-1, p.group_size)[:, kmap].reshape(-1)
            if p.group_size < k
            else kmap
        )
        xi = xi[:, jnp.asarray(full_perm)]
    if block_m is None:
        block_m = min(128, max(32, _round_up(m, 32)))  # int8 sublane tile = 32
    block_n = min(block_n, n)
    n_groups = k // p.group_size
    gps = groups_per_step
    while n_groups % gps != 0:
        gps //= 2
    acc = _quant_matmul_a8_2d(
        xi, p.qweight, p.scales.astype(jnp.float32), p.szeros.astype(jnp.float32),
        bits=p.bits, group_size=p.group_size, block_m=block_m, block_n=block_n,
        groups_per_step=gps, interpret=interpret,
    )
    out = acc * sx
    if p.bias is not None:
        out = out + p.bias.astype(out.dtype)
    return out.astype(x.dtype).reshape(*x.shape[:-1], n)


def pack_codes_a8(q_kn: jnp.ndarray, bits: int, group_size: int) -> jnp.ndarray:
    """Pack natural-order codes [K, N] into the A8 kernel's extraction order.

    The A8 kernel extracts code p = i*4R + 4r + j of each group from word
    row r, byte lane j, bit-field i (see _dequant_block_int8): placing codes
    by that map at pack time makes the extracted [G, bn] block come out in
    natural k order, so activations need no per-call permutation.
    """
    k, n = q_kn.shape
    pack = 32 // bits
    g = group_size if group_size > 0 else k
    r = g // pack
    cpb = 8 // bits
    q = q_kn.astype(jnp.uint32).reshape(k // g, cpb, r, 4, n)  # [g, i, r, j, n]
    shift = (
        jnp.arange(cpb, dtype=jnp.uint32)[:, None, None] * bits
        + jnp.arange(4, dtype=jnp.uint32)[None, None, :] * 8
    )  # [i, 1, j]
    words = jnp.sum(q << shift[None, :, :, :, None], axis=(1, 3), dtype=jnp.uint32)
    return words.reshape(k // pack, n).astype(jnp.int32)


def repack_linear_a8(p: PackedLinear) -> PackedLinear:
    """Re-order qweight from the pair layout into A8 extraction order (one-time).

    Group statistics (scales/szeros/combo) are order-invariant within a group
    and stay as-is. The returned PackedLinear routes exclusively through
    quant_matmul_a8 (a8_order=True); pair-layout consumers raise.
    """
    import dataclasses

    if p.a8_order:
        return p
    g = p.group_size

    def one(qw2d):
        codes = unpack_codes(qw2d, p.bits, g)
        return pack_codes_a8(codes, p.bits, g)

    qw = p.qweight
    fn = one
    for _ in range(qw.ndim - 2):  # stacked [L, K//pack, N] leaves
        fn = jax.vmap(fn)
    return dataclasses.replace(p, qweight=jax.jit(fn)(qw), a8_order=True)


def maybe_repack_a8(params):
    """Repack every PackedLinear leaf for W{2,4}A8 serving when
    BITDISTILLER_QMM_A8=1; identity otherwise. Call once at model load."""
    if not _a8_enabled():
        return params
    return jax.tree_util.tree_map(
        lambda x: repack_linear_a8(x) if isinstance(x, PackedLinear) else x,
        params,
        is_leaf=lambda x: isinstance(x, PackedLinear),
    )
