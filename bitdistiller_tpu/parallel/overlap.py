"""Communication-overlapped tensor-parallel matmuls (collective matmul).

SURVEY §7's hard part for multi-host serving: row-parallel linears (o_proj,
down_proj) end in an all-reduce of [M, N] partials; at scale the collective
serializes behind the matmul unless overlapped. These helpers run inside
`shard_map` over the tp axis and decompose the all-reduce into a ring of
N-chunks interleaved with per-chunk matmuls — every `lax.ppermute` hop is
async and overlaps the next chunk's compute (XLA's async collectives on ICI;
the reference's DeepSpeed gets this from NCCL's overlap_comm,
train/config/zero.json).

reduce_scatter_matmul: x_local [M, K/tp] @ w_local [K/tp, N] -> out chunk
[M, N/tp] owned by this shard, accumulated around the ring.
ring_all_reduce_matmul: the same followed by a ring all-gather -> [M, N]
replicated (== psum of partials, chunk-pipelined).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..quant.packing import PackedLinear


def slice_packed_n(p: PackedLinear, n0, nc: int) -> PackedLinear:
    """N (lane-dim) slice of a PackedLinear — all per-N arrays slice together.
    `n0` may be a traced value (ring step index); `nc` must be static."""
    dsl = partial(jax.lax.dynamic_slice_in_dim, axis=1)
    return dataclasses.replace(
        p,
        qweight=dsl(p.qweight, n0, nc),
        scales=dsl(p.scales, n0, nc),
        szeros=dsl(p.szeros, n0, nc),
        combo=None if p.combo is None else dsl(p.combo, n0, nc),
        bias=None if p.bias is None
        else jax.lax.dynamic_slice_in_dim(p.bias, n0, nc, axis=0),
        out_features=nc,
    )


def _chunk_matmul(x_local, w_local, c0, nc: int):
    if isinstance(w_local, PackedLinear):
        from ..ops.quant_matmul import quant_matmul

        return quant_matmul(x_local, slice_packed_n(w_local, c0, nc))
    return x_local @ jax.lax.dynamic_slice_in_dim(w_local, c0, nc, axis=1)


def reduce_scatter_matmul(x_local, w_local, axis: str):
    """Row-parallel matmul with a ring reduce-scatter folded into the compute.

    Inside shard_map: x_local [M, K/tp], w_local [K/tp, N] (dense array or
    PackedLinear). Returns this shard's [M, N/tp] output chunk =
    sum_over_shards(partial[:, my_chunk]).

    Step s computes the chunk that is (tp-1-s) hops ahead of this shard and
    passes the accumulator one hop around the ring, so each shard finishes
    holding its own fully-reduced chunk while every hop overlaps the next
    chunk's matmul.
    """
    tp = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    n = w_local.out_features if isinstance(w_local, PackedLinear) else w_local.shape[1]
    assert n % tp == 0, (n, tp)
    nc = n // tp
    perm = [(i, (i + 1) % tp) for i in range(tp)]

    acc = None
    for step in range(tp):
        # chunk owned by the shard `tp-1-step` hops downstream; after the
        # remaining hops the accumulator lands on that owner
        chunk = (idx + tp - 1 - step) % tp
        partial = _chunk_matmul(x_local, w_local, chunk * nc, nc)
        if acc is None:
            acc = partial
        else:
            acc = jax.lax.ppermute(acc, axis, perm) + partial
    return acc  # [M, nc] — this shard's reduced chunk


def ring_all_reduce_matmul(x_local, w_local, axis: str):
    """Row-parallel matmul -> replicated [M, N] output (== psum of partials),
    as ring reduce-scatter + ring all-gather, both chunk-pipelined."""
    tp = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    n = w_local.out_features if isinstance(w_local, PackedLinear) else w_local.shape[1]
    nc = n // tp
    my_chunk = reduce_scatter_matmul(x_local, w_local, axis)  # [M, nc]

    m = my_chunk.shape[0]
    out = jnp.zeros((m, n), my_chunk.dtype)
    perm = [(i, (i + 1) % tp) for i in range(tp)]
    buf = my_chunk
    src = idx
    for _ in range(tp):
        out = jax.lax.dynamic_update_slice(out, buf, (0, src * nc))
        buf = jax.lax.ppermute(buf, axis, perm)
        src = (src - 1) % tp
    return out


def make_row_parallel_fn(w_full, axis: str, mesh, *, packed_bits=None,
                         group_size: int = 128):
    """Convenience: split a full [K, N] weight row-parallel over `axis` and
    return fn(x [M, K] replicated) -> [M, N] replicated computed with the
    overlapped ring (for tests / microbenches; model integration shards the
    tree with param_specs instead)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if packed_bits is not None:
        from ..quant.packing import quantize_pack_linear

        tp = mesh.shape[axis]
        k = w_full.shape[0]
        # quantize each K-shard independently (row-parallel group stats are
        # per-shard anyway since tp | n_groups) and stack the shard pytrees
        # along a leading axis that shard_map splits
        shards = [
            quantize_pack_linear(
                w_full[i * (k // tp):(i + 1) * (k // tp)], packed_bits, group_size
            )
            for i in range(tp)
        ]
        w_arg = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *shards)

        def body(x_local, w_stacked):
            w_local = jax.tree_util.tree_map(lambda a: a[0], w_stacked)
            return ring_all_reduce_matmul(x_local, w_local, axis)

        return lambda x: shard_map(
            body, mesh=mesh, in_specs=(P(None, axis), P(axis)),
            out_specs=P(None, None), check_rep=False,
        )(x, w_arg)

    def body(x_local, w_local):
        return ring_all_reduce_matmul(x_local, w_local, axis)

    return lambda x: shard_map(
        body, mesh=mesh, in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(None, None), check_rep=False,
    )(x, w_full)
