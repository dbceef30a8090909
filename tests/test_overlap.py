"""Ring-overlapped (collective) tensor-parallel matmuls on the 8-device CPU
mesh: reduce-scatter/all-gather rings must equal the plain psum result."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from bitdistiller_tpu.parallel.mesh import make_mesh
from bitdistiller_tpu.parallel.overlap import (
    make_row_parallel_fn,
    reduce_scatter_matmul,
)


def test_ring_all_reduce_matmul_dense():
    mesh = make_mesh(dp=1, tp=8)
    rng = np.random.default_rng(0)
    K, N, M = 256, 128, 4
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    fn = make_row_parallel_fn(w, "tp", mesh)
    with jax.set_mesh(mesh):
        out = jax.jit(fn)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w), rtol=2e-5, atol=2e-5)


def test_reduce_scatter_matmul_chunks():
    mesh = make_mesh(dp=1, tp=8)
    rng = np.random.default_rng(1)
    K, N, M = 256, 64, 2
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)

    def body(x_local, w_local):
        return reduce_scatter_matmul(x_local, w_local, "tp")

    with jax.set_mesh(mesh):
        out = shard_map(
            body, mesh=mesh, in_specs=(P(None, "tp"), P("tp", None)),
            out_specs=P(None, "tp"), check_rep=False,
        )(x, w)
    # out is [M, N] with chunk c owned by shard c — equals the full product
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w), rtol=2e-5, atol=2e-5)


def test_ring_all_reduce_matmul_packed():
    """Packed int2 row-parallel ring vs the single-device XLA reference."""
    from bitdistiller_tpu.ops.quant_matmul import quant_matmul_xla
    from bitdistiller_tpu.quant.packing import quantize_pack_linear

    mesh = make_mesh(dp=1, tp=8)
    rng = np.random.default_rng(2)
    K, N, M, G = 1024, 128, 4, 128
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    fn = make_row_parallel_fn(w, "tp", mesh, packed_bits=2, group_size=G)
    with jax.set_mesh(mesh):
        out = jax.jit(fn)(x)
    # reference: per-shard quantization grids == full-weight grid (G | K/tp)
    want = quant_matmul_xla(x, quantize_pack_linear(w, 2, G))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4)
