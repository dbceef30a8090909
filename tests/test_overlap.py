"""Ring-overlapped (collective) tensor-parallel matmuls on the 8-device CPU
mesh: reduce-scatter/all-gather rings must equal the plain psum result."""

import pytest
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

# Integration tier: this whole module is `-m slow` (many multi-second
# XLA CPU compiles). The default `-m 'not slow'` tier keeps the unit /
# parity / kernel tests for a minutes-scale pre-commit run; run the
# full suite (no -m filter) before shipping engine/trainer changes.
pytestmark = pytest.mark.slow



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


def test_ring_tp_whole_model_matches_default(monkeypatch):
    """BITDISTILLER_RING_TP=1 routes the packed model's row-parallel linears
    (o, down) through the ring collective-matmul inside the normal forward:
    greedy decode logits must match the default XLA-collective path on a
    TP-sharded mesh."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bitdistiller_tpu.models import TINY_TEST, init_params, llama
    from bitdistiller_tpu.models.llama import KVCache
    from bitdistiller_tpu.models.quantized import pack_model
    from bitdistiller_tpu.parallel.mesh import kv_cache_specs, shard_packed_model

    cfg = type(TINY_TEST)(**{**TINY_TEST.__dict__, "dtype": "float32"})
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    packed = pack_model(params, cfg, bits=4, group_size=64, fuse=False)
    mesh = make_mesh(dp=4, tp=2)  # kv heads (2) must divide over tp
    toks = jnp.asarray(np.arange(16).reshape(4, 4) % cfg.vocab_size, jnp.int32)

    outs = {}
    for ring in (False, True):
        if ring:
            monkeypatch.setenv("BITDISTILLER_RING_TP", "1")
        else:
            monkeypatch.delenv("BITDISTILLER_RING_TP", raising=False)
        with jax.set_mesh(mesh):
            sharded = shard_packed_model(packed, mesh, cfg)
            cache = KVCache.init(cfg, batch=4, max_len=16, dtype=jnp.float32)
            cache = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                cache, kv_cache_specs(),
            )
            # prefill-style S=4 AND decode-style S=1 both cross the ring path
            logits, cache = jax.jit(
                lambda p, c, t: llama.forward(p, cfg, t, cache=c,
                                              cache_pos=jnp.zeros(4, jnp.int32))
            )(sharded, cache, toks)
            outs[ring] = np.asarray(logits)
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-5, atol=2e-5)
