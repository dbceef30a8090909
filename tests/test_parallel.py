"""Multi-device sharding tests on the 8-way virtual CPU mesh: TP/DP-sharded
forwards must match the single-device reference, and the KD train step must
run sharded (ZeRO-style dp + Megatron tp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bitdistiller_tpu.models import TINY_TEST, KVCache, forward, init_params
from bitdistiller_tpu.models.quantized import pack_model
from bitdistiller_tpu.parallel.mesh import (
    kv_cache_specs,
    make_mesh,
    param_specs,
    shard_packed_model,
    shard_params,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = TINY_TEST  # heads 4, kv heads 2 -> tp=2 works
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    return cfg, params


def test_dense_tp_forward_matches_single(tiny):
    cfg, params = tiny
    tokens = jnp.arange(16, dtype=jnp.int32).reshape(2, 8)
    ref, _ = forward(params, cfg, tokens)

    mesh = make_mesh(dp=4, tp=2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh, param_specs(cfg))
        out, _ = jax.jit(lambda p, t: forward(p, cfg, t))(sharded, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=6e-2, atol=6e-2)


def test_packed_tp_decode_matches_single(tiny):
    cfg, params = tiny
    packed = pack_model(params, cfg, bits=4, group_size=64, fuse=False)
    tokens = jnp.arange(8, dtype=jnp.int32).reshape(2, 4)

    cache = KVCache.init(cfg, batch=2, max_len=16, dtype=jnp.float32)
    ref, ref_cache = forward(packed, cfg, tokens, cache=cache, cache_pos=0)

    mesh = make_mesh(dp=4, tp=2)
    with jax.set_mesh(mesh):
        sp = shard_packed_model(packed, mesh, cfg)
        cache2 = KVCache.init(cfg, batch=2, max_len=16, dtype=jnp.float32)
        # batch 2 can't shard over dp=4; keep cache replicated on dp for test
        out, new_cache = jax.jit(
            lambda p, c, t: forward(p, cfg, t, cache=c, cache_pos=0)
        )(sp, cache2, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(new_cache.k), np.asarray(ref_cache.k), rtol=2e-3, atol=2e-3
    )


def test_per_slot_decode_positions(tiny):
    """Vector cache_pos: two slots at different lengths decode correctly."""
    cfg, params = tiny
    full = jnp.asarray([[5, 9, 2, 7], [3, 4, 6, 8]], jnp.int32)
    # slot 0 has 2 tokens of context, slot 1 has 3; prefill each slot's
    # prefix via the return_kv path and insert into a shared cache
    cache1 = KVCache.init(cfg, batch=2, max_len=8, dtype=jnp.float32)
    _, kv0 = forward(params, cfg, full[:1, :2], return_kv=True)
    _, kv1 = forward(params, cfg, full[1:, :3], return_kv=True)
    # return_kv yields [L, B, S, H, D]; cache is head-major [L, B, H, T, D]
    def hm(kv_b):  # [L, S, H, D] -> [L, H, S, D]
        return kv_b.transpose(0, 2, 1, 3)

    k = cache1.k.at[:, 0, :, :2].set(hm(kv0.k[:, 0]))
    k = k.at[:, 1, :, :3].set(hm(kv1.k[:, 0]))
    v = cache1.v.at[:, 0, :, :2].set(hm(kv0.v[:, 0]))
    v = v.at[:, 1, :, :3].set(hm(kv1.v[:, 0]))
    cache1 = KVCache(k=k, v=v)

    next_toks = jnp.asarray([[full[0, 2]], [full[1, 3]]])
    pos = jnp.asarray([2, 3])
    logits, _ = forward(params, cfg, next_toks, cache=cache1, cache_pos=pos)

    # reference: full-context forwards
    ref0, _ = forward(params, cfg, full[:1, :3])
    ref1, _ = forward(params, cfg, full[1:, :4])
    np.testing.assert_allclose(
        np.asarray(logits[0, 0]), np.asarray(ref0[0, -1]), rtol=6e-2, atol=6e-2
    )
    np.testing.assert_allclose(
        np.asarray(logits[1, 0]), np.asarray(ref1[0, -1]), rtol=6e-2, atol=6e-2
    )


def test_kv_cache_sharding_specs(tiny):
    cfg, _ = tiny
    mesh = make_mesh(dp=4, tp=2)
    cache = KVCache.init(cfg, batch=4, max_len=16)
    specs = kv_cache_specs()
    sharded = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )
    assert sharded.k.sharding.spec == P(None, "dp", "tp", None, None)


# ---------------------------------------------------------------------------
# ZeRO optimizer-state sharding (DeepSpeed zero.json / zero3.json parity)
# ---------------------------------------------------------------------------


def _dp_leaves(tree):
    return [
        x
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "sharding") and "dp" in tuple(getattr(x.sharding, "spec", ()) or ())
    ]


def test_zero2_moments_dp_sharded(tiny):
    from bitdistiller_tpu.train import TrainConfig, init_train_state, make_train_step

    cfg, params = tiny
    mesh = make_mesh(dp=4, tp=2)
    specs = param_specs(cfg)
    tc = TrainConfig(quant_type="int2-asym", q_group_size=32, total_steps=2,
                     kd_loss_type="cakld")
    with jax.set_mesh(mesh):
        teacher = shard_params(params, mesh, specs)
        state = init_train_state(teacher, tc, mesh=mesh, param_spec_tree=specs,
                                 zero_stage=2)
        moments = _dp_leaves(state.opt_state)
        assert moments, "no dp-sharded Adam moments"
        # params stay replicated over dp in stage 2
        assert not _dp_leaves(state.params)
        # one train step keeps the moments sharded
        step = jax.jit(make_train_step(cfg, tc, teacher_params=teacher))
        batch = {
            "input_ids": np.zeros((8, 8), np.int32),
            "labels": np.zeros((8, 8), np.int32),
            "attention_mask": np.ones((8, 8), np.int32),
        }
        batch = {k: jax.device_put(v, NamedSharding(mesh, P("dp")))
                 for k, v in batch.items()}
        new_state, _ = step(state, batch, jnp.asarray(0.5))
        assert len(_dp_leaves(new_state.opt_state)) == len(moments)


def test_zero2_with_grad_accum_multisteps(tiny):
    """grad_accum > 1 with bf16 latents takes the fused
    with_f32_master_accum path — its f32 master/acc buffers must also
    shard over dp (and MultiSteps' acc_grads likewise on the f32-latent
    path, which make_optimizer still uses for param_dtype=float32)."""
    from bitdistiller_tpu.train import TrainConfig, init_train_state

    cfg, params = tiny
    mesh = make_mesh(dp=4, tp=2)
    specs = param_specs(cfg)
    tc = TrainConfig(quant_type="int2-asym", q_group_size=32, total_steps=2,
                     grad_accum=2)
    with jax.set_mesh(mesh):
        teacher = shard_params(params, mesh, specs)
        state = init_train_state(teacher, tc, mesh=mesh, param_spec_tree=specs,
                                 zero_stage=2)
        assert _dp_leaves(state.opt_state)


def test_zero3_params_and_moments_dp_sharded(tiny):
    from bitdistiller_tpu.train import TrainConfig, init_train_state

    cfg, params = tiny
    mesh = make_mesh(dp=4, tp=2)
    specs = param_specs(cfg, fsdp_axis="dp")
    tc = TrainConfig(quant_type="int2-asym", q_group_size=32, total_steps=2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh, specs)
        state = init_train_state(sharded, tc, mesh=mesh, param_spec_tree=specs,
                                 zero_stage=3)
        assert _dp_leaves(state.params)
        assert _dp_leaves(state.opt_state)


def test_zero_extend_spec_rules():
    from bitdistiller_tpu.parallel.mesh import zero_extend_spec

    # first free divisible dim gets dp
    assert zero_extend_spec(P(None, None, "tp"), (2, 128, 64), 4) == P(None, "dp", "tp")
    # layer dim indivisible -> skipped
    assert zero_extend_spec(P(None, None), (3, 128), 4) == P(None, "dp")
    # already dp-sharded (fsdp) -> unchanged
    assert zero_extend_spec(P(None, "dp", "tp"), (2, 128, 64), 4) == P(None, "dp", "tp")
    # nothing divisible -> unchanged
    assert zero_extend_spec(P(None, None), (3, 5), 4) == P(None, None)
