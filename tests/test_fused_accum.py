"""Fused grad-accumulation cycle step (quantize-once-per-accum-cycle).

Parity bars:
  * quantize_layer_weights drops into forward(quantizer=None) bit-identically
    to the in-forward QAT quantization (models/layers.py:101-109).
  * one fused cycle == grad_accum stepwise micro-steps: same averaged-grad /
    clip-once / Adam-once semantics as the reference's DeepSpeed bf16 mode
    with --gradient_accumulation_steps (train/config/zero.json,
    scripts/train/train.sh:29-37).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdistiller_tpu.models import TINY_TEST, forward, init_params
from bitdistiller_tpu.models.llama import quantize_layer_weights
from bitdistiller_tpu.train import trainer as tr


def _batches(cfg, k, bsz=2, seq=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": jnp.asarray(
            rng.integers(0, cfg.vocab_size, (k, bsz, seq)), jnp.int32
        ),
        "labels": jnp.asarray(
            rng.integers(0, cfg.vocab_size, (k, bsz, seq)), jnp.int32
        ),
        "attention_mask": jnp.ones((k, bsz, seq), jnp.int32),
    }


def _micro(batches, i):
    return jax.tree_util.tree_map(lambda x: x[i], batches)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_quantize_layer_weights_matches_inforward(dtype):
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0), dtype=dtype)
    tc = tr.TrainConfig(bits=2, q_group_size=32, quant_type="int2-asym")
    q = tr.make_quantizer(tc)
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 16)), jnp.int32
    )
    ref, _ = forward(params, cfg, tokens, quantizer=q)
    got, _ = forward(quantize_layer_weights(params, q), cfg, tokens)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def _run_stepwise(cfg, tc, params, teacher, batches, k):
    state = tr.init_train_state(params, tc)
    step = jax.jit(tr.make_train_step(cfg, tc))
    beta = jnp.asarray(0.5)
    losses = []
    for i in range(k):
        state, m = step(state, _micro(batches, i), beta, teacher)
        losses.append(float(m["loss"]))
    return state, losses


def _run_fused(cfg, tc_fused, params, teacher, batches):
    state = tr.init_train_state(params, tc_fused)
    cycle = jax.jit(tr.make_fused_train_step(cfg, tc_fused))
    state, m = cycle(state, batches, jnp.asarray(0.5), teacher)
    return state, [float(x) for x in np.asarray(m["micro_losses"])]


def test_fused_cycle_matches_stepwise_f32():
    cfg = TINY_TEST
    k = 4
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    teacher = init_params(cfg, jax.random.key(1), dtype=jnp.float32)
    batches = _batches(cfg, k)
    kw = dict(bits=2, q_group_size=32, quant_type="int2-asym",
              kd_loss_type="cakld", grad_accum=k, param_dtype="float32",
              learning_rate=1e-3, total_steps=8)
    st_step, losses_sw = _run_stepwise(cfg, tr.TrainConfig(**kw), params,
                                       teacher, batches, k)
    st_fused, losses_f = _run_fused(cfg, tr.TrainConfig(**kw, fused_accum=True),
                                    params, teacher, batches)
    # identical per-micro losses (same weights all cycle in both paths)
    np.testing.assert_allclose(losses_f, losses_sw, rtol=1e-5, atol=1e-6)
    # identical post-cycle weights up to f32 summation order
    a = jax.tree_util.tree_leaves(st_step.params)
    b = jax.tree_util.tree_leaves(st_fused.params)
    # Adam's normalized update turns f32 summation-order noise into
    # up-to-lr-scale wiggles on near-zero-grad elements; bound by abs tol
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=2e-4, atol=5e-5,
        )


def test_fused_cycle_matches_stepwise_bf16():
    cfg = TINY_TEST
    k = 4
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    teacher = init_params(cfg, jax.random.key(1), dtype=jnp.bfloat16)
    batches = _batches(cfg, k)
    kw = dict(bits=2, q_group_size=32, quant_type="int2-asym",
              kd_loss_type="cakld", grad_accum=k, param_dtype="bfloat16",
              learning_rate=1e-3, total_steps=8)
    st_step, losses_sw = _run_stepwise(cfg, tr.TrainConfig(**kw), params,
                                       teacher, batches, k)
    assert isinstance(st_step.opt_state, tr.MasterAccumState)
    st_fused, losses_f = _run_fused(cfg, tr.TrainConfig(**kw, fused_accum=True),
                                    params, teacher, batches)
    assert isinstance(st_fused.opt_state, tr.MasterWeightsState)
    np.testing.assert_allclose(losses_f, losses_sw, rtol=2e-3, atol=1e-4)
    # masters start equal and move by one Adam update each (bounded by ~lr);
    # bf16-grad rounding differs between the paths (fused rounds the MEAN
    # cotangent once; stepwise rounds each micro grad), and Adam's
    # normalized update amplifies that to +-lr on near-zero-grad elements —
    # so the meaningful bound is absolute, a fraction of 2*lr
    lr = kw["learning_rate"]
    ma = tr.master_params(st_step)
    mb = tr.master_params(st_fused)
    n_off = 0
    n_tot = 0
    for x, y in zip(jax.tree_util.tree_leaves(ma), jax.tree_util.tree_leaves(mb)):
        x = np.asarray(x, np.float32)
        y = np.asarray(y, np.float32)
        assert np.max(np.abs(x - y)) < 2.5 * lr, np.max(np.abs(x - y))
        n_off += int((np.abs(x - y) > 0.5 * lr).sum())
        n_tot += x.size
    assert n_off / n_tot < 0.02, (n_off, n_tot)


def test_fused_no_quant_plain_ce():
    """fused_accum with quant_type='' (no quantizer) and no teacher: the
    plain-CE branch still matches stepwise."""
    cfg = TINY_TEST
    k = 2
    params = init_params(cfg, jax.random.key(2), dtype=jnp.float32)
    batches = _batches(cfg, k, seed=3)
    kw = dict(quant_type="", train_kd=False, grad_accum=k,
              param_dtype="float32", learning_rate=1e-3, total_steps=4)
    st_step, losses_sw = _run_stepwise(cfg, tr.TrainConfig(**kw), params,
                                       None, batches, k)
    st_fused, losses_f = _run_fused(cfg, tr.TrainConfig(**kw, fused_accum=True),
                                    params, None, batches)
    np.testing.assert_allclose(losses_f, losses_sw, rtol=1e-5, atol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(st_step.params),
                    jax.tree_util.tree_leaves(st_fused.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-6)
