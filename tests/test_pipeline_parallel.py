"""Pipeline parallelism (parallel/pipeline.py): GPipe-style microbatched
forward over a `pp` mesh axis must reproduce llama.forward exactly —
including the fake-quant QAT forward — on the virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdistiller_tpu.models import TINY_TEST, forward, init_params
from bitdistiller_tpu.parallel.pipeline import (
    make_pp_mesh,
    pipeline_forward,
    pp_param_specs,
    shard_params_pp,
)

CFG = dataclasses.replace(TINY_TEST, num_layers=4)


@pytest.fixture(scope="module")
def setup():
    params = init_params(CFG, jax.random.key(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (4, 16)), jnp.int32)
    want = forward(params, CFG, tokens)[0]
    return params, tokens, want


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (4, 2), (4, 4), (2, 1)])
def test_pipeline_forward_matches_dense(setup, pp, n_micro):
    params, tokens, want = setup
    mesh = make_pp_mesh(pp)
    sharded = shard_params_pp(params, mesh)
    got = pipeline_forward(
        sharded, CFG, tokens, mesh, n_micro=n_micro
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_pipeline_forward_fake_quant(setup):
    """The KD-QAT quantize-on-forward closure rides through the pipelined
    stages identically (the training-forward slice PP exists for)."""
    from bitdistiller_tpu.quant.core import make_fake_quantizer

    params, tokens, _ = setup
    q = make_fake_quantizer("int2", 32)
    quantizer = lambda w: q(w.T).T
    want = forward(params, CFG, tokens, quantizer=quantizer)[0]
    mesh = make_pp_mesh(4)
    got = pipeline_forward(
        shard_params_pp(params, mesh), CFG, tokens, mesh,
        n_micro=2, quantizer=quantizer,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_pipeline_specs_and_errors(setup):
    params, tokens, _ = setup
    specs = pp_param_specs(params)
    leaves = jax.tree_util.tree_leaves(
        specs["layers"], is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
    )
    assert all(s == jax.sharding.PartitionSpec("pp") for s in leaves)
    mesh = make_pp_mesh(3)  # 4 layers % 3 stages
    with pytest.raises(ValueError, match="num_layers"):
        pipeline_forward(params, CFG, tokens, mesh, n_micro=2)
    mesh = make_pp_mesh(2)
    with pytest.raises(ValueError, match="n_micro"):
        pipeline_forward(params, CFG, tokens, mesh, n_micro=3)
