"""Perplexity harness tests on the tiny model (synthetic tokens)."""

import numpy as np
import jax
import jax.numpy as jnp

from bitdistiller_tpu.eval.ppl import make_nll_fn, perplexity, prepare_blocks
from bitdistiller_tpu.models import TINY_TEST, init_params
from bitdistiller_tpu.quant import make_fake_quantizer


def test_prepare_blocks():
    blocks = prepare_blocks(np.arange(1000), seqlen=128)
    assert blocks.shape == (7, 128)
    assert blocks.dtype == np.int32


def test_perplexity_uniform_bound():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, cfg.vocab_size, (4, 64)).astype(np.int32)
    ppl = perplexity(params, cfg, blocks, batch_size=2)
    # random model on random tokens: ppl near vocab_size, definitely finite
    assert 1.0 < ppl < cfg.vocab_size * 20


def test_quantized_ppl_worse_than_dense():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    # "natural" data for this model: tokens it can partially predict are hard
    # to synthesize; instead just check the quantized eval path runs and the
    # two ppls differ (int2 g64 is a big perturbation).
    blocks = rng.integers(0, cfg.vocab_size, (2, 64)).astype(np.int32)
    dense = perplexity(params, cfg, blocks)
    quant = perplexity(
        params, cfg, blocks, quantizer=make_fake_quantizer("int2-asym", 64)
    )
    assert dense != quant
    assert np.isfinite(quant)


def test_nll_matches_manual():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0))
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (1, 32)), jnp.int32
    )
    nll = float(make_nll_fn(cfg)(params, tokens)[0])
    from bitdistiller_tpu.models import forward

    logits, _ = forward(params, cfg, tokens)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
    want = float(
        -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1).mean() * 32
    )
    np.testing.assert_allclose(nll, want, rtol=1e-5)
