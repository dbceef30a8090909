"""Training flash-attention route (BITDISTILLER_TRAIN_FLASH=1): the stock
pallas TPU flash kernel wired into the training forward must match the XLA
causal-attention path in value AND gradient, including padding masks via
segment ids. Runs on CPU under pltpu.force_tpu_interpret_mode() (the context
must wrap trace+lowering+run, which is why the library itself doesn't open
it — the env gate keeps CPU off this path unless a test asks)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from bitdistiller_tpu.models import ModelConfig, init_params, llama

CFG = ModelConfig(
    vocab_size=512,
    hidden_size=256,
    intermediate_size=512,
    num_layers=2,
    num_heads=2,  # MHA, head_dim 128 — flash-eligible
    num_kv_heads=2,
    max_position_embeddings=512,
)


@pytest.fixture
def setup():
    params = init_params(CFG, jax.random.key(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 256)), jnp.int32)
    mask = jnp.ones((2, 256), jnp.int32).at[1, 200:].set(0)
    return params, toks, mask


def _loss(params, toks, mask):
    logits, _ = llama.forward(params, CFG, toks, attn_mask=mask)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32))
    # weight by the padding mask: pad-row outputs legitimately differ
    # between the mask and segment-id formulations and never reach the loss
    m = jnp.ones(toks.shape) if mask is None else mask
    return (lp[..., 3] * m).sum() / 512.0


@pytest.mark.parametrize("padded", [False, True])
def test_train_flash_matches_xla_value_and_grad(setup, monkeypatch, padded):
    params, toks, mask = setup
    mask = mask if padded else None
    monkeypatch.setenv("BITDISTILLER_TRAIN_FLASH", "0")
    l_ref = _loss(params, toks, mask)
    g_ref = jax.grad(_loss)(params, toks, mask)
    monkeypatch.setenv("BITDISTILLER_TRAIN_FLASH", "1")
    with pltpu.force_tpu_interpret_mode():
        l_fl = _loss(params, toks, mask)
        g_fl = jax.grad(_loss)(params, toks, mask)
    assert abs(float(l_ref - l_fl)) < 2e-3
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_ref, g_fl
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 2e-2


def test_flash_gate_requires_eligible_shapes(setup, monkeypatch):
    """Ineligible configs (GQA, S not a multiple of 128, head_dim != 128k)
    must fall back to the XLA path — i.e. still run WITHOUT the interpret
    context on CPU (the flash kernel would raise)."""
    params, toks, mask = setup
    monkeypatch.setenv("BITDISTILLER_TRAIN_FLASH", "1")
    # S = 100 (not %128): gate must fall back, so this runs fine on CPU
    out, _ = llama.forward(params, CFG, toks[:, :100], attn_mask=mask[:, :100])
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # GQA config: gate must fall back
    gqa = ModelConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=1, num_heads=2, num_kv_heads=1,
        max_position_embeddings=512,
    )
    gp = init_params(gqa, jax.random.key(1), dtype=jnp.float32)
    out, _ = llama.forward(gp, gqa, toks, attn_mask=mask)
    assert np.isfinite(np.asarray(out, np.float32)).all()
