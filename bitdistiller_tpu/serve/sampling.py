"""Token sampling: temperature / top-k / top-p / repetition penalty.

Parity with the reference's logits-processor chain
(inference/stream_generators/stream_gen.py:19-32, which uses HF
TemperatureLogitsWarper, RepetitionPenaltyLogitsProcessor, TopKLogitsWarper,
TopPLogitsWarper in that order) — implemented as one jittable function over
batched logits; greedy when temperature == 0.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.7
    top_k: int = 0  # 0 = disabled
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    # static bound on how many recent tokens feed the repetition penalty
    repetition_window: int = 512


def apply_repetition_penalty(
    logits: jnp.ndarray,  # [B, V]
    prev_tokens: jnp.ndarray,  # [B, W] (pad with -1)
    penalty: float,
) -> jnp.ndarray:
    """HF semantics: for seen tokens, positive logits /= p, negative *= p."""
    b, v = logits.shape
    seen = jnp.zeros((b, v), bool)
    valid = prev_tokens >= 0
    safe = jnp.where(valid, prev_tokens, 0)
    onehot = jax.nn.one_hot(safe, v, dtype=jnp.bool_) & valid[..., None]
    seen = jnp.any(onehot, axis=1)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _top_k_mask(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def _top_p_mask(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < p; always keep top-1
    cutoff_mask = cum - probs >= p
    cutoff_logit = jnp.min(
        jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True
    )
    return jnp.where(logits < cutoff_logit, -jnp.inf, logits)


def sample_tokens_batched(
    key: jax.Array,
    logits: jnp.ndarray,  # [B, V]
    temps: jnp.ndarray,  # [B] (0 = greedy per row)
    top_ks: jnp.ndarray,  # [B] int (0 = disabled per row)
    top_ps: jnp.ndarray,  # [B] (1.0 = disabled per row)
    rep_pens: jnp.ndarray,  # [B] (1.0 = disabled per row)
    prev_tokens: jnp.ndarray | None = None,  # [B, W]
) -> jnp.ndarray:
    """Per-row sampling parameters (continuous batching serves requests with
    different generation settings in one decode step — the reference's
    stream_gen takes gen_params per call but is batch-1; here each slot
    carries its own). Same processor order as `sample_tokens`; one full sort
    serves both the per-row top-k threshold and the top-p cutoff."""
    logits = logits.astype(jnp.float32)
    b, v = logits.shape
    if prev_tokens is not None:
        valid = prev_tokens >= 0
        safe = jnp.where(valid, prev_tokens, 0)
        onehot = jax.nn.one_hot(safe, v, dtype=jnp.bool_) & valid[..., None]
        seen = jnp.any(onehot, axis=1)
        pen = rep_pens[:, None]
        penalized = jnp.where(logits > 0, logits / pen, logits * pen)
        logits = jnp.where(seen, penalized, logits)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    sorted_desc = jnp.sort(scaled, axis=-1)[..., ::-1]
    # per-row top-k: ranks >= k are cut (k=0 disables); masking to -inf
    # preserves descending order, so one sort serves top-p too
    ranks = jnp.arange(v)[None, :]
    k_cut = (top_ks[:, None] > 0) & (ranks >= top_ks[:, None])
    sorted_masked = jnp.where(k_cut, -jnp.inf, sorted_desc)
    kth = jnp.where(
        top_ks > 0,
        jnp.take_along_axis(
            sorted_desc, jnp.clip(top_ks - 1, 0, v - 1)[:, None], axis=-1
        )[:, 0],
        -jnp.inf,
    )
    scaled = jnp.where(scaled < kth[:, None], -jnp.inf, scaled)
    # per-row top-p over the top-k-masked distribution
    probs = jax.nn.softmax(sorted_masked, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_mask = cum - probs >= top_ps[:, None]
    cutoff_logit = jnp.min(
        jnp.where(cutoff_mask, jnp.inf, sorted_masked), axis=-1, keepdims=True
    )
    scaled = jnp.where(scaled < cutoff_logit, -jnp.inf, scaled)
    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temps == 0.0, greedy, sampled)


def sample_tokens(
    key: jax.Array,
    logits: jnp.ndarray,  # [B, V]
    params: SamplingParams,
    prev_tokens: jnp.ndarray | None = None,  # [B, W]
) -> jnp.ndarray:
    """Sample next tokens [B] (greedy if temperature == 0)."""
    logits = logits.astype(jnp.float32)
    if params.repetition_penalty != 1.0 and prev_tokens is not None:
        logits = apply_repetition_penalty(logits, prev_tokens, params.repetition_penalty)
    if params.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / params.temperature
    if params.top_k > 0:
        logits = _top_k_mask(logits, params.top_k)
    if params.top_p < 1.0:
        logits = _top_p_mask(logits, params.top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
