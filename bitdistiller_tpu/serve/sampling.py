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
