"""WikiText-2-style perplexity evaluation.

Reference parity (test/general/wiki_ppl.py:46-137): concatenated test text is
split into non-overlapping seqlen-2048 blocks; per block, shift-NLL of
logits[:-1] vs tokens[1:] averaged with CrossEntropyLoss then scaled by
seqlen; ppl = exp(sum(nll) / (nsamples * seqlen)).

TPU-first: one jitted forward per block (batched if memory allows) instead of
the reference's layer-by-layer CPU<->GPU staging; the whole eval is a scan of
jit(forward) over blocks.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.config import ModelConfig


def prepare_blocks(token_ids: np.ndarray, seqlen: int = 2048) -> np.ndarray:
    """Flat token array -> [nsamples, seqlen] non-overlapping blocks."""
    flat = np.asarray(token_ids).reshape(-1)
    nsamples = len(flat) // seqlen
    return flat[: nsamples * seqlen].reshape(nsamples, seqlen).astype(np.int32)


def make_nll_fn(cfg: ModelConfig, quantizer=None) -> Callable:
    """Jitted fn(params, tokens [B, S]) -> summed shift-NLL per block [B]."""

    def nll(params, tokens):
        logits, _ = llama.forward(params, cfg, tokens, quantizer=quantizer)
        logits = logits.astype(jnp.float32)
        shift_logits = logits[:, :-1]
        shift_labels = tokens[:, 1:]
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        tok_nll = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
        # reference: mean CE over (seqlen-1) tokens, then * seqlen (wiki_ppl.py:129-130)
        return tok_nll.mean(axis=-1) * tokens.shape[1]

    return jax.jit(nll)


def perplexity(
    params,
    cfg: ModelConfig,
    blocks: np.ndarray,  # [nsamples, seqlen]
    *,
    quantizer=None,
    batch_size: int = 1,
    progress: Optional[Callable[[int, int], None]] = None,
) -> float:
    nll_fn = make_nll_fn(cfg, quantizer)
    nsamples, seqlen = blocks.shape
    total = 0.0
    done = 0
    for i in range(0, nsamples - nsamples % batch_size, batch_size):
        batch = jnp.asarray(blocks[i : i + batch_size])
        total += float(nll_fn(params, batch).sum())
        done += batch_size
        if progress:
            progress(done, nsamples)
    rem = nsamples % batch_size
    if rem:
        batch = jnp.asarray(blocks[nsamples - rem :])
        total += float(nll_fn(params, batch).sum())
        done += rem
        if progress:
            progress(done, nsamples)
    return math.exp(total / (done * seqlen))


def load_wikitext2_test(tokenizer, split: str = "test") -> np.ndarray:
    """Tokenize the wikitext-2-raw corpus joined with \\n\\n (wiki_ppl.py:28-29).

    Requires network/HF cache; offline callers should pass pre-tokenized
    blocks to `perplexity` directly.
    """
    from ..data.offline import load_dataset

    data = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
    text = "\n\n".join(data["text"])
    return np.asarray(tokenizer(text).input_ids, dtype=np.int32)
