"""Headline benchmark: int2-g128 packed 7B decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}

vs_baseline = measured tokens/s divided by the HBM-bandwidth roofline for the
same step (all packed weights + scales + lm_head + KV cache read once per
step) at the chip's published ~819 GB/s (v5e) — i.e. fraction of
speed-of-light. The reference publishes no machine-readable decode numbers
(BASELINE.md), so roofline fraction is the honest yardstick.
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bitdistiller_tpu.models import KVCache, ModelConfig, llama
from bitdistiller_tpu.models.quantized import random_packed_params

V5E_HBM_BYTES_PER_S = 819e9


def model_bytes_per_step(cfg: ModelConfig, bits: int, batch: int, cache_len: int) -> float:
    d, dh = cfg.hidden_size, cfg.actual_head_dim
    per_layer_weights = (
        d * cfg.num_heads * dh
        + 2 * d * cfg.num_kv_heads * dh
        + cfg.num_heads * dh * d
        + 3 * d * cfg.intermediate_size
    )
    n_weights = per_layer_weights * cfg.num_layers
    qw_bytes = n_weights * bits / 8
    scale_bytes = n_weights / 128 * 8  # f32 scales + szeros
    lm_head = d * cfg.vocab_size * 2
    kv = cfg.num_layers * batch * cache_len * cfg.num_kv_heads * dh * 2 * 2
    return qw_bytes + scale_bytes + lm_head + kv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cache-len", type=int, default=256)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--bits", type=int, default=2)
    ap.add_argument("--mode", choices=["decode", "prefill"], default="decode")
    ap.add_argument("--prefill-len", type=int, default=512)
    args = ap.parse_args()

    cfg = ModelConfig(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_layers=args.layers,
        num_heads=32,
        num_kv_heads=32,
        max_position_embeddings=4096,
    )
    print(f"building int{args.bits}-g128 packed model ({args.layers} layers)...", file=sys.stderr)
    params = random_packed_params(cfg, jax.random.key(0), bits=args.bits, group_size=128)
    cache = KVCache.init(cfg, batch=args.batch, max_len=args.cache_len, dtype=jnp.bfloat16)

    # NB: no donation — on the axon relay a donated-buffer reuse error is
    # raised asynchronously and block_until_ready() returns on the errored
    # buffers, silently timing failed dispatches (observed: impossible
    # 0.07ms/step). The read-only-cache forward only writes the new token
    # rows anyway.
    @jax.jit
    def prefill(params, cache, tokens):
        logits, cache = llama.forward(params, cfg, tokens, cache=cache, cache_pos=0)
        return logits[:, -1].argmax(-1).astype(jnp.int32), cache

    @jax.jit
    def decode_step(params, cache, tokens, pos, acc):
        logits, cache = llama.forward(
            params, cfg, tokens[:, None], cache=cache, cache_pos=pos
        )
        tok = logits[:, -1].argmax(-1).astype(jnp.int32)
        # running checksum ties every step's logits into the final fetched
        # value — a correct fetch proves all timed dispatches really executed
        # (async dispatch errors otherwise time as impossibly fast)
        acc = acc * 1.000001 + logits[0, -1, pos % cfg.vocab_size].astype(jnp.float32)
        return tok, cache, acc

    rng = np.random.default_rng(0)

    if args.mode == "prefill":
        # prefill throughput + TTFT: full causal forward over the prompt
        s = args.prefill_len
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (args.batch, s)), jnp.int32)

        @jax.jit
        def prefill_only(params, tokens, acc):
            logits, _ = llama.forward(params, cfg, tokens)
            return acc * 1.000001 + logits[0, -1, 0].astype(jnp.float32)

        acc = jnp.zeros((), jnp.float32)
        acc = prefill_only(params, toks, acc)
        float(acc)  # compile + relay warmup
        n_iter = max(args.steps // 10, 3)
        t0 = time.time()
        for _ in range(n_iter):
            acc = prefill_only(params, toks, acc)
        float(acc)
        dt = (time.time() - t0) / n_iter
        tput = args.batch * s / dt
        print(
            f"prefill: {dt*1e3:.1f} ms for [{args.batch}, {s}] -> {tput:.0f} tok/s "
            f"(TTFT ~ {dt*1e3/args.batch:.1f} ms/seq)",
            file=sys.stderr,
        )
        print(json.dumps({
            "metric": f"int{args.bits}-g128 packed 7B prefill, batch {args.batch} x {s}, 1 chip",
            "value": round(tput, 1),
            "unit": "tokens/s",
            "vs_baseline": round(dt * 1e3, 2),
        }))
        return

    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (args.batch, 64)), jnp.int32)
    print("prefill + compile...", file=sys.stderr)
    t0 = time.time()
    tok, cache = prefill(params, cache, prompt)
    tok.block_until_ready()
    print(f"prefill done in {time.time()-t0:.1f}s", file=sys.stderr)

    pos = jnp.asarray(64, jnp.int32)  # traced, or every step recompiles
    acc = jnp.zeros((), jnp.float32)
    t0 = time.time()
    tok, cache, acc = decode_step(params, cache, tok, pos, acc)
    tok.block_until_ready()
    print(f"decode compile in {time.time()-t0:.1f}s", file=sys.stderr)
    pos = pos + 1

    # warm + force a real value fetch (also pays the relay's first-transfer
    # warmup outside the timed region)
    for _ in range(3):
        tok, cache, acc = decode_step(params, cache, tok, pos, acc)
        pos = pos + 1
    print(f"warmup token sample: {np.asarray(tok)[:4]}", file=sys.stderr)

    t0 = time.time()
    for _ in range(args.steps):
        tok, cache, acc = decode_step(params, cache, tok, pos, acc)
        pos = pos + 1
    checksum = float(acc)  # forces completion of the whole step chain
    dt = (time.time() - t0) / args.steps
    print(f"checksum {checksum:.4f}", file=sys.stderr)
    tokens_per_s = args.batch / dt

    roofline_steps = V5E_HBM_BYTES_PER_S / model_bytes_per_step(
        cfg, args.bits, args.batch, args.cache_len
    )
    vs = tokens_per_s / (roofline_steps * args.batch)
    print(
        f"decode: {dt*1e3:.2f} ms/step, {tokens_per_s:.1f} tok/s (batch {args.batch}), "
        f"roofline {roofline_steps*args.batch:.1f} tok/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"int{args.bits}-g128 packed 7B decode, batch {args.batch}, 1 chip",
                "value": round(tokens_per_s, 1),
                "unit": "tokens/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
