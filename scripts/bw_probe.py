"""Practical HBM read-bandwidth probe for the attention roofline.

Measures, on the real chip, the sustained GB/s of:
  1. xla-sum-bf16:   f32 sum over a cache-sized bf16 array (pure XLA stream)
  2. xla-sum-int8:   same bytes as int8 (the int8-KV streaming question)
  3. pallas-stream:  a minimal Pallas kernel reading the SAME block pattern
                     as ops/decode_attention.flash_decode_stacked (one
                     (hg, T, D) plane group per grid cell) but doing almost
                     no compute — isolates the DMA pipeline from the math
  4. xla-attn:       the two-piece cached_attention over L layers
  5. flash2-attn:    flash_decode_stacked over L layers

Every timed call CHAINS an accumulator through the loop (relay protocol:
un-chained identical dispatches time impossibly fast — see bench.py's
running checksum and the round-2 notes).

The point: the published 819 GB/s (v5e) is a spec number. If (1) and (3)
plateau near the ~633-650 GB/s the attention paths measure, the headline's
0.72x roofline is already at the chip's practical speed of light.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, HKV, T, D, L = 8, 32, 2048, 128, 4  # L layers' worth of planes per pass


def timed_chain(fn, x, iters=20):
    """fn(x, c) -> c' ; times `iters` chained dispatches, syncs once."""
    c = jnp.zeros((), jnp.float32)
    c = fn(x, c)
    jax.block_until_ready(c)
    for _ in range(2):
        c = fn(x, c)
    jax.block_until_ready(c)
    t0 = time.time()
    for _ in range(iters):
        c = fn(x, c)
    cv = float(c)  # sync the whole chain
    dt = (time.time() - t0) / iters
    return dt, cv


def main():
    rng = np.random.default_rng(0)
    print(f"plane set: {L} layers x {2*B*HKV*T*D*2/1e9:.2f} GB", file=sys.stderr)

    # generate ON DEVICE — a ~1 GB host->device upload stalls for minutes
    # on the relay (same lesson as bench.py's jitted param build)
    kv_bf16 = jax.jit(
        lambda k: jax.random.normal(
            k, (L, 2 * B * HKV, T, D), jnp.bfloat16
        )
    )(jax.random.key(0))
    jax.block_until_ready(kv_bf16)
    print("kv planes materialized on device", file=sys.stderr)
    total_bytes = kv_bf16.size * 2

    @jax.jit
    def sum_bf16(x, c):
        # scale the input by a c-dependent factor: every dispatch depends on
        # the previous result, so nothing can be memoized or elided
        return jnp.sum(x.astype(jnp.float32)) * 1e-9 + c * 1e-6

    dt, cv = timed_chain(sum_bf16, kv_bf16)
    print(f"xla-sum-bf16:  {total_bytes/dt/1e9:7.1f} GB/s  ({dt*1e3:.2f} ms)  [{cv:.4f}]")

    kv_int8 = jax.jit(
        lambda x: (x.astype(jnp.float32) * 10).astype(jnp.int8)
    )(kv_bf16)
    jax.block_until_ready(kv_int8)

    @jax.jit
    def sum_int8(x, c):
        return jnp.sum(x.astype(jnp.float32)) * 1e-9 + c * 1e-6

    dt, cv = timed_chain(sum_int8, kv_int8)
    print(f"xla-sum-int8:  {kv_int8.size/dt/1e9:7.1f} GB/s  ({dt*1e3:.2f} ms)  [{cv:.4f}]")

    # --- pallas minimal-compute stream over flash2's block pattern ---------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hg = 4

    def stream_kernel(x_ref, c_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = c_ref[...] * 1e-6

        o_ref[...] += jnp.sum(x_ref[:, 0, :].astype(jnp.float32)) * 1e-9

    n_planes = L * 2 * B * HKV
    grid = (n_planes // hg,)

    def pallas_stream_builder(x_dtype):
        @jax.jit
        def run(x, c):
            flat = x.reshape(n_planes, T, D)
            out = pl.pallas_call(
                stream_kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((hg, T, D), lambda i: (i, 0, 0)),
                    pl.BlockSpec((8, 128), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                ),
            )(flat, jnp.broadcast_to(c, (8, 128)).astype(jnp.float32))
            return out[0, 0]

        return run

    dt, cv = timed_chain(pallas_stream_builder(jnp.bfloat16), kv_bf16)
    print(f"pallas-stream: {total_bytes/dt/1e9:7.1f} GB/s  ({dt*1e3:.2f} ms)  [{cv:.4f}]")

    dt, cv = timed_chain(pallas_stream_builder(jnp.int8), kv_int8)
    print(f"pallas-int8:   {kv_int8.size/dt/1e9:7.1f} GB/s  ({dt*1e3:.2f} ms)  [{cv:.4f}]")

    # --- L-layer attention, both paths --------------------------------------
    from bitdistiller_tpu.models.layers import cached_attention
    from bitdistiller_tpu.ops.decode_attention import flash_decode_stacked

    ck = kv_bf16.reshape(L, 2, B, HKV, T, D)[:, 0]
    cv_ = kv_bf16.reshape(L, 2, B, HKV, T, D)[:, 1]
    q = jnp.asarray(rng.normal(size=(B, 1, HKV, D)), np.float32).astype(jnp.bfloat16)
    kn = jnp.asarray(rng.normal(size=(B, 1, HKV, D)), np.float32).astype(jnp.bfloat16)
    vn = kn + 1
    start = jnp.full((B,), T - 8, jnp.int32)
    t_idx = jnp.arange(T)[None]
    mask = jnp.concatenate(
        [t_idx < start[:, None], jnp.ones((B, 1), bool)], -1
    )[:, None, None, :]

    @jax.jit
    def xla_attn(kv, c):
        qd = q * (1 + c * 1e-12).astype(q.dtype)
        ck1 = kv.reshape(L, 2, B, HKV, T, D)[:, 0]
        cv1 = kv.reshape(L, 2, B, HKV, T, D)[:, 1]

        def body(acc, layer_kv):
            k1, v1 = layer_kv
            o = cached_attention(qd, k1, v1, kn, vn, mask)
            return acc + jnp.sum(o.astype(jnp.float32)) * 1e-9, None

        out, _ = jax.lax.scan(body, c * 1e-6, (ck1, cv1))
        return out

    dt, cv2 = timed_chain(xla_attn, kv_bf16)
    print(f"xla-attn:      {total_bytes/dt/1e9:7.1f} GB/s  ({dt*1e3:.2f} ms)  [{cv2:.4f}]")

    @jax.jit
    def f2_attn(kv, c):
        qd = q * (1 + c * 1e-12).astype(q.dtype)
        ck1 = kv.reshape(L, 2, B, HKV, T, D)[:, 0]
        cv1 = kv.reshape(L, 2, B, HKV, T, D)[:, 1]

        def body(acc, li):
            o = flash_decode_stacked(qd, ck1, cv1, li, kn, vn, start)
            return acc + jnp.sum(o.astype(jnp.float32)) * 1e-9, None

        out, _ = jax.lax.scan(
            body, c * 1e-6, jnp.arange(L, dtype=jnp.int32)
        )
        return out

    dt, cv2 = timed_chain(f2_attn, kv_bf16)
    print(f"flash2-attn:   {total_bytes/dt/1e9:7.1f} GB/s  ({dt*1e3:.2f} ms)  [{cv2:.4f}]")


if __name__ == "__main__":
    main()
