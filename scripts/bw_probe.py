"""Practical HBM read-bandwidth probe for the attention roofline.

Measures, on the real chip, the sustained GB/s of:
  1. xla-sum-bf16:   f32 sum over cache-sized bf16 planes (pure XLA stream)
  2. xla-sum-int8:   same planes as int8 (the int8-KV streaming question)
  3. pallas-stream:  a minimal Pallas kernel reading the SAME block pattern
                     as ops/decode_attention.flash_decode_stacked (one
                     (hg, T, D) plane group per grid cell) but doing almost
                     no compute — isolates the DMA pipeline from the math
  4. xla-attn:       the two-piece cached_attention over L layers
  5. flash2-attn:    flash_decode_stacked over L layers

Probe-design rules learned the hard way (round 4):
  - Each timed dispatch must cover MULTIPLE GB: the relay adds ~1 ms of
    per-dispatch overhead, which at 1 GB/dispatch reads as a fake ~40%
    bandwidth loss. L=16 layers -> 4.3 GB of planes per dispatch.
  - K and V live in SEPARATE CONTIGUOUS arrays. A strided slice like
    kv[:, 0] feeding a pallas call materializes an HBM->HBM copy of the
    whole operand every dispatch (the scan-slice-copy finding, NOTES r3)
    and poisons the measurement.
  - Every timed call CHAINS an accumulator through the loop (relay
    protocol: un-chained identical dispatches time impossibly fast).

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

B, HKV, T, D = 8, 32, 2048, 128
L = int(os.environ.get("BWPROBE_L", 16))  # layers' worth of planes per pass


def timed_chain(fn, args, iters=6):
    """fn(*args, c) -> c' ; times `iters` chained dispatches, syncs once."""
    c = jnp.zeros((), jnp.float32)
    c = fn(*args, c)
    jax.block_until_ready(c)
    for _ in range(2):
        c = fn(*args, c)
    jax.block_until_ready(c)
    t0 = time.time()
    for _ in range(iters):
        c = fn(*args, c)
    cv = float(c)  # sync the whole chain
    dt = (time.time() - t0) / iters
    return dt, cv


def main():
    rng = np.random.default_rng(0)
    plane_bytes = 2 * L * B * HKV * T * D * 2  # K+V, bf16
    print(f"plane set: {L} layers x {plane_bytes/L/1e9:.2f} GB "
          f"= {plane_bytes/1e9:.2f} GB/dispatch", file=sys.stderr)

    # generate ON DEVICE — a multi-GB host->device upload stalls for minutes
    # on the relay (same lesson as bench.py's jitted param build). K and V
    # are separate contiguous arrays (see module docstring).
    mk = jax.jit(
        lambda k: jax.random.normal(k, (L, B, HKV, T, D), jnp.bfloat16)
    )
    ck = mk(jax.random.key(0))
    cv_ = mk(jax.random.key(1))
    jax.block_until_ready((ck, cv_))
    print("kv planes materialized on device", file=sys.stderr)

    @jax.jit
    def sum_bf16(k, v, c):
        # scale the input by a c-dependent factor: every dispatch depends on
        # the previous result, so nothing can be memoized or elided
        return (jnp.sum(k.astype(jnp.float32)) + jnp.sum(v.astype(jnp.float32))) * 1e-9 + c * 1e-6

    dt, cvv = timed_chain(sum_bf16, (ck, cv_))
    print(f"xla-sum-bf16:  {plane_bytes/dt/1e9:7.1f} GB/s  ({dt*1e3:.2f} ms)  [{cvv:.4f}]")

    to8 = jax.jit(lambda x: (x.astype(jnp.float32) * 10).astype(jnp.int8))
    ck8, cv8 = to8(ck), to8(cv_)
    jax.block_until_ready((ck8, cv8))

    dt, cvv = timed_chain(jax.jit(
        lambda k, v, c: (jnp.sum(k.astype(jnp.float32)) + jnp.sum(v.astype(jnp.float32))) * 1e-9 + c * 1e-6
    ), (ck8, cv8))
    print(f"xla-sum-int8:  {plane_bytes/2/dt/1e9:7.1f} GB/s  ({dt*1e3:.2f} ms)  [{cvv:.4f}]")

    # --- pallas minimal-compute stream over flash2's block pattern ---------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hg = 4

    def stream_kernel(x_ref, y_ref, c_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = c_ref[...] * 1e-6

        o_ref[...] += (
            jnp.sum(x_ref[:, 0, :].astype(jnp.float32))
            + jnp.sum(y_ref[:, 0, :].astype(jnp.float32))
        ) * 1e-9

    n_planes = L * B * HKV
    grid = (n_planes // hg,)

    def pallas_stream_builder():
        @jax.jit
        def run(k, v, c):
            fk = k.reshape(n_planes, T, D)
            fv = v.reshape(n_planes, T, D)
            out = pl.pallas_call(
                stream_kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((hg, T, D), lambda i: (i, 0, 0)),
                    pl.BlockSpec((hg, T, D), lambda i: (i, 0, 0)),
                    pl.BlockSpec((8, 128), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                ),
            )(fk, fv, jnp.broadcast_to(c, (8, 128)).astype(jnp.float32))
            return out[0, 0]

        return run

    dt, cvv = timed_chain(pallas_stream_builder(), (ck, cv_))
    print(f"pallas-stream: {plane_bytes/dt/1e9:7.1f} GB/s  ({dt*1e3:.2f} ms)  [{cvv:.4f}]")

    dt, cvv = timed_chain(pallas_stream_builder(), (ck8, cv8))
    print(f"pallas-int8:   {plane_bytes/2/dt/1e9:7.1f} GB/s  ({dt*1e3:.2f} ms)  [{cvv:.4f}]")

    # --- L-layer attention, both paths --------------------------------------
    from bitdistiller_tpu.models.layers import cached_attention
    from bitdistiller_tpu.ops.decode_attention import flash_decode_stacked

    q = jnp.asarray(rng.normal(size=(B, 1, HKV, D)), np.float32).astype(jnp.bfloat16)
    kn = jnp.asarray(rng.normal(size=(B, 1, HKV, D)), np.float32).astype(jnp.bfloat16)
    vn = kn + 1
    start = jnp.full((B,), T - 8, jnp.int32)
    t_idx = jnp.arange(T)[None]
    mask = jnp.concatenate(
        [t_idx < start[:, None], jnp.ones((B, 1), bool)], -1
    )[:, None, None, :]

    @jax.jit
    def xla_attn(k, v, c):
        qd = q * (1 + c * 1e-12).astype(q.dtype)

        def body(acc, layer_kv):
            k1, v1 = layer_kv
            o = cached_attention(qd, k1, v1, kn, vn, mask)
            return acc + jnp.sum(o.astype(jnp.float32)) * 1e-9, None

        out, _ = jax.lax.scan(body, c * 1e-6, (k, v))
        return out

    dt, cv2 = timed_chain(xla_attn, (ck, cv_))
    print(f"xla-attn:      {plane_bytes/dt/1e9:7.1f} GB/s  ({dt*1e3:.2f} ms)  [{cv2:.4f}]")

    @jax.jit
    def f2_attn(k, v, c):
        qd = q * (1 + c * 1e-12).astype(q.dtype)

        def body(acc, li):
            o = flash_decode_stacked(qd, k, v, li, kn, vn, start)
            return acc + jnp.sum(o.astype(jnp.float32)) * 1e-9, None

        out, _ = jax.lax.scan(
            body, c * 1e-6, jnp.arange(L, dtype=jnp.int32)
        )
        return out

    dt, cv2 = timed_chain(f2_attn, (ck, cv_))
    print(f"flash2-attn:   {plane_bytes/dt/1e9:7.1f} GB/s  ({dt*1e3:.2f} ms)  [{cv2:.4f}]")


if __name__ == "__main__":
    main()
