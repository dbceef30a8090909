"""Serving capacity estimator: exact KV arithmetic, modeled packed weights,
and the 7B slot counts that motivated the int8-KV batch-16 configuration."""

import jax
import jax.numpy as jnp
import numpy as np

from bitdistiller_tpu.models import TINY_TEST, init_params
from bitdistiller_tpu.models.llama import KVCache
from bitdistiller_tpu.models.quantized import pack_model
from bitdistiller_tpu.serve.capacity import (
    GiB,
    kv_bytes_per_slot,
    packed_model_bytes,
    serve_capacity,
)
from bitdistiller_tpu.train.memory import LLAMA2_7B


def test_kv_bytes_exact():
    cfg = TINY_TEST
    for dt in (jnp.bfloat16, jnp.int8, jnp.float32):
        cache = KVCache.init(cfg, 3, 64, dtype=dt)
        actual = sum(
            np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(cache)
        ) // 3
        assert kv_bytes_per_slot(cfg, 64, dt) == actual, dt


def test_packed_weights_close():
    cfg = TINY_TEST
    est = packed_model_bytes(cfg, bits=4, group_size=64)
    params = init_params(cfg, jax.random.key(0))
    packed = pack_model(params, cfg, bits=4, group_size=64, fuse=False)
    actual = sum(
        np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(packed)
    )
    # tiny shapes exaggerate padding; 7B-scale shapes converge much closer
    assert 0.8 <= est / actual <= 1.2


def test_7b_slot_counts_match_measured_reality():
    """Measured on hardware (NOTES) with flat full-size caches
    (grow_cache=False): bf16 KV cannot fit batch 16 at 2048 on 16 GB;
    int8 KV can. The estimator must reproduce that ordering."""
    bf16 = serve_capacity(LLAMA2_7B, max_len=2048, hbm_bytes=16 * GiB,
                          grow_cache=False)
    i8 = serve_capacity(LLAMA2_7B, max_len=2048, kv_dtype=jnp.int8,
                        hbm_bytes=16 * GiB, grow_cache=False)
    assert bf16["max_slots"] >= 8  # the benched bf16 batch-8 config fits
    assert bf16["max_slots"] < 16  # bf16 batch 16 measured OOM
    assert i8["max_slots"] >= 16  # int8 batch 16 measured fitting
    # tp divides both weights and KV
    tp2 = serve_capacity(LLAMA2_7B, max_len=2048, tp=2, hbm_bytes=16 * GiB,
                         grow_cache=False)
    assert tp2["weights_bytes"] == bf16["weights_bytes"] // 2
    assert tp2["max_slots"] > bf16["max_slots"]
    # a growing cache peaks at old+new during the copy -> fewer planned slots
    grown = serve_capacity(LLAMA2_7B, max_len=2048, hbm_bytes=16 * GiB)
    assert grown["max_slots"] < bf16["max_slots"]


def test_tp_decode_scaling_projection():
    """Scaling model vs the measured single-chip step (20.3 ms, batch 8,
    cache 2048): TP efficiency must clear BASELINE.md's 85% bar through
    tp=8 and degrade monotonically with tp (comm does not shrink)."""
    from bitdistiller_tpu.serve.capacity import tp_decode_scaling

    t1 = 20.3e-3
    effs = []
    for tp in (1, 2, 4, 8):
        out = tp_decode_scaling(LLAMA2_7B, t_step_s=t1, batch=8, tp=tp)
        effs.append(out["efficiency"])
        assert out["t_step_s"] <= t1
    assert effs[0] == 1.0
    assert all(a >= b for a, b in zip(effs, effs[1:]))
    assert effs[-1] >= 0.85  # the BASELINE multi-chip serving target
    # comm model sanity: per-step collective time is microseconds-scale,
    # far under the compute share it rides alongside
    out8 = tp_decode_scaling(LLAMA2_7B, t_step_s=t1, batch=8, tp=8)
    assert out8["t_comm_s"] < 1e-3
