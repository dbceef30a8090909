"""7B-shape HBM budget: the ZeRO staging must be what makes the CAKLD KD
recipe fit TPU hosts (reference needs DeepSpeed zero3 + CPU offload for the
same model on 8 GPUs, train/config/zero3.json)."""

import jax

from bitdistiller_tpu.train import TrainConfig
from bitdistiller_tpu.train.memory import (
    GiB,
    LLAMA2_7B,
    kd_train_memory_estimate,
    param_count,
)

V5E_HBM = 16 * GiB


def test_7b_param_count():
    # LLaMA-2-7B is 6.74B params; the estimator must count the real shapes
    n = param_count(LLAMA2_7B)
    assert 6.5e9 < n < 7.0e9, n


def test_7b_kd_does_not_fit_without_zero():
    tc = TrainConfig(quant_type="int2-asym")
    est = kd_train_memory_estimate(LLAMA2_7B, tc, dp=8, tp=1, zero_stage=0)
    assert est["total"] > 4 * V5E_HBM  # not even close


def test_7b_kd_fits_one_v5e_host_with_zero3():
    """Stage 3 (fsdp params + sharded opt state) at micro-batch 1 fits the
    8x16GB single-host budget — without the reference's CPU offload."""
    tc = TrainConfig(quant_type="int2-asym")
    est = kd_train_memory_estimate(
        LLAMA2_7B, tc, dp=8, tp=1, zero_stage=3, batch=1, seq=1024
    )
    assert est["state_total"] < 13 * GiB, est
    assert est["total"] < V5E_HBM, est


def test_7b_kd_two_hosts_comfortable():
    tc = TrainConfig(quant_type="int2-asym")
    est = kd_train_memory_estimate(
        LLAMA2_7B, tc, dp=16, tp=1, zero_stage=3, batch=2, seq=1024
    )
    assert est["total"] < 0.7 * V5E_HBM, est


def test_master_weights_toggle_reduces_state():
    tc16 = TrainConfig(quant_type="int2-asym", param_dtype="bfloat16")
    tc32 = TrainConfig(quant_type="int2-asym", param_dtype="float32")
    e16 = kd_train_memory_estimate(LLAMA2_7B, tc16, dp=8, zero_stage=2)
    e32 = kd_train_memory_estimate(LLAMA2_7B, tc32, dp=8, zero_stage=2)
    # bf16 latents: smaller replicated latent + grads, master rides sharded
    assert e16["latent"] == e32["latent"] / 2
    assert e16["opt_state"] > e32["opt_state"]  # + f32 master, but /dp
    assert e16["total"] < e32["total"]


def test_dp_train_scaling_projection():
    """Train twin of tp_decode_scaling: dp gradient all-reduce modeled
    against the MFU-derived 7B single-chip step (3.1 s from the measured
    0.45 MFU at the reference recipe). BASELINE >=85% at 2+ hosts."""
    from bitdistiller_tpu.train.memory import LLAMA2_7B, dp_train_scaling
    from bitdistiller_tpu.train.trainer import TrainConfig

    tc = TrainConfig()
    effs = []
    for dp in (1, 2, 8, 16, 32):
        out = dp_train_scaling(LLAMA2_7B, tc, t_step_s=3.1, dp=dp)
        effs.append(out["efficiency"])
    assert effs[0] == 1.0
    assert all(a >= b for a, b in zip(effs, effs[1:]))
    assert effs[-1] >= 0.85  # 32 chips = 4 hosts
    out16 = dp_train_scaling(LLAMA2_7B, tc, t_step_s=3.1, dp=16)
    assert out16["hosts"] == 2
    assert out16["efficiency"] >= 0.85
    # zero overlap is the pessimistic bound; must still be ordered
    pess = dp_train_scaling(LLAMA2_7B, tc, t_step_s=3.1, dp=16, overlap=0.0)
    assert pess["efficiency"] < out16["efficiency"]
