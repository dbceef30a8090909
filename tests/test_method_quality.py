"""End-to-end method validation: CAKLD KD-QAT must IMPROVE the quantized
student's agreement with the teacher — the core BitDistiller claim — on a
tiny model with learnable structure.

Setup: a 'teacher' with real sequential structure (trained briefly on a
deterministic token pattern), int2 fake-quant destroys some of it, KD-QAT
recovers it. Metrics: teacher-data PPL of the fake-quant student before vs
after QAT."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.eval.ppl import perplexity
from bitdistiller_tpu.models import ModelConfig, forward, init_params
from bitdistiller_tpu.train import TrainConfig, init_train_state, make_train_step

CFG = ModelConfig(
    vocab_size=32, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=4, num_kv_heads=2, max_position_embeddings=64, dtype="float32",
)


def pattern_batch(rng, batch, seqlen):
    """Deterministic structure: x_{t+1} = (x_t + step) % V with per-seq step."""
    starts = rng.integers(0, 32, batch)
    steps = rng.integers(1, 5, batch)
    seq = (starts[:, None] + steps[:, None] * np.arange(seqlen)) % 32
    return seq.astype(np.int32)


@pytest.mark.slow
def test_cakld_qat_improves_quantized_student():
    rng = np.random.default_rng(0)

    # 1) train a dense teacher to learn the pattern
    teacher = init_params(CFG, jax.random.key(0), dtype=jnp.float32)
    tc_dense = TrainConfig(quant_type=None, train_kd=False, learning_rate=3e-3,
                           total_steps=300, gradient_checkpointing=False,
                           max_grad_norm=1.0)
    step_dense = jax.jit(make_train_step(CFG, tc_dense, teacher_params=None))
    state = init_train_state(teacher, tc_dense)
    for i in range(150):
        toks = pattern_batch(rng, 8, 32)
        batch = {"input_ids": toks, "labels": toks,
                 "attention_mask": np.ones_like(toks)}
        state, m = step_dense(state, batch, jnp.asarray(0.0))
    teacher = state.params
    eval_blocks = pattern_batch(np.random.default_rng(99), 16, 32)
    teacher_ppl = perplexity(teacher, CFG, eval_blocks, batch_size=8)
    assert teacher_ppl < 3.0, f"teacher failed to learn pattern: ppl={teacher_ppl}"

    # 2) int2 fake-quant destroys quality. PTQ-rounding quantizer grouped
    # along K of the [K, N] weights — the same grid QAT trains against and
    # the CLI eval path uses (llama.forward applies it to [K, N] directly)
    from bitdistiller_tpu.quant.core import fake_quant_int_kaxis

    quantizer = lambda w: fake_quant_int_kaxis(w, 2, 32, ste=False)
    ptq_ppl = perplexity(teacher, CFG, eval_blocks, quantizer=quantizer, batch_size=8)
    assert ptq_ppl > teacher_ppl * 1.05, (teacher_ppl, ptq_ppl)

    # 3) CAKLD KD-QAT on teacher-distribution data recovers quality
    tc_kd = TrainConfig(quant_type="int2-asym", q_group_size=32, train_kd=True,
                        kd_loss_type="cakld", learning_rate=1e-3,
                        total_steps=200, gradient_checkpointing=False)
    step_kd = jax.jit(make_train_step(CFG, tc_kd, teacher_params=teacher))
    state = init_train_state(teacher, tc_kd)
    beta = jnp.asarray(0.7)
    for i in range(120):
        toks = pattern_batch(rng, 8, 32)
        batch = {"input_ids": toks, "labels": toks,
                 "attention_mask": np.ones_like(toks)}
        state, m = step_kd(state, batch, beta)
    qat_ppl = perplexity(state.params, CFG, eval_blocks, quantizer=quantizer, batch_size=8)

    # the BitDistiller claim, in miniature: QAT recovers a chunk of the gap
    assert qat_ppl < ptq_ppl, (teacher_ppl, ptq_ppl, qat_ppl)
    recovered = (ptq_ppl - qat_ppl) / (ptq_ppl - teacher_ppl + 1e-9)
    print(f"teacher {teacher_ppl:.3f} ptq {ptq_ppl:.3f} qat {qat_ppl:.3f} "
          f"(recovered {recovered:.1%})")
    assert recovered > 0.3, recovered
