"""Knowledge-distillation losses for QAT self-distillation.

Parity targets (train/mytrainer.py): cakld :94-134, jsd :136-152,
forward/ce :154-164, reverse :166-176, tlsd :178-195, mse :197-198.
All losses mask padding via labels != -100 (IGNORE_INDEX), sum over the
sequence, mean over the batch — identical reduction to the reference.

Written as pure functions of (labels, student_logits, teacher_logits) so the
whole KD step jits into one XLA program; log-softmax and KL terms are f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def _mask(labels: jnp.ndarray) -> jnp.ndarray:
    return (labels != IGNORE_INDEX).astype(jnp.float32)


def _kl_div(log_p: jnp.ndarray, log_q: jnp.ndarray) -> jnp.ndarray:
    """KL(q || p) summed over vocab, matching F.kl_div(log_p, log_q,
    log_target=True).sum(-1) = sum exp(log_q) * (log_q - log_p)."""
    return jnp.sum(jnp.exp(log_q) * (log_q - log_p), axis=-1)


def cakld_loss(
    labels: jnp.ndarray,
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    beta: jnp.ndarray | float,
) -> jnp.ndarray:
    """Confidence-Aware KLD: beta * reverse-KL + (1-beta) * forward-KL.

    reverse_kl = KL(student || teacher) evaluated as
    F.kl_div(teacher_log_prob, student_log_prob) per the reference; beta is
    the teacher's mean max-token probability (estimated offline).
    """
    sl = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    tl = jax.nn.log_softmax(teacher_logits.astype(jnp.float32), axis=-1)
    reverse_kl = _kl_div(tl, sl)  # sum_v s * (log s - log t)
    forward_kl = _kl_div(sl, tl)  # sum_v t * (log t - log s)
    kl = beta * reverse_kl + (1.0 - beta) * forward_kl
    kl = kl * _mask(labels)
    return kl.sum(axis=-1).mean()


def jsd_loss(
    labels: jnp.ndarray,
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    beta: float = 0.5,
) -> jnp.ndarray:
    """Generalized JSD with mixture c = beta*t + (1-beta)*s (mytrainer.py:136-152)."""
    sp = jax.nn.softmax(student_logits.astype(jnp.float32), axis=-1)
    tp = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    cp = beta * tp + (1.0 - beta) * sp
    log_c = jnp.log(cp)
    # F.kl_div(c_log_prob, prob) (prob target) = sum p*(log p - log c)
    eps = 1e-10
    kl_f = beta * jnp.sum(tp * (jnp.log(tp + eps) - log_c), axis=-1)
    kl_r = (1.0 - beta) * jnp.sum(sp * (jnp.log(sp + eps) - log_c), axis=-1)
    kl = (kl_f + kl_r) * _mask(labels)
    return kl.sum(axis=-1).mean()


def forward_kl_loss(
    labels: jnp.ndarray,
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """KL(teacher || student) — the reference's 'forward'/ce_loss (:154-164)."""
    sl = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    tl = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / temperature, axis=-1)
    kl = _kl_div(sl, tl) * _mask(labels)
    return kl.sum(axis=-1).mean()


def reverse_kl_loss(
    labels: jnp.ndarray, student_logits: jnp.ndarray, teacher_logits: jnp.ndarray
) -> jnp.ndarray:
    """KL(student || teacher) — the reference's 'reverse'/re_loss (:166-176)."""
    sl = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    tl = jax.nn.log_softmax(teacher_logits.astype(jnp.float32), axis=-1)
    kl = _kl_div(tl, sl) * _mask(labels)
    return kl.sum(axis=-1).mean()


def tlsd_loss(
    labels: jnp.ndarray, student_logits: jnp.ndarray, teacher_logits: jnp.ndarray
) -> jnp.ndarray:
    """Token-scaled logit distillation (mytrainer.py:178-195): per-token CE of
    the teacher sets a softmax(ce/10) token weight for the distillation CE."""
    s = student_logits[:, :-1, :].astype(jnp.float32)
    t = teacher_logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    tl = jax.nn.log_softmax(t, axis=-1)
    tc_ce = -jnp.take_along_axis(tl, safe_labels[..., None], axis=-1)[..., 0]
    # reference CrossEntropyLoss(reduction='none') yields 0 at ignore_index
    tc_ce = jnp.where(valid, tc_ce, 0.0)
    token_scale = jax.lax.stop_gradient(jax.nn.softmax(tc_ce / 10.0, axis=-1))
    sl = jax.nn.log_softmax(s, axis=-1)
    tp = jax.nn.softmax(t, axis=-1)
    ce = -jnp.sum(tp * sl, axis=-1)
    return jnp.sum(ce * token_scale)


def mse_loss(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(
        (student_logits.astype(jnp.float32) - teacher_logits.astype(jnp.float32)) ** 2
    )


def kd_loss(
    loss_type: str,
    labels: jnp.ndarray,
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    *,
    beta: jnp.ndarray | float = 0.0,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Dispatch matching KDTrainer.compute_loss (mytrainer.py:222-234)."""
    if loss_type == "cakld":
        return cakld_loss(labels, student_logits, teacher_logits, beta)
    if loss_type == "jsd":
        return jsd_loss(labels, student_logits, teacher_logits, 0.5)
    if loss_type == "forward":
        return forward_kl_loss(labels, student_logits, teacher_logits, temperature)
    if loss_type == "reverse":
        return reverse_kl_loss(labels, student_logits, teacher_logits)
    if loss_type == "tlsd":
        return tlsd_loss(labels, student_logits, teacher_logits)
    if loss_type == "mse":
        return mse_loss(student_logits, teacher_logits)
    raise ValueError(f"unknown kd loss type {loss_type!r}")
