"""KD loss golden tests vs independent torch restatements of the reference
math (train/mytrainer.py:94-198)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from bitdistiller_tpu.train import (
    cakld_loss,
    forward_kl_loss,
    jsd_loss,
    kd_loss,
    mse_loss,
    reverse_kl_loss,
    tlsd_loss,
)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    B, S, V = 2, 6, 32
    student = rng.standard_normal((B, S, V)).astype(np.float32) * 2
    teacher = rng.standard_normal((B, S, V)).astype(np.float32) * 2
    labels = rng.integers(0, V, size=(B, S)).astype(np.int64)
    labels[0, -2:] = -100  # padding
    labels[1, -1] = -100
    return labels, student, teacher


def torch_cakld(labels, s, t, beta):
    mask = labels != -100
    tl = F.log_softmax(t, dim=2)
    sl = F.log_softmax(s, dim=2)
    reverse = F.kl_div(tl, sl, reduction="none", log_target=True).sum(-1)
    forward = F.kl_div(sl, tl, reduction="none", log_target=True).sum(-1)
    kl = beta * reverse + (1 - beta) * forward
    kl = kl * mask
    return kl.sum(-1).mean()


def test_cakld_matches_torch(batch):
    labels, s, t = batch
    beta = 0.73
    want = torch_cakld(
        torch.from_numpy(labels), torch.from_numpy(s), torch.from_numpy(t), beta
    ).item()
    got = float(cakld_loss(jnp.asarray(labels), jnp.asarray(s), jnp.asarray(t), beta))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_forward_reverse_match_torch(batch):
    labels, s, t = batch
    lt, st, tt = torch.from_numpy(labels), torch.from_numpy(s), torch.from_numpy(t)
    mask = lt != -100

    sl = F.log_softmax(st, dim=2)
    tl = F.log_softmax(tt, dim=2)
    want_fwd = (F.kl_div(sl, tl, reduction="none", log_target=True).sum(-1) * mask).sum(-1).mean().item()
    want_rev = (F.kl_div(tl, sl, reduction="none", log_target=True).sum(-1) * mask).sum(-1).mean().item()

    got_fwd = float(forward_kl_loss(jnp.asarray(labels), jnp.asarray(s), jnp.asarray(t)))
    got_rev = float(reverse_kl_loss(jnp.asarray(labels), jnp.asarray(s), jnp.asarray(t)))
    np.testing.assert_allclose(got_fwd, want_fwd, rtol=1e-5)
    np.testing.assert_allclose(got_rev, want_rev, rtol=1e-5)


def test_jsd_matches_torch(batch):
    labels, s, t = batch
    lt, st, tt = torch.from_numpy(labels), torch.from_numpy(s), torch.from_numpy(t)
    beta = 0.5
    mask = lt != -100
    sp = F.softmax(st, dim=2)
    tp = F.softmax(tt, dim=2)
    cp = beta * tp + (1 - beta) * sp
    log_c = cp.log()
    kl_f = beta * F.kl_div(log_c, tp, reduction="none")
    kl_r = (1 - beta) * F.kl_div(log_c, sp, reduction="none")
    want = (((kl_f + kl_r).sum(-1)) * mask).sum(-1).mean().item()
    got = float(jsd_loss(jnp.asarray(labels), jnp.asarray(s), jnp.asarray(t), beta))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_tlsd_matches_torch(batch):
    labels, s, t = batch
    # tlsd uses shift-CE against labels; keep all labels valid to match the
    # reference exactly (it never masks inside TLSD)
    labels = np.where(labels == -100, 3, labels)
    lt, st, tt = torch.from_numpy(labels), torch.from_numpy(s), torch.from_numpy(t)
    shift = st[..., :-1, :]
    tc_shift = tt[..., :-1, :]
    tc_labels = lt[..., 1:]
    ce = torch.nn.CrossEntropyLoss(reduction="none")(
        tc_shift.reshape(-1, tc_shift.size(-1)), tc_labels.reshape(-1)
    ).reshape(tc_shift.shape[0], -1)
    token_scale = F.softmax(ce / 10, dim=-1)
    sl = F.log_softmax(shift, dim=-1)
    tp = F.softmax(tc_shift, dim=-1)
    want = ((-tp * sl).sum(-1) * token_scale).sum().item()
    got = float(tlsd_loss(jnp.asarray(labels), jnp.asarray(s), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mse_and_dispatch(batch):
    labels, s, t = batch
    got = float(mse_loss(jnp.asarray(s), jnp.asarray(t)))
    want = float(np.mean((s - t) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    for name in ["cakld", "jsd", "forward", "reverse", "tlsd", "mse"]:
        v = kd_loss(name, jnp.asarray(labels), jnp.asarray(s), jnp.asarray(t), beta=0.5)
        assert np.isfinite(float(v))
    with pytest.raises(ValueError):
        kd_loss("nope", jnp.asarray(labels), jnp.asarray(s), jnp.asarray(t))


def test_cakld_fused_matches_reference_value_and_grad(batch):
    """cakld_loss_fused (analytic VJP, the train-step default) must agree
    with the restatement cakld_loss in value AND in gradients w.r.t. student
    logits and beta — including through a stop-gradient'd teacher."""
    import jax

    from bitdistiller_tpu.train.losses import cakld_loss_fused

    labels, s, t = batch
    labels, s, t = jnp.asarray(labels), jnp.asarray(s), jnp.asarray(t)
    beta = jnp.asarray(0.73)

    def ref(zs, b):
        return cakld_loss(labels, zs, jax.lax.stop_gradient(t), b)

    def fused(zs, b):
        return cakld_loss_fused(labels, zs, jax.lax.stop_gradient(t), b)

    want, (gz_w, gb_w) = jax.value_and_grad(ref, argnums=(0, 1))(s, beta)
    got, (gz_g, gb_g) = jax.value_and_grad(fused, argnums=(0, 1))(s, beta)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gz_g), np.asarray(gz_w), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(gb_g), float(gb_w), rtol=1e-4)

    # bf16 logits (the production dtype): cotangents land in bf16 either way
    sb, tb = s.astype(jnp.bfloat16), t.astype(jnp.bfloat16)
    g_ref = jax.grad(lambda zs: cakld_loss(labels, zs, tb, beta))(sb)
    g_fus = jax.grad(lambda zs: cakld_loss_fused(labels, zs, tb, beta))(sb)
    np.testing.assert_allclose(
        np.asarray(g_fus, np.float32), np.asarray(g_ref, np.float32),
        rtol=0.05, atol=2e-4,
    )

    # kd_loss dispatch routes cakld through the fused path
    d = kd_loss("cakld", labels, s, t, beta=beta)
    np.testing.assert_allclose(float(d), float(want), rtol=1e-5)
