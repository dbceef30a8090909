"""End-to-end KD-QAT train-step tests on a tiny model (CPU, 8 virtual devices
for the sharded variant)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.models import TINY_TEST, forward, init_params
from bitdistiller_tpu.train import (

    Collator,
    SupervisedDataset,
    TrainConfig,
    data_loader,
    estimate_cakld_beta,
    init_train_state,
    make_train_step,
)

# Integration tier: this whole module is `-m slow` (many multi-second
# XLA CPU compiles). The default `-m 'not slow'` tier keeps the unit /
# parity / kernel tests for a minutes-scale pre-commit run; run the
# full suite (no -m filter) before shipping engine/trainer changes.
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def setup():
    cfg = TINY_TEST
    teacher = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    student = jax.tree_util.tree_map(lambda x: x, teacher)
    tc = TrainConfig(
        quant_type="int2-asym",
        q_group_size=64,
        kd_loss_type="cakld",
        learning_rate=1e-3,
        total_steps=10,
        gradient_checkpointing=True,
    )
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(0, cfg.vocab_size, (2, 16)).astype(np.int32),
        "labels": rng.integers(0, cfg.vocab_size, (2, 16)).astype(np.int32),
        "attention_mask": np.ones((2, 16), np.int32),
    }
    batch["labels"][:, :4] = -100
    return cfg, teacher, student, tc, batch


def test_kd_train_step_decreases_loss(setup):
    cfg, teacher, student, tc, batch = setup
    step = jax.jit(make_train_step(cfg, tc, teacher_params=teacher))
    state = init_train_state(student, tc)
    beta = jnp.asarray(0.6)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, beta)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses  # student should approach teacher


def test_params_change_only_linears(setup):
    cfg, teacher, student, tc, batch = setup
    step = jax.jit(make_train_step(cfg, tc, teacher_params=teacher))
    state = init_train_state(student, tc)
    state2, _ = step(state, batch, jnp.asarray(0.5))
    dw = np.abs(
        np.asarray(state2.params["layers"]["q"]["w"], np.float32)
        - np.asarray(state.params["layers"]["q"]["w"], np.float32)
    ).sum()
    assert dw > 0


def test_non_kd_ce_step(setup):
    cfg, teacher, student, tc, batch = setup
    tc2 = TrainConfig(**{**tc.__dict__, "train_kd": False})
    step = jax.jit(make_train_step(cfg, tc2, teacher_params=None))
    state = init_train_state(student, tc2)
    state, metrics = step(state, batch, jnp.asarray(0.0))
    assert np.isfinite(float(metrics["loss"]))


def test_cakld_beta_estimation(setup):
    cfg, teacher, student, tc, batch = setup
    beta = estimate_cakld_beta(teacher, cfg, [batch, batch])
    b = float(beta)
    assert 0.0 < b < 1.0


def test_grad_accum_steps(setup):
    cfg, teacher, student, tc, batch = setup
    tc3 = TrainConfig(**{**tc.__dict__, "grad_accum": 2})
    step = jax.jit(make_train_step(cfg, tc3, teacher_params=teacher))
    state = init_train_state(student, tc3)
    p0 = np.asarray(state.params["layers"]["q"]["w"], np.float32).copy()
    state, _ = step(state, batch, jnp.asarray(0.5))
    p1 = np.asarray(state.params["layers"]["q"]["w"], np.float32)
    np.testing.assert_array_equal(p0, p1)  # first microstep: no update yet
    state, _ = step(state, batch, jnp.asarray(0.5))
    p2 = np.asarray(state.params["layers"]["q"]["w"], np.float32)
    assert np.abs(p2 - p0).sum() > 0  # second microstep applies


def test_grad_accum_fused_matches_plain_step(setup):
    """The fused f32-master accumulation path (with_f32_master_accum —
    bf16 latents + grad_accum > 1) must land exactly where a plain step
    lands when every micro-batch is identical: acc = k*g and mean = g are
    exact in f32, clipping/Adam run once on the mean, so the cycle end is
    bit-identical to grad_accum=1 on the same batch."""
    from bitdistiller_tpu.train.trainer import MasterAccumState

    cfg, teacher, student, tc, batch = setup
    beta = jnp.asarray(0.5)

    tc_acc = TrainConfig(**{**tc.__dict__, "grad_accum": 2})
    step_acc = jax.jit(make_train_step(cfg, tc_acc, teacher_params=teacher))
    state_acc = init_train_state(student, tc_acc)
    assert isinstance(state_acc.opt_state, MasterAccumState)
    state_acc, _ = step_acc(state_acc, batch, beta)
    state_acc, _ = step_acc(state_acc, batch, beta)
    assert int(state_acc.opt_state.count) == 0  # cycle closed

    tc_one = TrainConfig(**{**tc.__dict__, "grad_accum": 1})
    step_one = jax.jit(make_train_step(cfg, tc_one, teacher_params=teacher))
    state_one = init_train_state(student, tc_one)
    state_one, _ = step_one(state_one, batch, beta)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state_acc.params, state_one.params,
    )


def test_data_pipeline(tmp_path):
    import json

    path = tmp_path / "teacher.jsonl"
    with open(path, "w") as f:
        for i in range(25):
            f.write(json.dumps([[f"prompt {i}", f" completion {i}"]]) + "\n")

    class FakeTok:
        pad_token_id = 0
        eos_token_id = 1

        def encode(self, s):
            return [ord(c) % 50 + 2 for c in s][:64]

    ds = SupervisedDataset.from_jsonl(str(path), eos_token="</s>", split="train")
    ev = SupervisedDataset.from_jsonl(str(path), eos_token="</s>", split="eval")
    assert len(ds) == 23 and len(ev) == 2  # split_num = min(25//10, 10) = 2

    col = Collator(FakeTok(), model_max_length=128)
    batches = list(data_loader(ds, col, batch_size=4, seed=1))
    assert len(batches) == 5  # 23 // 4, drop_last
    b = batches[0]
    assert b["input_ids"].shape == b["labels"].shape == b["attention_mask"].shape
    assert (b["labels"][b["attention_mask"] == 0] == -100).all()


def test_trainer_quantizer_grid_matches_cli_and_pack(setup):
    """The QAT training grid must agree with the PTQ/eval CLI wrapper
    (cli.py `lambda w: q(w.T).T`) and with the K-axis grouping that AutoClip
    and packing use — grouping along the wrong axis of the [K, N] weights
    would train against a different quantization grid than serving uses."""
    from bitdistiller_tpu.quant.core import (
        asym_quant_params,
        make_fake_quantizer,
    )
    from bitdistiller_tpu.train.trainer import make_quantizer

    cfg, _, _, tc, _ = setup
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((128, 32)).astype(np.float32))  # [K, N]

    trainer_q = make_quantizer(tc)
    cli_q = make_fake_quantizer(tc.quant_type, tc.q_group_size)
    np.testing.assert_allclose(
        np.asarray(trainer_q(w)), np.asarray(cli_q(w.T).T), rtol=1e-6
    )

    # scale/zero grid equals the K-axis grid the packing path computes
    wg = w.T.reshape(-1, w.shape[0] // tc.q_group_size, tc.q_group_size)
    params = asym_quant_params(wg, tc.bits)
    assert params.scales.shape == (32, 128 // tc.q_group_size)


def test_nf3_kd_train_step(setup):
    """ste-n2f3 QAT path end-to-end through the KD step (grid + gradients)."""
    cfg, teacher, student, _, batch = setup
    tc = TrainConfig(
        quant_type="ste-n2f3", q_group_size=64, kd_loss_type="cakld",
        learning_rate=1e-3, total_steps=4, gradient_checkpointing=True,
    )
    state = init_train_state(student, tc)
    step = jax.jit(make_train_step(cfg, tc, teacher_params=teacher))
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, jnp.asarray(0.5))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_master_weights_latent_bf16(setup):
    """Default param_dtype=bfloat16: latent params are bf16, the optimizer
    keeps an f32 master, and after a step latent == round(master) exactly."""
    from bitdistiller_tpu.train import MasterWeightsState

    cfg, teacher, student, tc, batch = setup
    state = init_train_state(student, tc)
    assert isinstance(state.opt_state, MasterWeightsState)
    assert state.params["layers"]["q"]["w"].dtype == jnp.bfloat16
    assert state.opt_state.master["layers"]["q"]["w"].dtype == jnp.float32
    step = jax.jit(make_train_step(cfg, tc, teacher_params=teacher))
    state2, metrics = step(state, batch, jnp.asarray(0.5))
    assert np.isfinite(float(metrics["loss"]))
    jax.tree_util.tree_map(
        lambda m, p: np.testing.assert_array_equal(
            np.asarray(m.astype(p.dtype)), np.asarray(p)
        ),
        state2.opt_state.master,
        state2.params,
    )


def test_master_weights_accumulate_sub_ulp_updates(setup):
    """Updates far below one bf16 ulp must accumulate in the f32 master (the
    whole point of DeepSpeed-style master weights at lr ~1e-6)."""
    cfg, teacher, student, _, batch = setup
    tc = TrainConfig(
        quant_type="int2-asym", q_group_size=64, kd_loss_type="cakld",
        learning_rate=1e-9, total_steps=4, gradient_checkpointing=True,
    )
    state = init_train_state(student, tc)
    m0 = np.asarray(state.opt_state.master["layers"]["q"]["w"], np.float64)
    step = jax.jit(make_train_step(cfg, tc, teacher_params=teacher))
    for _ in range(3):
        state, _ = step(state, batch, jnp.asarray(0.5))
    m1 = np.asarray(state.opt_state.master["layers"]["q"]["w"], np.float64)
    assert np.abs(m1 - m0).max() > 0  # master moved
    # and the master's movement is far below one bf16 ulp of the weights
    assert np.abs(m1 - m0).max() < 1e-4


def test_param_dtype_float32_keeps_plain_state(setup):
    from bitdistiller_tpu.train import MasterWeightsState

    cfg, teacher, student, tc, batch = setup
    import dataclasses

    tc32 = dataclasses.replace(tc, param_dtype="float32")
    state = init_train_state(student, tc32)
    assert not isinstance(state.opt_state, MasterWeightsState)
    assert state.params["layers"]["q"]["w"].dtype == jnp.float32
    step = jax.jit(make_train_step(cfg, tc32, teacher_params=teacher))
    state, metrics = step(state, batch, jnp.asarray(0.5))
    assert np.isfinite(float(metrics["loss"]))


def test_init_train_state_never_aliases_input(setup):
    """state.params must be fresh buffers: the train step donates the state,
    and an aliased input tree would be deleted by the first donated step
    (same-dtype astype returns the same buffer eagerly)."""
    import dataclasses

    cfg, teacher, student, tc, batch = setup
    tc32 = dataclasses.replace(tc, param_dtype="float32")  # same-dtype cast path
    state = init_train_state(student, tc32)
    step = jax.jit(make_train_step(cfg, tc32), donate_argnums=(0,))
    state, _ = step(state, batch, jnp.asarray(0.5), teacher)
    # the caller's tree is still alive and readable
    assert np.isfinite(np.asarray(student["layers"]["q"]["w"], np.float32)).all()


def test_remat_policy_save_quantized_identical(setup):
    """Checkpoint policies ('save_quantized' keeps the fake-quant weights,
    'save_dots' keeps all projection/MLP outputs) only change WHAT the
    backward saves — loss and gradients must be bit-identical to the
    full-recompute policy."""
    import dataclasses

    cfg, teacher, student, tc, batch = setup
    beta = jnp.asarray(0.6)
    results = {}
    for policy in ("full", "save_quantized", "save_dots", "save_qkvo"):
        tc_p = dataclasses.replace(tc, remat_policy=policy)
        step = jax.jit(make_train_step(cfg, tc_p))
        state = init_train_state(student, tc_p)
        new_state, metrics = step(state, batch, beta, teacher)
        results[policy] = (float(metrics["loss"]), new_state.params)
    for policy in ("save_quantized", "save_dots", "save_qkvo"):
        assert results["full"][0] == results[policy][0], policy
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            results["full"][1], results[policy][1],
        )


def test_teacher_flash_matches_xla(setup):
    """tc.teacher_flash=True routes only the TEACHER forward through the
    flash kernel: the KD loss must match the XLA-attention step closely
    (interpret mode on CPU), and gradients flow identically shaped."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    cfg, teacher, student, tc, batch = setup
    beta = jnp.asarray(0.6)
    step = jax.jit(make_train_step(cfg, tc))
    state = init_train_state(student, tc)
    _, m_ref = step(state, batch, beta, teacher)

    tc_f = dataclasses.replace(tc, teacher_flash=True)
    step_f = make_train_step(cfg, tc_f)  # unjitted: interpret ctx must wrap
    state_f = init_train_state(student, tc_f)
    with pltpu.force_tpu_interpret_mode():
        _, m_flash = step_f(state_f, batch, beta, teacher)
    assert abs(float(m_ref["loss"]) - float(m_flash["loss"])) < 5e-3
    assert np.isfinite(float(m_flash["grad_norm"]))
