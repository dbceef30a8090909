"""End-to-end pipeline integration tests on the tiny model (CPU, 8 virtual
devices): the full BitDistiller flow — teacher gen -> autoclip -> KD-QAT ->
pack -> serve — chained through the real APIs with a fake tokenizer."""

import json
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.models import TINY_TEST, forward, init_params
from bitdistiller_tpu.models.hf_import import load_hf_checkpoint, save_hf_checkpoint
from bitdistiller_tpu.models.quantized import (

    load_packed_checkpoint,
    pack_model,
    save_packed_checkpoint,
)

# Integration tier: this whole module is `-m slow` (many multi-second
# XLA CPU compiles). The default `-m 'not slow'` tier keeps the unit /
# parity / kernel tests for a minutes-scale pre-commit run; run the
# full suite (no -m filter) before shipping engine/trainer changes.
pytestmark = pytest.mark.slow



class FakeTok:
    eos_token = "</s>"
    eos_token_id = 2
    pad_token = "</s>"
    pad_token_id = 0

    def encode(self, s):
        return [(ord(c) % 250) + 3 for c in s][:96]

    def decode(self, ids, **kw):
        return "".join(chr((i - 3) % 26 + 97) for i in ids)


@pytest.fixture(scope="module")
def tiny():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    return cfg, params


def test_hf_checkpoint_roundtrip(tmp_path, tiny):
    cfg, params = tiny
    save_hf_checkpoint(
        jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params),
        cfg,
        str(tmp_path / "ckpt"),
    )
    params2, cfg2 = load_hf_checkpoint(str(tmp_path / "ckpt"), dtype=jnp.float32)
    assert cfg2.hidden_size == cfg.hidden_size
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    l1, _ = forward(params, cfg, tokens)
    l2, _ = forward(params2, cfg2, tokens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_packed_checkpoint_roundtrip(tmp_path, tiny):
    cfg, params = tiny
    packed = pack_model(params, cfg, bits=2, group_size=64)
    save_packed_checkpoint(str(tmp_path / "packed"), packed, cfg, bits=2, group_size=64)
    loaded, cfg2 = load_packed_checkpoint(str(tmp_path / "packed"))
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    l1, _ = forward(packed, cfg, tokens)
    l2, _ = forward(loaded, cfg2, tokens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_teacher_generation_local_json(tmp_path, tiny):
    from bitdistiller_tpu.generation.teacher import run_teacher_generation

    cfg, params = tiny
    prompts_path = tmp_path / "prompts.jsonl"
    with open(prompts_path, "w") as f:
        for i in range(6):
            f.write(json.dumps({"instruction": f"write something {i}"}) + "\n")

    args = types.SimpleNamespace(
        base_model="unused", dataset_name="json", data_path=str(prompts_path),
        out_path=str(tmp_path / "teacher.jsonl"), max_sample=6, max_new_tokens=5,
        temperature=0.0, top_p=1.0, max_batch=2, max_seq_len=128, seed=0,
    )
    out = run_teacher_generation(args, tokenizer=FakeTok(), model=(params, cfg))
    lines = [json.loads(x) for x in open(out)]
    assert len(lines) == 6
    assert all(isinstance(l[0][0], str) and isinstance(l[0][1], str) for l in lines)


def test_full_training_pipeline(tmp_path, tiny):
    """teacher jsonl -> run_training (cakld, grad accum, clip) -> saved HF dir."""
    from bitdistiller_tpu.quant.autoclip import run_autoclip, save_clip_cache
    from bitdistiller_tpu.train.pipeline import run_training

    cfg, params = tiny
    # teacher data
    data_path = tmp_path / "teacher.jsonl"
    with open(data_path, "w") as f:
        for i in range(24):
            f.write(json.dumps([[f"prompt number {i} ", f"reply text {i}"]]) + "\n")

    # stage 1: autoclip
    calib = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 32)).astype(np.int32)
    clip = run_autoclip(params, cfg, calib, quant_type="int", n_bit=2, group_size=64,
                        n_sample_token=32, apply=False)
    clip_path = str(tmp_path / "clip.npz")
    save_clip_cache(clip_path, clip["clip"])

    args = types.SimpleNamespace(
        model_name_or_path="unused",
        data_path=str(data_path),
        output_dir=str(tmp_path / "out"),
        bits=2, q_group_size=64, quant_type="int2-asym",
        clip=clip_path, train_kd=True, kd_loss_type="cakld", cakld_steps=2,
        learning_rate=1e-4, num_train_epochs=1,
        per_device_train_batch_size=2, gradient_accumulation_steps=2,
        model_max_length=64, max_train_samples=None,
        lr_scheduler_type="constant", warmup_ratio=0.0,
        save_steps=0, eval_steps=0, logging_steps=5, seed=0,
        dp=None, tp=1, resume=False, eval_on_start=True,
    )
    summary = run_training(args, tokenizer=FakeTok(), model=(params, cfg))
    assert summary["steps"] > 0
    assert summary["final_loss"] is not None and np.isfinite(summary["final_loss"])
    # final HF-format model exists and loads
    params2, cfg2 = load_hf_checkpoint(str(tmp_path / "out"), dtype=jnp.float32)
    assert cfg2.num_layers == cfg.num_layers


def test_full_training_pipeline_fused_accum(tmp_path, tiny):
    """run_training with --fused_accum: cycles consume stacked micro-batch
    blocks (one jitted call per optimizer cycle, quantize-once) and the
    pipeline still trains, logs, and saves."""
    from bitdistiller_tpu.train.pipeline import run_training

    cfg, params = tiny
    data_path = tmp_path / "teacher.jsonl"
    with open(data_path, "w") as f:
        for i in range(16):
            f.write(json.dumps([[f"prompt number {i} ", f"reply text {i}"]]) + "\n")

    args = types.SimpleNamespace(
        model_name_or_path="unused",
        data_path=str(data_path),
        output_dir=str(tmp_path / "out"),
        bits=2, q_group_size=64, quant_type="int2-asym",
        clip=None, train_kd=True, kd_loss_type="cakld", cakld_steps=2,
        learning_rate=1e-4, num_train_epochs=1,
        per_device_train_batch_size=2, gradient_accumulation_steps=2,
        model_max_length=64, max_train_samples=None,
        lr_scheduler_type="constant", warmup_ratio=0.0,
        save_steps=0, eval_steps=0, logging_steps=2, seed=0,
        dp=None, tp=1, resume=False, fused_accum=True,
    )
    summary = run_training(args, tokenizer=FakeTok(), model=(params, cfg))
    assert summary["steps"] > 0
    assert summary["final_loss"] is not None and np.isfinite(summary["final_loss"])
    params2, cfg2 = load_hf_checkpoint(str(tmp_path / "out"), dtype=jnp.float32)
    assert cfg2.num_layers == cfg.num_layers


def test_kd_teacher_is_unclipped(tmp_path, tiny, monkeypatch):
    """The clip cache shapes the QAT student only; the KD teacher must stay
    the unclipped full-precision model (train.py:450-458 clips the student,
    :461-475 loads the teacher fresh)."""
    from bitdistiller_tpu.quant.autoclip import (
        apply_clip_cache,
        load_clip_cache,
        run_autoclip,
        save_clip_cache,
    )
    from bitdistiller_tpu.train import pipeline as pl

    cfg, params = tiny
    calib = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 32)).astype(np.int32)
    clip = run_autoclip(params, cfg, calib, quant_type="int", n_bit=2, group_size=64,
                        n_sample_token=32, apply=False)["clip"]
    # force a big shrink so clipped weights measurably differ from originals
    clip = {
        li: {name: (np.asarray(mx) * 0.3, np.asarray(mn) * 0.3)
             for name, (mx, mn) in layer.items()}
        for li, layer in clip.items()
    }
    clip_path = str(tmp_path / "clip.npz")
    save_clip_cache(clip_path, clip)
    clipped = apply_clip_cache(params, load_clip_cache(clip_path))

    captured = {}
    real_beta = pl.estimate_cakld_beta

    def spy(teacher, cfg_, batches, jit_fn=None):
        captured["teacher"] = teacher
        return real_beta(teacher, cfg_, batches, jit_fn=jit_fn)

    monkeypatch.setattr(pl, "estimate_cakld_beta", spy)

    data_path = tmp_path / "teacher.jsonl"
    with open(data_path, "w") as f:
        for i in range(12):
            f.write(json.dumps([[f"prompt {i} ", f"reply {i}"]]) + "\n")
    args = types.SimpleNamespace(
        model_name_or_path="unused", data_path=str(data_path),
        output_dir=str(tmp_path / "out"),
        bits=2, q_group_size=64, quant_type="int2-asym",
        clip=clip_path, train_kd=True, kd_loss_type="cakld", cakld_steps=1,
        learning_rate=1e-4, num_train_epochs=1,
        per_device_train_batch_size=2, gradient_accumulation_steps=1,
        model_max_length=32, max_train_samples=None,
        lr_scheduler_type="constant", warmup_ratio=0.0,
        save_steps=0, eval_steps=0, logging_steps=5, seed=0,
        dp=None, tp=1, resume=False,
    )
    pl.run_training(args, tokenizer=FakeTok(), model=(params, cfg))

    name = next(n for n in ("v", "o", "down") if n in clip[0])
    t_w = np.asarray(captured["teacher"]["layers"][name]["w"], np.float32)
    w0 = np.asarray(params["layers"][name]["w"], np.float32)
    wc = np.asarray(clipped["layers"][name]["w"], np.float32)
    mask = wc != w0
    assert mask.any(), "forced clip cache did not change any weight"
    # teacher ~= unclipped originals (bf16 cast tolerance), not the clipped tree
    err_unclipped = np.abs(t_w[mask] - w0[mask]).max()
    err_clipped = np.abs(t_w[mask] - wc[mask]).max()
    assert err_unclipped < 0.01, err_unclipped
    assert err_clipped > 5 * max(err_unclipped, 1e-6), (err_clipped, err_unclipped)


def test_orbax_checkpoint_roundtrip(tmp_path, tiny):
    from bitdistiller_tpu.train.pipeline import restore_checkpoint, save_checkpoint
    from bitdistiller_tpu.train.trainer import TrainConfig, init_train_state

    cfg, params = tiny
    tc = TrainConfig(total_steps=2)
    state = init_train_state(params, tc)
    path = save_checkpoint(str(tmp_path / "ck"), 5, state)
    state2 = init_train_state(
        jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), params), tc
    )
    state2 = restore_checkpoint(path, state2)
    np.testing.assert_allclose(
        np.asarray(state2.params["layers"]["q"]["w"]),
        np.asarray(state.params["layers"]["q"]["w"]),
    )
    # FULL state restores: Adam moments and the step counter, not just params
    # (params-only restore silently resets the optimizer)
    m1 = jax.tree_util.tree_leaves(state.opt_state)
    m2 = jax.tree_util.tree_leaves(state2.opt_state)
    assert len(m1) == len(m2)
    for a, b in zip(m1, m2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(state2.step) == int(state.step)


def test_legacy_multisteps_checkpoint_migrates(tmp_path, tiny):
    """--resume from a checkpoint written by the pre-round-4 optimizer stack
    (with_f32_master(optax.MultiSteps(...))) must restore into today's
    fused MasterAccumState: master weights + Adam moments carried over,
    accumulator reset at the (cycle-aligned) boundary."""
    import optax

    from bitdistiller_tpu.train.pipeline import restore_checkpoint, save_checkpoint
    from bitdistiller_tpu.train import trainer as tr

    cfg, params = tiny
    tc = tr.TrainConfig(total_steps=8, grad_accum=4, param_dtype="bfloat16")

    # the legacy optimizer stack, exactly as round-3 make_optimizer built it
    legacy_opt = tr.with_f32_master(
        optax.MultiSteps(
            optax.chain(
                optax.clip_by_global_norm(tc.max_grad_norm),
                optax.adamw(
                    learning_rate=tr.make_schedule(tc), b1=tc.adam_b1,
                    b2=tc.adam_b2, eps=tc.adam_eps,
                    weight_decay=tc.weight_decay,
                ),
            ),
            every_k_schedule=tc.grad_accum,
        )
    )
    latent = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    legacy_state = tr.TrainState(
        params=latent, opt_state=legacy_opt.init(latent),
        step=jnp.asarray(7, jnp.int32),
    )
    # run one full accumulation cycle so the Adam moments are non-zero
    grads = jax.tree_util.tree_map(
        lambda x: jnp.ones_like(x, jnp.float32), latent
    )
    opt_state = legacy_state.opt_state
    for _ in range(tc.grad_accum):
        _, opt_state = legacy_opt.update(grads, opt_state, latent)
    legacy_state.opt_state = opt_state
    path = save_checkpoint(str(tmp_path / "legacy"), 7, legacy_state)

    state = tr.init_train_state(params, tc)  # today's MasterAccumState stack
    assert isinstance(state.opt_state, tr.MasterAccumState)
    state = restore_checkpoint(path, state)
    assert isinstance(state.opt_state, tr.MasterAccumState)
    np.testing.assert_allclose(
        np.asarray(state.opt_state.master["layers"]["q"]["w"]),
        np.asarray(opt_state.master["layers"]["q"]["w"]),
    )
    # Adam moments carried over from the legacy inner state (chain index 1 =
    # adamw; its first element is ScaleByAdamState)
    legacy_adam = opt_state.inner.inner_opt_state[1][0]
    new_adam = state.opt_state.inner[1][0]
    assert int(new_adam.count) == int(legacy_adam.count) == 1
    np.testing.assert_allclose(
        np.asarray(new_adam.mu["layers"]["q"]["w"]),
        np.asarray(legacy_adam.mu["layers"]["q"]["w"]),
    )
    # fresh-cycle boundary: accumulator empty
    assert int(state.opt_state.count) == 0
    assert float(jnp.abs(state.opt_state.acc["layers"]["q"]["w"]).max()) == 0.0
    assert int(state.step) == 7


def test_stepwise_checkpoint_resumes_into_fused(tmp_path, tiny):
    """Enabling --fused_accum on --resume: a stepwise MasterAccumState
    checkpoint restores into the fused MasterWeightsState (master + Adam
    moments carried, accumulator dropped at the cycle boundary) — and the
    reverse direction restores back into MasterAccumState."""
    from bitdistiller_tpu.train.pipeline import restore_checkpoint, save_checkpoint
    from bitdistiller_tpu.train import trainer as tr

    cfg, params = tiny
    kw = dict(total_steps=8, grad_accum=4, param_dtype="bfloat16")
    tc_sw = tr.TrainConfig(**kw)
    state_sw = tr.init_train_state(params, tc_sw)
    assert isinstance(state_sw.opt_state, tr.MasterAccumState)
    # run one full cycle so Adam moments are non-zero
    opt_sw = tr.make_optimizer(tc_sw)
    grads = jax.tree_util.tree_map(
        lambda x: jnp.ones_like(x, jnp.float32), state_sw.params
    )
    opt_state = state_sw.opt_state
    for _ in range(tc_sw.grad_accum):
        _, opt_state = opt_sw.update(grads, opt_state, state_sw.params)
    state_sw.opt_state = opt_state
    assert int(opt_state.count) == 0  # cycle boundary
    path = save_checkpoint(str(tmp_path / "sw"), 4, state_sw)

    tc_f = tr.TrainConfig(**kw, fused_accum=True)
    state_f = tr.init_train_state(params, tc_f)
    assert isinstance(state_f.opt_state, tr.MasterWeightsState)
    state_f = restore_checkpoint(path, state_f)
    assert isinstance(state_f.opt_state, tr.MasterWeightsState)
    np.testing.assert_allclose(
        np.asarray(state_f.opt_state.master["layers"]["q"]["w"]),
        np.asarray(opt_state.master["layers"]["q"]["w"]),
    )
    adam_sw = opt_state.inner[1][0]
    adam_f = state_f.opt_state.inner[1][0]
    assert int(adam_f.count) == int(adam_sw.count) == 1
    np.testing.assert_allclose(
        np.asarray(adam_f.mu["layers"]["q"]["w"]),
        np.asarray(adam_sw.mu["layers"]["q"]["w"]),
    )

    # reverse: fused checkpoint -> stepwise MasterAccumState
    path2 = save_checkpoint(str(tmp_path / "fused"), 8, state_f)
    state_back = tr.init_train_state(params, tc_sw)
    state_back = restore_checkpoint(path2, state_back)
    assert isinstance(state_back.opt_state, tr.MasterAccumState)
    assert int(state_back.opt_state.count) == 0
    np.testing.assert_allclose(
        np.asarray(state_back.opt_state.master["layers"]["q"]["w"]),
        np.asarray(opt_state.master["layers"]["q"]["w"]),
    )


def test_cli_parser_smoke():
    from bitdistiller_tpu.cli import build_parser

    p = build_parser()
    args = p.parse_args(["ppl", "--model_path", "/x", "--quant_type", "int", "--w_bit", "2"])
    assert args.cmd == "ppl" and args.w_bit == 2
    args = p.parse_args(["train", "--model_name_or_path", "/m", "--data_path", "/d",
                         "--output_dir", "/o"])
    assert args.kd_loss_type == "cakld"
    with pytest.raises(SystemExit):
        p.parse_args(["nope"])
