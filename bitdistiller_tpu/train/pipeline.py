"""End-to-end KD-QAT training runner (the reference's train/train.py:378-525
orchestration, TPU-native).

Flow: load HF checkpoint -> apply clip cache -> build teacher (frozen copy) ->
estimate CAKLD beta -> shard over a dp x tp mesh -> jitted KD train loop with
grad accumulation -> periodic orbax checkpoints + eval -> final HF-format save.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.hf_import import load_hf_checkpoint, save_hf_checkpoint
from ..parallel.mesh import make_mesh, param_specs, shard_params
from ..quant.autoclip import apply_clip_cache, load_clip_cache
from .data import Collator, SupervisedDataset, data_loader
from .trainer import (
    TrainConfig,
    estimate_cakld_beta,
    init_train_state,
    make_cakld_beta_fn,
    make_train_step,
)

logger = logging.getLogger(__name__)


def save_checkpoint(ckpt_dir: str, step: int, state):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state.params, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, state):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), state.params)
    state.params = restored
    return state


def latest_checkpoint(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_")[1]))
            except ValueError:
                continue
    if not steps:
        return None
    s = max(steps)
    return os.path.join(ckpt_dir, f"step_{s}"), s


def run_training(args, *, tokenizer=None, model=None) -> dict:
    """args: the CLI `train` namespace (cli.py). Returns summary metrics.

    tokenizer/model may be injected (tests, custom loaders); by default they
    load from args.model_name_or_path.
    """
    if tokenizer is None:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.model_name_or_path, use_fast=True)
        if tokenizer.pad_token is None:
            tokenizer.pad_token = tokenizer.eos_token
    tok = tokenizer

    if model is None:
        params, cfg = load_hf_checkpoint(args.model_name_or_path, dtype=jnp.float32)
    else:
        params, cfg = model
    if args.clip:
        logger.info("applying clip cache %s", args.clip)
        params = apply_clip_cache(params, load_clip_cache(args.clip))

    train_ds = SupervisedDataset.from_jsonl(
        args.data_path, tok.eos_token, args.max_train_samples, "train", args.seed
    )
    eval_ds = SupervisedDataset.from_jsonl(
        args.data_path, tok.eos_token, args.max_train_samples, "eval", args.seed
    )
    collator = Collator(tok, model_max_length=args.model_max_length)

    steps_per_epoch = max(len(train_ds) // args.per_device_train_batch_size, 1)
    total_micro = steps_per_epoch * args.num_train_epochs
    tc = TrainConfig(
        bits=args.bits,
        q_group_size=args.q_group_size,
        quant_type=args.quant_type,
        train_kd=args.train_kd,
        kd_loss_type=args.kd_loss_type,
        cakld_steps=args.cakld_steps,
        learning_rate=args.learning_rate,
        lr_scheduler="cosine" if "cosine" in args.lr_scheduler_type else "constant",
        warmup_ratio=args.warmup_ratio,
        total_steps=max(total_micro // args.gradient_accumulation_steps, 1),
        grad_accum=args.gradient_accumulation_steps,
    )

    mesh = make_mesh(dp=args.dp, tp=args.tp)
    specs = param_specs(cfg)
    with jax.set_mesh(mesh):
        teacher = shard_params(params, mesh, specs) if tc.train_kd else None
        student = teacher if teacher is not None else shard_params(params, mesh, specs)
        state = init_train_state(student, tc)

        start_step = 0
        if args.resume:
            found = latest_checkpoint(args.output_dir)
            if found:
                path, start_step = found
                logger.info("resuming from %s", path)
                state = restore_checkpoint(path, state)

        beta = jnp.asarray(0.0)
        if tc.train_kd and tc.kd_loss_type == "cakld":
            logger.info("estimating CAKLD coefficient over %d batches", tc.cakld_steps)
            batches = []
            for i, b in enumerate(
                data_loader(train_ds, collator, args.per_device_train_batch_size,
                            shuffle=False)
            ):
                if i >= tc.cakld_steps:
                    break
                batches.append(_shard_batch(b, mesh))
            beta = estimate_cakld_beta(teacher, cfg, batches,
                                       jit_fn=jax.jit(make_cakld_beta_fn(cfg)))
            logger.info("CAKLD beta = %.4f", float(beta))

        raw_step = make_train_step(cfg, tc, teacher_params=teacher)
        from ..utils.debug import DEBUG, checked

        # BITDISTILLER_DEBUG=1: checkify NaN/Inf detection inside the jitted
        # step (train/train.py:300-376 hook-machinery parity). checked()
        # jits internally; check_error must stay outside the staged fn.
        step_fn = checked(raw_step) if DEBUG else jax.jit(raw_step)

        micro_step = 0
        logs = []
        t0 = time.time()
        for epoch in range(args.num_train_epochs):
            for batch in data_loader(
                train_ds, collator, args.per_device_train_batch_size,
                shuffle=True, seed=args.seed + epoch,
            ):
                batch = _shard_batch(batch, mesh)
                state, metrics = step_fn(state, batch, beta)
                micro_step += 1
                if micro_step % args.logging_steps == 0:
                    loss = float(metrics["loss"])
                    logs.append(loss)
                    logger.info(
                        "step %d/%d loss %.4f (%.2fs/step)",
                        micro_step, total_micro, loss, (time.time() - t0) / micro_step,
                    )
                if args.save_steps and micro_step % args.save_steps == 0:
                    save_checkpoint(args.output_dir, micro_step, state)
                if args.eval_steps and micro_step % args.eval_steps == 0 and len(eval_ds):
                    ev = evaluate(state, cfg, tc, teacher, eval_ds, collator,
                                  args.per_device_train_batch_size, beta, mesh)
                    logger.info("eval loss %.4f", ev)

        # final consolidated save (HF format, train.py:139-145 parity)
        final = jax.tree_util.tree_map(
            lambda x: np.asarray(x, dtype=np.float32), state.params
        )
        save_hf_checkpoint(final, cfg, args.output_dir)
        logger.info("saved final model to %s", args.output_dir)
        return {"final_loss": logs[-1] if logs else None, "steps": micro_step}


def evaluate(state, cfg, tc, teacher, eval_ds, collator, batch_size, beta, mesh):
    from ..train.losses import kd_loss
    from ..models import llama
    from ..quant.core import make_fake_quantizer

    quantizer = make_fake_quantizer(tc.quant_type, tc.q_group_size)

    @jax.jit
    def eval_step(params, batch):
        s_logits, _ = llama.forward(params, cfg, batch["input_ids"], quantizer=quantizer,
                                    attn_mask=batch["attention_mask"])
        t_logits, _ = llama.forward(teacher, cfg, batch["input_ids"],
                                    attn_mask=batch["attention_mask"])
        return kd_loss(tc.kd_loss_type, batch["labels"], s_logits, t_logits, beta=beta)

    losses = [
        float(eval_step(state.params, _shard_batch(b, mesh)))
        for b in data_loader(eval_ds, collator, batch_size, shuffle=False, drop_last=False)
    ]
    return float(np.mean(losses)) if losses else float("nan")


def _shard_batch(batch: dict, mesh) -> dict:
    dp = mesh.shape["dp"]
    out = {}
    for k, v in batch.items():
        n = v.shape[0]
        if n % dp != 0:  # pad batch up to dp multiple by cycling rows
            target = n + dp - n % dp
            reps = -(-target // n)
            v = np.concatenate([v] * reps, axis=0)[:target]
        out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, P("dp")))
    return out
