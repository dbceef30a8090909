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

from ..models.hf_import import load_hf_checkpoint, save_hf_checkpoint
from ..parallel.distributed import (
    global_batch_from_host,
    host_shard,
    init_distributed,
    make_hybrid_mesh,
)
from ..parallel.mesh import param_specs_from_params, shard_params
from ..quant.autoclip import apply_clip_cache, load_clip_cache
from .data import Collator, SupervisedDataset, data_loader
from .trainer import (
    TrainConfig,
    estimate_cakld_beta,
    init_train_state,
    make_cakld_beta_fn,
    make_fused_train_step,
    make_train_step,
)

logger = logging.getLogger(__name__)


def save_checkpoint(ckpt_dir: str, step: int, state):
    """Save the FULL train state (params + optimizer moments + step) — the
    reference resumes complete trainer state through HF Trainer/DeepSpeed
    (train.sh:40-43); params-only restore would silently reset Adam."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {"params": state.params, "opt_state": state.opt_state, "step": state.step},
        force=True,
    )
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, state):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(
            os.path.abspath(path),
            {"params": state.params, "opt_state": state.opt_state, "step": state.step},
        )
    except Exception as err:
        restored = _restore_cross_format(ckptr, path, state, err)
    state.params = restored["params"]
    state.opt_state = restored["opt_state"]
    state.step = restored["step"]
    return state


def _restore_cross_format(ckptr, path: str, state, err: Exception):
    """Migration shim between optimizer-state formats, all of which carry
    the same f32 master + Adam inner state plus (optionally) an empty
    accumulator. Handled mappings (checkpoints are written on
    optimizer-cycle boundaries, so the partial accumulator is empty and
    dropping/zeroing it loses nothing):

      * legacy with_f32_master(optax.MultiSteps(...)) — MasterWeightsState(
        master, inner=MultiStepsState(mini_step, gradient_step,
        inner_opt_state, acc_grads)) — into today's stepwise
        MasterAccumState(master, acc=0, count=0, inner) OR the fused-cycle
        MasterWeightsState(master, inner).
      * stepwise MasterAccumState into the fused-cycle MasterWeightsState
        (resuming a run with --fused_accum newly enabled), and back
        (acc=0, count=0)."""
    from .trainer import MasterAccumState, MasterWeightsState

    if not isinstance(state.opt_state, (MasterAccumState, MasterWeightsState)):
        raise err
    raw = ckptr.restore(os.path.abspath(path))  # structure-free restore
    opt_raw = raw.get("opt_state") if isinstance(raw, dict) else None
    if not (isinstance(opt_raw, dict) and "master" in opt_raw):
        raise err
    inner_raw = opt_raw.get("inner")
    if isinstance(inner_raw, dict) and "inner_opt_state" in inner_raw:
        inner_raw = inner_raw["inner_opt_state"]  # legacy MultiSteps wrapper
    if inner_raw is None:
        raise err

    def retree(template, raw_tree):
        """Re-type a structure-free restored subtree onto the template's
        pytree (the raw tree mirrors it: dicts keep keys, tuples keep
        order, and the namedtuple field orders here equal sorted-key
        order), casting each leaf to the template dtype."""
        t_leaves, treedef = jax.tree_util.tree_flatten(template)
        leaves = jax.tree_util.tree_leaves(raw_tree)
        if len(leaves) != len(t_leaves):
            raise err
        leaves = [jnp.asarray(l).astype(t.dtype) for l, t in zip(leaves, t_leaves)]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    tpl = state.opt_state
    if isinstance(tpl, MasterAccumState):
        opt_state = MasterAccumState(
            master=retree(tpl.master, opt_raw["master"]),
            acc=jax.tree_util.tree_map(jnp.zeros_like, tpl.acc),
            count=jnp.zeros((), jnp.int32),
            inner=retree(tpl.inner, inner_raw),
        )
    else:
        opt_state = MasterWeightsState(
            master=retree(tpl.master, opt_raw["master"]),
            inner=retree(tpl.inner, inner_raw),
        )
    logger.warning(
        "migrated optimizer state from %s into %s (accumulator reset at a "
        "cycle boundary)", path, type(opt_state).__name__,
    )
    return {
        "params": retree(state.params, raw["params"]),
        "opt_state": opt_state,
        "step": jnp.asarray(raw["step"], jnp.int32),
    }


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
    # multi-host rendezvous first (deepspeed-hostfile parity, train.sh:24);
    # all args None = single process or TPU auto-detection
    init_distributed(
        getattr(args, "coordinator_address", None),
        getattr(args, "num_processes", None),
        getattr(args, "process_id", None),
    )
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
    student_src = params
    if args.clip:
        logger.info("applying clip cache %s", args.clip)
        # the clip cache shapes the QAT *student* only (train.py:450-458);
        # the teacher stays the unclipped full-precision model (:461-475)
        student_src = apply_clip_cache(params, load_clip_cache(args.clip))

    train_ds = SupervisedDataset.from_jsonl(
        args.data_path, tok.eos_token, args.max_train_samples, "train", args.seed
    )
    eval_ds = SupervisedDataset.from_jsonl(
        args.data_path, tok.eos_token, args.max_train_samples, "eval", args.seed
    )
    if jax.process_count() > 1:
        # each host feeds its own slice; the global batch is assembled from
        # per-host rows (DistributedSampler parity). Eval stays replicated
        # (same data on every host -> identical eval program).
        train_ds = SupervisedDataset(
            sources=host_shard(train_ds.sources), targets=host_shard(train_ds.targets)
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
        param_dtype=getattr(args, "param_dtype", "bfloat16"),
        remat_policy=getattr(args, "remat_policy", "full"),
        fused_accum=(
            getattr(args, "fused_accum", False)
            and args.gradient_accumulation_steps > 1
        ),
    )

    # one mesh path for every topology: single-process this is a plain
    # (dp, tp) reshape; multi-process it keeps tp inside a host's ICI domain
    # and spans dp over DCN (make_hybrid_mesh docstring)
    mesh = make_hybrid_mesh(tp=args.tp or 1, dp=args.dp)
    # ZeRO parity (train/config/zero.json, zero3.json): stage >= 2 shards the
    # Adam moments over dp; stage 3 additionally fsdp-shards the params
    # themselves (XLA all-gathers weights per layer during the forward).
    zero_stage = getattr(args, "zero_stage", 2)
    # specs derived from the actual param tree -> correct for every family
    specs = param_specs_from_params(params, fsdp_axis="dp" if zero_stage >= 3 else None)
    with jax.set_mesh(mesh):
        teacher = None
        if tc.train_kd:
            from jax.sharding import NamedSharding

            teacher = shard_params(params, mesh, specs)
            # teacher rides in the compute dtype (bf16, train.py:461-475);
            # forward casts weights to the activation dtype anyway, so this
            # only halves the teacher's HBM footprint and read traffic
            t_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), specs,
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
            )
            cdt = jnp.dtype(cfg.dtype)
            teacher = jax.jit(
                lambda t: jax.tree_util.tree_map(
                    lambda x: x.astype(cdt)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, t),
                out_shardings=t_shardings,
            )(teacher)
        if args.clip or teacher is None:
            student = shard_params(student_src, mesh, specs)
        else:
            # unclipped KD: student starts from the same weights; the train
            # state makes its own (latent-dtype) copy, so sharing is safe
            student = teacher
        state = init_train_state(
            student, tc, mesh=mesh, param_spec_tree=specs, zero_stage=zero_stage
        )

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

        # teacher passed per call (4th step arg), NOT closed over: a captured
        # teacher tree is serialized into the HLO as constants at trace time
        if tc.fused_accum:
            # quantize-once-per-accum-cycle: ONE jitted call per optimizer
            # cycle over stacked micro-batches (measured 116.8 -> 86.2
            # ms/micro-step at the 0.5B reference recipe on v5e)
            raw_step = make_fused_train_step(cfg, tc)
        else:
            raw_step = make_train_step(cfg, tc)
        from ..utils.debug import DEBUG, checked

        # BITDISTILLER_DEBUG=1: checkify NaN/Inf detection inside the jitted
        # step (train/train.py:300-376 hook-machinery parity). checked()
        # jits internally; check_error must stay outside the staged fn.
        # Donating the state lets XLA update params/moments in place (the
        # 7B CAKLD memory budget needs it).
        step_fn = checked(raw_step) if DEBUG else jax.jit(raw_step, donate_argnums=(0,))

        micro_step = 0
        logs = []
        eval_step_fn = None  # built lazily, once, on first eval
        # per-step scalar metrics file (reference: --report_to tensorboard
        # --logging_steps 1, scripts/train/train.sh:47-48) — JSONL, one line
        # per logged step, written by process 0 only
        metrics_path = os.path.join(args.output_dir, "metrics.jsonl")
        os.makedirs(args.output_dir, exist_ok=True)
        metrics_f = (
            open(metrics_path, "a", buffering=1)
            if jax.process_index() == 0
            else None
        )
        if (getattr(args, "eval_on_start", False) and len(eval_ds)
                and teacher is not None and start_step == 0):
            # train_ckpt0.sh --eval_on_start parity: the step-0 KD loss
            # anchors the training curve before any update
            eval_step_fn = make_eval_step(cfg, tc, teacher)
            ev = evaluate(state, cfg, tc, teacher, eval_ds, collator,
                          args.per_device_train_batch_size, beta, mesh,
                          eval_step=eval_step_fn)
            logger.info("eval loss (step 0) %.4f", ev)
        t0 = time.time()
        skip = start_step  # resume: replay the same shuffles, skip done steps
        fuse_buf: list = []  # fused_accum: host micro-batches of the cycle
        for epoch in range(args.num_train_epochs):
            for batch in data_loader(
                train_ds, collator, args.per_device_train_batch_size,
                shuffle=True, seed=args.seed + epoch,
            ):
                if skip > 0:
                    skip -= 1
                    micro_step += 1
                    continue
                if tc.fused_accum:
                    fuse_buf.append(_prep_host_batch(batch, mesh))
                    micro_step += 1
                    if len(fuse_buf) < tc.grad_accum:
                        continue  # tail micros of a partial cycle are dropped
                    stacked = {
                        key: np.stack([b[key] for b in fuse_buf])
                        for key in fuse_buf[0]
                    }
                    fuse_buf = []
                    sb = global_batch_from_host(stacked, mesh, stacked=True)
                    state, metrics = step_fn(state, sb, beta, teacher)
                else:
                    batch = _shard_batch(batch, mesh)
                    state, metrics = step_fn(state, batch, beta, teacher)
                    micro_step += 1
                if micro_step % args.logging_steps == 0:
                    loss = float(metrics["loss"])
                    logs.append(loss)
                    logger.info(
                        "step %d/%d loss %.4f (%.2fs/step)",
                        micro_step, total_micro, loss,
                        (time.time() - t0) / max(micro_step - start_step, 1),
                    )
                    if metrics_f is not None:
                        import json as _json

                        metrics_f.write(_json.dumps({
                            "step": micro_step,
                            "epoch": epoch,
                            "loss": loss,
                            "grad_norm": float(metrics["grad_norm"]),
                            "seconds_per_step": (time.time() - t0) / max(micro_step - start_step, 1),
                        }) + "\n")
                if args.save_steps and micro_step % args.save_steps == 0:
                    save_checkpoint(args.output_dir, micro_step, state)
                if (args.eval_steps and micro_step % args.eval_steps == 0
                        and len(eval_ds) and teacher is not None):
                    if eval_step_fn is None:
                        eval_step_fn = make_eval_step(cfg, tc, teacher)
                    ev = evaluate(state, cfg, tc, teacher, eval_ds, collator,
                                  args.per_device_train_batch_size, beta, mesh,
                                  eval_step=eval_step_fn)
                    logger.info("eval loss %.4f", ev)

        # final consolidated save (HF format, train.py:139-145 parity) — from
        # the f32 master copy when the optimizer keeps one (bf16 latents)
        from .trainer import master_params

        final = jax.tree_util.tree_map(
            lambda x: np.asarray(x, dtype=np.float32), master_params(state)
        )
        if metrics_f is not None:
            metrics_f.close()
        save_hf_checkpoint(final, cfg, args.output_dir)
        logger.info("saved final model to %s", args.output_dir)
        return {"final_loss": logs[-1] if logs else None, "steps": micro_step}


def make_eval_step(cfg, tc, teacher):
    """Jitted eval step, built ONCE per training run (a per-evaluate() jit
    would recompile the full teacher+student graph at every eval interval).
    Uses the same K-axis-grouped quantizer as the train step (trainer
    make_quantizer) so eval losses live on the training quantization grid.
    """
    from ..models import llama
    from ..train.losses import kd_loss
    from .trainer import make_quantizer

    quantizer = make_quantizer(tc)

    @jax.jit
    def eval_step_impl(params, batch, beta, teacher):
        s_logits, _ = llama.forward(params, cfg, batch["input_ids"], quantizer=quantizer,
                                    attn_mask=batch["attention_mask"])
        t_logits, _ = llama.forward(teacher, cfg, batch["input_ids"],
                                    attn_mask=batch["attention_mask"])
        return kd_loss(tc.kd_loss_type, batch["labels"], s_logits, t_logits, beta=beta)

    # teacher rides through jit as an ARGUMENT (a closed-over tree would be
    # baked into the HLO as constants; ruinous at 7B on a relay attachment)
    return lambda params, batch, beta: eval_step_impl(params, batch, beta, teacher)


def evaluate(state, cfg, tc, teacher, eval_ds, collator, batch_size, beta, mesh,
             eval_step=None):
    from ..train.losses import IGNORE_INDEX

    if eval_step is None:
        eval_step = make_eval_step(cfg, tc, teacher)

    # losses are sum-over-seq / mean-over-batch; padded IGNORE rows contribute
    # exactly 0 to the sum, so rescale by padded/real to undo their dilution
    total, n_rows = 0.0, 0
    for b in data_loader(eval_ds, collator, batch_size, shuffle=False, drop_last=False):
        n_real = b["input_ids"].shape[0]
        sb = _shard_batch(b, mesh, pad_ignore=IGNORE_INDEX)
        n_pad = sb["input_ids"].shape[0]
        total += float(eval_step(state.params, sb, beta)) * n_pad
        n_rows += n_real
    return total / n_rows if n_rows else float("nan")


def _prep_host_batch(batch: dict, mesh, pad_ignore=None) -> dict:
    """Host-side batch normalization for dp sharding (pad / replicate / drop
    to a multiple of dp) — the numpy half of _shard_batch, reused by the
    fused-accumulation path which stacks k prepped micro-batches first."""
    dp = mesh.shape["dp"]
    out = {}
    for k, v in batch.items():
        n = v.shape[0]
        if n % dp != 0:
            if pad_ignore is not None:
                pad_n = dp - n % dp
                fill = pad_ignore if k == "labels" else 0
                pad = np.full((pad_n,) + tuple(v.shape[1:]), fill, dtype=v.dtype)
                v = np.concatenate([v, pad], axis=0)
            elif dp % n == 0:
                # exact replication: every row duplicated the SAME number of
                # times leaves the batch-mean loss (and gradients) unchanged
                v = np.concatenate([v] * (dp // n), axis=0)
            else:
                # uneven duplication would double-count some rows in the loss
                # mean (the reference drops/errors instead) — drop the tail
                v = v[: n - n % dp]
                if v.shape[0] == 0:
                    raise ValueError(
                        f"batch size {n} not compatible with dp={dp}; use a "
                        "batch size that divides or is divisible by dp"
                    )
        out[k] = np.asarray(v)
    return out


def _shard_batch(batch: dict, mesh, pad_ignore=None) -> dict:
    """Device-put a host batch dp-sharded. If the batch size is not a multiple
    of dp: with pad_ignore set, pad with inert rows (labels=IGNORE_INDEX,
    attention_mask=0, tokens=0) that contribute zero loss; otherwise drop the
    remainder (duplicating rows would silently bias the loss mean — the
    reference errors/drops instead).
    """
    # multi-host: each host's rows are its shard of the global batch;
    # single-host: plain sharded device_put (global_batch_from_host handles both)
    return global_batch_from_host(_prep_host_batch(batch, mesh, pad_ignore), mesh)
