"""KD-QAT training loop: jitted teacher+student step with CAKLD.

Reference parity (train/train.py:378-525, mytrainer.py:81-241):
  * teacher = frozen dense params, student = same weights trained through a
    fake-quant forward (STE) — both run in ONE jitted step (the reference
    does two separate module calls; here XLA fuses/schedules them together).
  * CAKLD coefficient = mean over `cakld_steps` batches of the teacher's mean
    max softmax prob, all-reduced over data ranks (train.py:486-511) — here a
    jitted prologue; the mesh mean replaces dist.all_reduce.
  * optimizer: AdamW + constant or warmup-cosine schedule (train.sh:24-57);
    grad accumulation via optax.MultiSteps; bf16 params with f32 optimizer
    state; optimizer state sharded over dp (ZeRO-equivalent) by pjit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import config as mcfg
from ..models import llama
from .losses import IGNORE_INDEX, kd_loss


@dataclasses.dataclass
class TrainConfig:
    """Mirror of the reference TrainingArguments extension (train/train.py:89-137)."""

    bits: int = 2
    q_group_size: int = 128
    quant_type: str = "int2-asym"  # or "ste-n2f3"
    train_kd: bool = True
    kd_loss_type: str = "cakld"
    kd_tmp: float = 1.0
    cakld_steps: int = 10
    learning_rate: float = 8e-6
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    warmup_ratio: float = 0.0
    lr_scheduler: str = "constant"  # "constant" | "cosine"
    total_steps: int = 1000
    grad_accum: int = 1
    # fused_accum=True: one jitted call per optimizer CYCLE (stacked
    # micro-batches, quantize-once, f32 scan-carry accumulation) via
    # make_fused_train_step — the fake-quant fwd/bwd runs once per cycle
    # instead of once per micro-step. Semantics match the stepwise path
    # (grads averaged, clip+Adam once per cycle); opt state is the smaller
    # MasterWeightsState (no persistent accumulator tree).
    fused_accum: bool = False
    max_grad_norm: float = 1.0
    gradient_checkpointing: bool = True
    # "full" recomputes everything in bwd; "save_quantized" keeps the
    # fake-quantized weights live (faster, one extra weight copy of memory);
    # "save_dots" additionally saves every projection/MLP output;
    # "save_qkvo" saves only the attention-side projections (recompute the
    # MLP intermediates — fits larger micro-batches than save_dots)
    remat_policy: str = "full"
    # teacher forward attention: None = the BITDISTILLER_TRAIN_FLASH env
    # default; True routes the (no-grad) teacher forward through the flash
    # kernel — fwd-only flash skips the [B,H,S,S] score materialization
    # without the bwd-recompute cost that made it lose for the STUDENT
    # (round-4 finding 5)
    teacher_flash: bool | None = None
    kd_loss_scale: float = 1.0
    # latent (trained) weight dtype. "bfloat16" matches the reference: the
    # student is loaded in bf16 (train/train.py:394-397) and DeepSpeed's bf16
    # mode keeps f32 master weights in the optimizer (train/config/zero.json)
    # — here via with_f32_master. Measured at 0.5B bs 2x1024: 195 -> 166
    # ms/step vs f32 latents (the fake-quant pass reads half the bytes).
    # "float32" = f32 latents, no master copy.
    param_dtype: str = "bfloat16"


def make_quantizer(tc: TrainConfig):
    """Weight quantizer for training/eval forwards.

    Must group along the input-feature (K) axis of the [K, N] weights so the
    QAT grid matches AutoClip, the PTQ eval path, and packed serving —
    make_weight_quantizer handles the transpose.
    """
    from ..quant.core import make_weight_quantizer

    return make_weight_quantizer(tc.quant_type, tc.q_group_size)


def make_schedule(tc: TrainConfig):
    warmup = int(tc.warmup_ratio * tc.total_steps)
    if tc.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup else tc.learning_rate,
            peak_value=tc.learning_rate,
            warmup_steps=max(warmup, 1) if warmup else 0,
            decay_steps=tc.total_steps,
            end_value=0.0,
        )
    if warmup:
        return optax.linear_schedule(0.0, tc.learning_rate, warmup)
    return optax.constant_schedule(tc.learning_rate)


class MasterWeightsState(NamedTuple):
    """f32 master copy of the latent params + the wrapped optimizer's state."""

    master: Any
    inner: Any


def with_f32_master(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Mixed-precision updates: bf16 latent params in the forward, f32 master
    weights + f32 gradient math in the optimizer (DeepSpeed bf16-mode
    semantics, train/config/zero.json — grads/moments/master in fp32).

    The emitted update is the f32 delta that lands the latent on the rounded
    master; make_train_step instead reads `state.master` directly so the
    latent is exactly round(master) every step. `init` only tree_maps over
    the params, so optax.tree_map_params (ZeRO spec derivation,
    parallel/mesh.py:opt_state_specs) sees the master as param-shaped.
    """

    def init(params):
        master = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            params,
        )
        return MasterWeightsState(master=master, inner=inner.init(master))

    def update(updates, state, params=None):
        g32 = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), updates)
        upd, inner_state = inner.update(g32, state.inner, state.master)
        master = optax.apply_updates(state.master, upd)
        delta = jax.tree_util.tree_map(
            lambda m, p: m - p.astype(jnp.float32), master, params
        )
        return delta, MasterWeightsState(master=master, inner=inner_state)

    return optax.GradientTransformation(init, update)


class MasterAccumState(NamedTuple):
    """f32 master + f32 grad accumulator + the inner optimizer's state.

    count = micro-steps accumulated since the last optimizer update
    (0 right after an update, so `count == 0` means "params just moved")."""

    master: Any
    acc: Any
    count: jnp.ndarray
    inner: Any


def with_f32_master_accum(
    inner: optax.GradientTransformation, every_k: int
) -> optax.GradientTransformation:
    """Fused mixed-precision gradient accumulation: f32 master weights AND
    f32 accumulation buffers, with the inner optimizer (and the master
    delta) running only on every k-th micro-step via a real `lax.cond`.

    The naive stack `with_f32_master(optax.MultiSteps(...))` pays the
    master sweep (read master + params, write the delta, re-derive the
    bf16 latents — ~8 GB of HBM at 0.5B) on EVERY micro-step even though
    MultiSteps leaves the master untouched on 7 of 8 of them: measured
    145.2 ms/micro-step at the 0.5B bs-2 recipe vs 131.0 with no
    accumulation at all. Here accumulation steps touch only grads + acc
    (~4 GB) and the Adam/master sweep runs once per cycle.

    Reference semantics (train.sh --gradient_accumulation_steps 8 +
    DeepSpeed bf16 mode): grads averaged over the cycle, clipping/Adam
    applied once per cycle on the averaged gradient, f32 master.
    """

    def init(params):
        master = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            params,
        )
        acc = jax.tree_util.tree_map(jnp.zeros_like, master)
        return MasterAccumState(
            master=master, acc=acc, count=jnp.zeros((), jnp.int32),
            inner=inner.init(master),
        )

    def update(updates, state, params=None):
        del params  # latents are re-derived from the master by the caller
        acc = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(jnp.float32), state.acc, updates
        )
        count = state.count + 1

        def do_update(acc, inner_state, master):
            mean_g = jax.tree_util.tree_map(lambda a: a / every_k, acc)
            upd, inner2 = inner.update(mean_g, inner_state, master)
            master2 = optax.apply_updates(master, upd)
            acc2 = jax.tree_util.tree_map(jnp.zeros_like, acc)
            return master2, acc2, jnp.zeros((), jnp.int32), inner2

        def no_update(acc, inner_state, master):
            return master, acc, count, inner_state

        master2, acc2, count2, inner2 = jax.lax.cond(
            count >= every_k, do_update, no_update,
            acc, state.inner, state.master,
        )
        # the delta output is unused by make_train_step's master path
        # (it reads state.master directly) — XLA removes the zeros
        zeros = jax.tree_util.tree_map(jnp.zeros_like, updates)
        return zeros, MasterAccumState(
            master=master2, acc=acc2, count=count2, inner=inner2
        )

    return optax.GradientTransformation(init, update)


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    opt = optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        optax.adamw(
            learning_rate=make_schedule(tc),
            b1=tc.adam_b1,
            b2=tc.adam_b2,
            eps=tc.adam_eps,
            weight_decay=tc.weight_decay,
        ),
    )
    latent_is_f32 = jnp.dtype(tc.param_dtype) == jnp.float32
    if tc.fused_accum:
        # the fused cycle step hands opt.update the already-averaged cycle
        # gradient — no accumulation wrapper; master sweep every update
        return opt if latent_is_f32 else with_f32_master(opt)
    if tc.grad_accum > 1 and not latent_is_f32:
        # fused path: accumulate in f32, run Adam + the master/latent sweep
        # only on cycle boundaries (see with_f32_master_accum docstring)
        return with_f32_master_accum(opt, tc.grad_accum)
    if tc.grad_accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=tc.grad_accum)
    if not latent_is_f32:
        opt = with_f32_master(opt)
    return opt


@dataclasses.dataclass
class TrainState:
    params: Any  # student latent weights (trained)
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):  # pragma: no cover - registered below
        return (self.params, self.opt_state, self.step), None


jax.tree_util.register_dataclass(TrainState, ["params", "opt_state", "step"], [])


def init_train_state(
    params,
    tc: TrainConfig,
    *,
    mesh=None,
    param_spec_tree=None,
    zero_stage: int = 0,
) -> TrainState:
    """Build the train state; with a mesh + specs, the optimizer state is
    materialized directly in its ZeRO sharding (reference: DeepSpeed
    train/config/zero.json stage 2 / zero3.json stage 3).

    zero_stage semantics here: 0 = opt state follows the params' sharding
    (replicated over dp unless the params are fsdp-sharded); 2 = Adam
    moments/accumulators sharded over dp even though params are replicated;
    3 = pass params already sharded with param_specs(fsdp_axis="dp") and the
    moments inherit that sharding.
    """
    opt = make_optimizer(tc)
    latent_dtype = jnp.dtype(tc.param_dtype)

    def _to_latent(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(latent_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    # jitted cast: one executable (not a remote compile per leaf on a relay)
    # AND guaranteed-fresh output buffers — the train step donates the state,
    # so state.params must never alias the caller's tree (a same-dtype astype
    # eagerly returns the same buffer, and the first donated step would
    # delete the caller's teacher/params)
    if mesh is not None and param_spec_tree is not None:
        from jax.sharding import NamedSharding

        latent_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), param_spec_tree,
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
        )
        latent = jax.jit(_to_latent, out_shardings=latent_shardings)(params)
    else:
        latent = jax.jit(_to_latent)(params)
    if mesh is not None and param_spec_tree is not None and zero_stage >= 2:
        from jax.sharding import NamedSharding

        from ..parallel.mesh import opt_state_specs

        specs = opt_state_specs(
            opt, latent, param_spec_tree, mesh.shape["dp"], zero_stage
        )
        out_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
        )
        opt_state = jax.jit(opt.init, out_shardings=out_shardings)(latent)
    else:
        opt_state = jax.jit(opt.init)(latent)
    return TrainState(
        params=latent, opt_state=opt_state, step=jnp.zeros((), jnp.int32)
    )


def master_params(state: TrainState):
    """The highest-precision trained weights: the f32 master copy when the
    optimizer keeps one (param_dtype != float32), else the params themselves.
    Use for final checkpoint saves (train.py:139-145 consolidated save)."""
    if isinstance(state.opt_state, (MasterWeightsState, MasterAccumState)):
        return state.opt_state.master
    return state.params


def _student_remat(tc: TrainConfig, quantizer):
    if (
        tc.gradient_checkpointing
        and tc.remat_policy in ("save_quantized", "save_dots", "save_qkvo")
        and quantizer is not None
    ):
        return tc.remat_policy
    return tc.gradient_checkpointing


def _kd_or_ce_loss(
    cfg, tc: TrainConfig, params, batch, beta, teacher_params,
    *, quantizer, student_remat,
):
    """Per-micro-batch KD (CAKLD etc.) or plain-CE loss — the body shared by
    the stepwise step and the fused-accumulation cycle step."""
    student_logits, _ = llama.forward(
        params,
        cfg,
        batch["input_ids"],
        quantizer=quantizer,
        attn_mask=batch.get("attention_mask"),
        remat=student_remat,
    )
    if teacher_params is not None and tc.train_kd:
        teacher_logits, _ = llama.forward(
            jax.lax.stop_gradient(teacher_params),
            cfg,
            batch["input_ids"],
            attn_mask=batch.get("attention_mask"),
            remat=tc.gradient_checkpointing,
            use_train_flash=tc.teacher_flash,
        )
        teacher_logits = jax.lax.stop_gradient(teacher_logits)
        return tc.kd_loss_scale * kd_loss(
            tc.kd_loss_type,
            batch["labels"],
            student_logits,
            teacher_logits,
            beta=beta,
            temperature=tc.kd_tmp,
        )
    labels = batch["labels"]
    shift_logits = student_logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def make_fused_train_step(
    cfg: mcfg.ModelConfig,
    tc: TrainConfig,
    teacher_params=None,
) -> Callable:
    """One optimizer CYCLE per call: quantize-once-per-accum-cycle.

    The stepwise path re-runs the weight fake-quant fwd (and its bwd: the
    STE + non-detached scale-path VJP, quant/core.py fake_quant_int_kaxis)
    on every micro-step even though the latents only move on cycle
    boundaries — grad_accum-1 of those passes are identical. Here the cycle
    is ONE jitted call over stacked micro-batches (leaves [k, B, S]):

      1. qparams, quant_vjp = jax.vjp(quantize_layer_weights, params) — the
         fake-quant fwd runs ONCE (bit-identical to the in-forward
         quantization, models/llama.py quantize_layer_weights);
      2. lax.scan over the k micro-batches: per-micro value_and_grad wrt
         qparams (fwd/bwd interleaved per iteration, so peak activation
         memory stays one micro-batch), f32 accumulation in the carry — the
         same f32-accumulate semantics as with_f32_master_accum;
      3. the AVERAGED cotangent goes through quant_vjp once (VJPs are
         linear, so backprop-of-mean == mean-of-backprops; the one bf16
         rounding of the mean before the vjp is the only numeric delta vs
         stepwise, and the f32 path is summation-order-exact);
      4. clip + AdamW + the f32-master/latent sweep once, as on a stepwise
         cycle boundary.

    Reference semantics preserved: grads averaged over the cycle, clipping
    and Adam applied once per cycle on the averaged gradient (DeepSpeed
    bf16-mode + --gradient_accumulation_steps, train/config/zero.json,
    scripts/train/train.sh:29-37). Requires tc.fused_accum=True so
    make_optimizer skips the per-micro accumulation wrapper (opt state is a
    plain MasterWeightsState — smaller than MasterAccumState by one full
    f32 tree; the accumulator lives in the scan carry instead).
    """
    assert tc.fused_accum, "make_fused_train_step requires tc.fused_accum"
    quantizer = make_quantizer(tc) if tc.quant_type else None
    opt = make_optimizer(tc)
    k = tc.grad_accum
    # weights enter the micro forward already quantized; save_dots/save_qkvo
    # still tag their projection outputs, save_quantized degenerates to full
    fused_remat = (
        tc.remat_policy
        if tc.gradient_checkpointing
        and tc.remat_policy in ("save_dots", "save_qkvo")
        else tc.gradient_checkpointing
    )

    def micro_loss(qparams, batch, beta, teacher):
        return _kd_or_ce_loss(
            cfg, tc, qparams, batch, beta, teacher,
            quantizer=None, student_remat=fused_remat,
        )

    def cycle_step(state: TrainState, batches, beta, teacher=None):
        t = teacher if teacher is not None else teacher_params

        def quant_fn(params):
            if quantizer is None:
                return params
            return llama.quantize_layer_weights(params, quantizer)

        qparams, quant_vjp = jax.vjp(quant_fn, state.params)

        def body(acc, batch):
            loss, g = jax.value_and_grad(micro_loss)(qparams, batch, beta, t)
            acc = jax.tree_util.tree_map(
                lambda a, gg: a + gg.astype(jnp.float32), acc, g
            )
            return acc, loss

        acc0 = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, jnp.float32), qparams
        )
        acc, losses = jax.lax.scan(body, acc0, batches)
        mean_q = jax.tree_util.tree_map(
            lambda a, q: (a / k).astype(q.dtype), acc, qparams
        )
        (grads,) = quant_vjp(mean_q)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        if isinstance(new_opt, MasterWeightsState):
            new_params = jax.tree_util.tree_map(
                lambda m, p: m.astype(p.dtype), new_opt.master, state.params
            )
        else:
            new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(
            jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
        )
        return (
            TrainState(params=new_params, opt_state=new_opt, step=state.step + 1),
            {"loss": losses.mean(), "grad_norm": gnorm, "micro_losses": losses},
        )

    return cycle_step


def make_train_step(
    cfg: mcfg.ModelConfig,
    tc: TrainConfig,
    teacher_params=None,
) -> Callable:
    """Build the jittable (state, batch, beta[, teacher]) -> (state, metrics)
    step.

    batch: dict(input_ids [B,S], labels [B,S], attention_mask [B,S]).
    If teacher_params is None the step trains with plain CE on labels
    (the reference's non-KD branch, train.py:521-522).

    Pass the teacher tree as the step's 4th ARGUMENT for anything bigger
    than a toy model: a closed-over teacher is baked into the jitted HLO as
    constants — gigabytes serialized at trace time and re-uploaded per
    executable on a relay-attached TPU. The build-time `teacher_params`
    closure remains as a convenience for small tests.
    """
    quantizer = make_quantizer(tc) if tc.quant_type else None
    opt = make_optimizer(tc)
    student_remat = _student_remat(tc, quantizer)

    def loss_fn(params, batch, beta, teacher_params):
        return _kd_or_ce_loss(
            cfg, tc, params, batch, beta, teacher_params,
            quantizer=quantizer, student_remat=student_remat,
        )

    def train_step(state: TrainState, batch, beta, teacher=None):
        t = teacher if teacher is not None else teacher_params
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, beta, t)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        if isinstance(new_opt, MasterAccumState):
            # latents move only on cycle boundaries; the cond skips the
            # master->bf16 re-derivation sweep on accumulation micro-steps
            new_params = jax.lax.cond(
                new_opt.count == 0,
                lambda m, p: jax.tree_util.tree_map(
                    lambda mm, pp: mm.astype(pp.dtype), m, p
                ),
                lambda m, p: p,
                new_opt.master, state.params,
            )
        elif isinstance(new_opt, MasterWeightsState):
            # latent = round(master) exactly (the delta-form apply_updates
            # would land within 1 ulp; re-deriving avoids any drift)
            new_params = jax.tree_util.tree_map(
                lambda m, p: m.astype(p.dtype), new_opt.master, state.params
            )
        else:
            new_params = optax.apply_updates(state.params, updates)
        # norm accumulated in f32 (bf16 squares would overflow/underflow; the
        # cast fuses into the reduce, no extra HBM pass)
        gnorm = optax.global_norm(
            jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
        )
        return (
            TrainState(params=new_params, opt_state=new_opt, step=state.step + 1),
            {"loss": loss, "grad_norm": gnorm},
        )

    return train_step


def make_cakld_beta_fn(cfg: mcfg.ModelConfig) -> Callable:
    """Jittable per-batch mean max-prob of the teacher (train.py:497-507).

    Average the returned values over cakld_steps batches, then mean across
    data-parallel shards (the all_reduce at train.py:509-510) — with pjit
    the global mean over a sharded batch IS the all-reduce.
    """

    def batch_mean_prob(teacher_params, batch):
        logits, _ = llama.forward(
            teacher_params, cfg, batch["input_ids"], attn_mask=batch.get("attention_mask")
        )
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.max(prob, axis=-1).mean()

    return batch_mean_prob


def estimate_cakld_beta(teacher_params, cfg, batches, jit_fn=None) -> jnp.ndarray:
    fn = jit_fn or jax.jit(make_cakld_beta_fn(cfg))
    total = 0.0
    n = 0
    for batch in batches:
        total = total + fn(teacher_params, batch)
        n += 1
    return total / max(n, 1)
