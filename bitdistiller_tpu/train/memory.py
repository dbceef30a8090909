"""Per-chip HBM estimate for the CAKLD KD-QAT step.

Answers the DeepSpeed-config question (reference train/config/zero.json /
zero3.json: which ZeRO stage does a given model need?) for a dp x tp chip
mesh: teacher + student latents + f32 master/Adam moments + transients, with
each component divided by the mesh axes its sharding spans.

Sharding model (matches pipeline.run_training):
  * zero_stage >= 3: params (teacher AND student latents) fsdp-sharded over
    dp on top of tp -> divided by dp*tp.
  * zero_stage >= 2: optimizer state (f32 master, Adam mu/nu) sharded over
    dp*tp (opt_state_specs extends the param spec over dp).
  * below that, weights divide by tp only; the batch always divides by dp.

Uses jax.eval_shape — no 7B allocation happens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import config as mcfg
from ..models.llama import init_params
from .trainer import TrainConfig

GiB = 1024**3


def param_count(cfg: mcfg.ModelConfig) -> int:
    shapes = jax.eval_shape(lambda k: init_params(cfg, k), jax.random.key(0))
    return sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))


def kd_train_memory_estimate(
    cfg: mcfg.ModelConfig,
    tc: TrainConfig,
    *,
    dp: int = 1,
    tp: int = 1,
    zero_stage: int = 2,
    batch: int = 2,
    seq: int = 1024,
) -> dict:
    """Heuristic per-chip bytes for one KD train step. `batch` is the
    PER-CHIP micro-batch (the reference's per-device train batch size,
    train.sh:29 bs 2). Returns a component dict plus "total" and
    "state_total" (persistent state only)."""
    n = param_count(cfg)
    latent_itemsize = jnp.dtype(tc.param_dtype).itemsize
    has_master = jnp.dtype(tc.param_dtype) != jnp.float32

    param_div = dp * tp if zero_stage >= 3 else tp
    opt_div = dp * tp if zero_stage >= 2 else tp

    teacher = 2 * n / param_div if tc.train_kd else 0  # bf16
    latent = latent_itemsize * n / param_div
    # f32 master (when latents are low precision) + Adam mu/nu f32;
    # optax.MultiSteps adds a persistent f32 grad-accumulation buffer
    opt = ((4 if has_master else 0) + 8
           + (4 if tc.grad_accum > 1 else 0)) * n / opt_div
    # transients -----------------------------------------------------------
    grads = latent_itemsize * n / param_div  # live through the update
    # remat residuals: one activation per layer boundary (+ a few working
    # copies, hence the 2x safety factor)
    acts = 2 * batch * seq * cfg.hidden_size * cfg.num_layers * 2
    # vocab-sized loss transients. cakld routes through the fused
    # analytic-VJP loss (losses.py cakld_loss_fused): only the two bf16
    # logit tensors persist to the backward ([B,S] stats otherwise).
    # Other KD losses go through jax.grad, which saves ~2 f32 log-softmax
    # residuals on top of the logits.
    if tc.kd_loss_type == "cakld":
        logits = 2 * batch * seq * cfg.vocab_size * 2
    else:
        logits = 4 * batch * seq * cfg.vocab_size * 4
    # fake-quant materializes one scanned layer's weight copy in f32
    embed = cfg.vocab_size * cfg.hidden_size
    quant_tmp = 4 * (n - embed) / max(cfg.num_layers, 1) / tp

    out = {
        "params": n,
        "teacher": teacher,
        "latent": latent,
        "opt_state": opt,
        "grads": grads,
        "activations": acts,
        "logits": logits,
        "quant_tmp": quant_tmp,
    }
    out["state_total"] = teacher + latent + opt
    out["total"] = out["state_total"] + grads + acts + logits + quant_tmp
    return out


LLAMA2_7B = mcfg.ModelConfig(
    vocab_size=32000,
    hidden_size=4096,
    intermediate_size=11008,
    num_layers=32,
    num_heads=32,
    num_kv_heads=32,
    max_position_embeddings=4096,
)


def format_estimate(est: dict, label: str = "") -> str:
    parts = ", ".join(
        f"{k} {est[k] / GiB:.2f}"
        for k in ("teacher", "latent", "opt_state", "grads", "activations",
                  "logits", "quant_tmp")
    )
    return (
        f"{label}{est['params'] / 1e9:.2f}B params: "
        f"{est['total'] / GiB:.2f} GiB/chip ({parts})"
    )


# v5e interconnect: ICI ~45 GB/s per link per direction inside a slice;
# DCN (between hosts) planned at ~25 GB/s per host. XLA's latency-hiding
# scheduler overlaps the gradient all-reduce with backward compute; 0.8 is
# a conservative measured-elsewhere default, exposed for sensitivity runs.
V5E_ICI_BW = 45e9
V5E_DCN_BW = 25e9
XLA_OVERLAP = 0.8


def dp_train_scaling(
    cfg: mcfg.ModelConfig,
    tc: TrainConfig,
    *,
    t_step_s: float,
    dp: int,
    tp: int = 1,
    chips_per_host: int = 8,
    ici_bw: float = V5E_ICI_BW,
    dcn_bw: float = V5E_DCN_BW,
    overlap: float = XLA_OVERLAP,
) -> dict:
    """Projected KD-train scaling efficiency over a dp mesh axis.

    Serving twin: serve/capacity.py tp_decode_scaling. The dp train step
    adds exactly one collective family: the per-micro-step gradient
    all-reduce (ZeRO-2 lowers it to reduce-scatter + the post-update param
    all-gather — same ring bytes: 2*(dp-1)/dp of the bf16 gradient tree).
    t_step_s must be a MEASURED (or MFU-derived-from-measured) single-chip
    step; the model only adds communication, never invents speedups.

    Hosts: dp groups of `chips_per_host` ride ICI; the inter-host share of
    the ring rides DCN with each host's chips contributing shards
    (hierarchical all-reduce), so DCN bytes divide by chips_per_host.
    """
    n = param_count(cfg)
    grad_bytes = jnp.dtype(tc.param_dtype).itemsize * n / tp
    if dp == 1:
        return {"dp": 1, "hosts": 1, "t_step_s": t_step_s,
                "t_comm_s": 0.0, "efficiency": 1.0}
    hosts = max((dp * tp + chips_per_host - 1) // chips_per_host, 1)
    ring = 2 * (dp - 1) / dp
    t_ici = ring * grad_bytes / ici_bw
    t_dcn = 0.0
    if hosts > 1:
        inter_ring = 2 * (hosts - 1) / hosts
        t_dcn = inter_ring * grad_bytes / chips_per_host / dcn_bw
    t_comm = (1.0 - overlap) * (t_ici + t_dcn)
    eff = t_step_s / (t_step_s + t_comm)
    return {
        "dp": dp,
        "hosts": hosts,
        "t_step_s": t_step_s + t_comm,
        "t_comm_s": t_comm,
        "efficiency": eff,
    }
