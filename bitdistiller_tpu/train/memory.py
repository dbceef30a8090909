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
    # f32 master (when latents are low precision) + Adam mu/nu f32
    opt = ((4 if has_master else 0) + 8) * n / opt_div
    # transients -----------------------------------------------------------
    grads = latent_itemsize * n / param_div  # live through the update
    # remat residuals: one activation per layer boundary (+ a few working
    # copies, hence the 2x safety factor)
    acts = 2 * batch * seq * cfg.hidden_size * cfg.num_layers * 2
    # f32 logits: student + teacher + ~2 softmax/log-softmax temporaries
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
        for k in ("teacher", "latent", "opt_state", "grads", "activations", "logits")
    )
    return (
        f"{label}{est['params'] / 1e9:.2f}B params: "
        f"{est['total'] / GiB:.2f} GiB/chip ({parts})"
    )
