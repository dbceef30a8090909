from .losses import (
    IGNORE_INDEX,
    cakld_loss,
    forward_kl_loss,
    jsd_loss,
    kd_loss,
    mse_loss,
    reverse_kl_loss,
    tlsd_loss,
)
from .trainer import (
    TrainConfig,
    TrainState,
    estimate_cakld_beta,
    init_train_state,
    make_cakld_beta_fn,
    make_optimizer,
    make_train_step,
)
from .data import Collator, SupervisedDataset, data_loader, load_teacher_jsonl

__all__ = [
    "IGNORE_INDEX",
    "cakld_loss",
    "forward_kl_loss",
    "jsd_loss",
    "kd_loss",
    "mse_loss",
    "reverse_kl_loss",
    "tlsd_loss",
    "TrainConfig",
    "TrainState",
    "estimate_cakld_beta",
    "init_train_state",
    "make_cakld_beta_fn",
    "make_optimizer",
    "make_train_step",
    "Collator",
    "SupervisedDataset",
    "data_loader",
    "load_teacher_jsonl",
]
