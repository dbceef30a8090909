"""Multi-host bring-up: process initialization, DCN x ICI mesh construction,
and host-local -> global batch assembly.

Reference parity: the deepspeed hostfile launcher (scripts/train/train.sh:24,
train/hostfile) and torchrun DDP generation (data/generation/generate.py:149-
237) boot one NCCL process per GPU. The TPU equivalent is one process per
host: `jax.distributed.initialize` joins the coordination service, every
process sees all devices (`jax.devices()`), and data parallelism spans hosts
over DCN while tensor parallelism stays inside a host's ICI domain.

Collectives are still emitted by XLA from shardings — there is no user-level
NCCL analogue. The reference's `dist.all_reduce` of the CAKLD scalar
(train.py:509-510) falls out for free: once batches are global arrays built
from per-host shards, a jitted global mean IS the cross-host all-reduce.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Join a multi-process JAX run; no-op for single-process use.

    Mirrors the role of `deepspeed --hostfile` / `torchrun --nproc_per_node`
    (process boot + rendezvous). On Cloud TPU the arguments can all be None
    (auto-detected from the TPU metadata); on CPU/GPU pass them explicitly.
    Returns True when running multi-process.
    """
    if (
        coordinator_address is None
        and num_processes is None
        and process_id is None
        and local_device_ids is None
    ):
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    logger.info(
        "distributed init: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def make_hybrid_mesh(tp: int = 1, dp: Optional[int] = None) -> Mesh:
    """(dp, tp) mesh that keeps tp inside a host's ICI domain and lets dp
    span hosts over DCN (scaling-efficiency prerequisite: BASELINE's >=85%
    at 2+ hosts needs tp collectives on ICI, dp grad reduction on DCN).

    Single-process: plain reshape (identical to make_mesh). Multi-process:
    tp must divide the per-host device count so no tp group crosses DCN.
    """
    n = jax.device_count()
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != device count ({n})")
    if jax.process_count() == 1:
        arr = np.asarray(jax.devices()).reshape(dp, tp)
        return Mesh(arr, axis_names=("dp", "tp"))
    local = jax.local_device_count()
    if tp > local or local % tp != 0:
        raise ValueError(
            f"tp={tp} must divide the per-host device count {local} so tensor "
            "collectives stay on ICI"
        )
    dp_ici = local // tp
    dp_dcn = jax.process_count()
    if dp_ici * dp_dcn != dp:
        raise ValueError(
            f"dp={dp} != hosts({dp_dcn}) * per-host-dp({dp_ici}); set dp=None"
        )
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (dp_ici, tp), (dp_dcn, 1), devices=jax.devices()
        )
        return Mesh(arr.reshape(dp, tp), axis_names=("dp", "tp"))
    except ValueError:
        # non-TPU backends (the multi-process CPU smoke path) have no slice
        # topology; group manually: process-major dp, tp within a process
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        arr = np.asarray(devs).reshape(dp_dcn, dp_ici, tp).reshape(dp, tp)
        return Mesh(arr, axis_names=("dp", "tp"))


def global_batch_from_host(batch: dict, mesh: Mesh, *, stacked: bool = False) -> dict:
    """Assemble a GLOBAL dp-sharded batch from each host's local rows.

    Every process passes its own [local_B, ...] numpy batch; the returned
    jax.Arrays have global shape [local_B * process_count, ...] sharded over
    the dp axis. Single-process, this is an ordinary device_put.

    stacked=True: leaves carry a leading micro-batch axis [k, local_B, ...]
    (the fused-accumulation cycle step, trainer.make_fused_train_step) — the
    dp shard moves to axis 1, the k axis stays replicated.
    """
    sharding = NamedSharding(mesh, P(None, "dp") if stacked else P("dp"))
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out


def host_shard(seq, process_id: Optional[int] = None, process_count: Optional[int] = None):
    """This host's contiguous shard of a list (datasets, prompt lists) —
    the DistributedSampler analogue (generate.py:182-190). Keeps every shard
    the same length by dropping the global remainder.
    """
    p = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    if n == 1:
        return seq
    per = len(seq) // n
    if per == 0:
        raise ValueError(f"cannot shard {len(seq)} items over {n} hosts")
    return seq[p * per : (p + 1) * per]
