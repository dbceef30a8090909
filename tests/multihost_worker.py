"""Worker for the 2-process multi-host smoke test (run via subprocess).

Usage: python multihost_worker.py <coordinator> <num_procs> <pid>
Each process owns 2 virtual CPU devices; the mesh is dp=2 (across processes,
the DCN analogue) x tp=2 (within a process, the ICI analogue). Prints one
line `RESULT <pid> <loss>` that the parent asserts on.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bitdistiller_tpu.models import TINY_TEST, init_params
from bitdistiller_tpu.parallel.distributed import (
    global_batch_from_host,
    host_shard,
    init_distributed,
    make_hybrid_mesh,
)
from bitdistiller_tpu.parallel.mesh import param_specs, shard_params
from bitdistiller_tpu.train import TrainConfig, init_train_state, make_train_step


def main():
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    init_distributed(coordinator, n_proc, pid)
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.device_count() == 2 * n_proc, jax.device_count()

    mesh = make_hybrid_mesh(tp=2)  # dp spans processes, tp stays in-process
    assert mesh.shape == {"dp": n_proc, "tp": 2}, mesh.shape

    cfg = TINY_TEST
    tc = TrainConfig(quant_type="int2-asym", q_group_size=32, total_steps=2,
                     kd_loss_type="cakld")
    with jax.set_mesh(mesh):
        params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
        specs = param_specs(cfg)
        teacher = shard_params(params, mesh, specs)
        state = init_train_state(teacher, tc, mesh=mesh, param_spec_tree=specs,
                                 zero_stage=2)

        # every process contributes ITS OWN rows of the global batch
        rng = np.random.default_rng(7)
        all_rows = rng.integers(0, cfg.vocab_size, (2 * n_proc, 16)).astype(np.int32)
        local = np.asarray(host_shard(list(all_rows)))
        batch = global_batch_from_host(
            {
                "input_ids": local,
                "labels": local,
                "attention_mask": np.ones_like(local),
            },
            mesh,
        )
        assert batch["input_ids"].shape[0] == 2 * n_proc  # global shape

        step = jax.jit(make_train_step(cfg, tc, teacher_params=teacher))
        _, metrics = step(state, batch, jnp.asarray(0.5))
        loss = float(metrics["loss"])
    print(f"RESULT {pid} {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
