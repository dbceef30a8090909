"""Worker for the 2-process multi-host SERVING smoke test (run via
subprocess).

Usage: python multihost_engine_worker.py <coordinator> <num_procs> <pid>

Each process owns 2 virtual CPU devices. The mesh is dp=2 (across processes,
the DCN analogue — KV-cache SLOTS shard over it) x tp=2 (within a process —
packed weights + KV heads shard over it). Every process runs the SAME engine
loop over the same requests (SPMD serving): admission groups, growing cache
buckets, per-horizon host fetches of globally-sharded token arrays all
execute under process_count > 1. Prints one line `RESULT <pid> <json>` with
the greedy outputs; the parent asserts cross-process equality and parity
with an unsharded single-process engine.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.sharding import NamedSharding

from bitdistiller_tpu.models import TINY_TEST, init_params
from bitdistiller_tpu.models.quantized import pack_model
from bitdistiller_tpu.parallel.distributed import init_distributed, make_hybrid_mesh
from bitdistiller_tpu.parallel.mesh import kv_cache_specs, shard_packed_model
from bitdistiller_tpu.serve import Engine, SamplingParams

PROMPTS = [[3, 5, 7], [11, 13, 17, 19], [2, 4, 6, 8, 10], [9, 9, 9], [6, 6]]
MAX_NEW = 24  # crosses the 64-token cache bucket: growth happens mid-serve


def main():
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    init_distributed(coordinator, n_proc, pid)
    assert jax.process_count() == n_proc

    mesh = make_hybrid_mesh(tp=2)  # dp spans processes
    cfg = type(TINY_TEST)(**{**TINY_TEST.__dict__, "dtype": "float32"})
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    packed = pack_model(params, cfg, bits=4, group_size=64, fuse=False)
    with jax.set_mesh(mesh):
        sharded = shard_packed_model(packed, mesh, cfg)
        eng = Engine(sharded, cfg, max_slots=4, max_len=128,
                     sampling=SamplingParams(temperature=0.0),
                     eos_token_id=None, cache_dtype=jnp.float32)
        eng.cache = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            eng.cache, kv_cache_specs(),
        )
        # 5 requests over 4 slots: continuous batching re-admits mid-flight
        out = eng.generate(PROMPTS, max_new_tokens=MAX_NEW)
        assert not eng.cache.k.sharding.is_fully_replicated
    print(f"RESULT {pid} {json.dumps(out)}", flush=True)


if __name__ == "__main__":
    main()
