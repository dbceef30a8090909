"""2-process multi-host smoke test: `jax.distributed.initialize` on CPU,
hybrid dp(across processes) x tp(within process) mesh, per-host data shards
assembled into one global batch, one ZeRO-2 KD train step.

This is the reference's "multi-node simulated as multi-process" strategy
(train/hostfile `localhost slots=8`, SURVEY §4) applied to the JAX runtime.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_train_step():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    # drop the axon TPU-relay env: its sitecustomize registers a PJRT plugin
    # at interpreter start, which initializes the backend before
    # jax.distributed.initialize can run
    env = {
        k: v
        for k, v in os.environ.items()
        if k != "XLA_FLAGS" and not k.startswith("PALLAS_AXON")
    }
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    assert set(losses) == {0, 1}, outs
    # identical global program -> identical loss on every process
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
