"""Persistent TPU worker: executes python snippets sent through a FIFO.

The axon TPU tunnel charges a one-time ~4min penalty on the first
device->host transfer of every process; a long-lived worker pays it once.

Usage:
    python scripts/tpu_worker.py /tmp/tpu_fifo /tmp/tpu_out.log &
    printf 'FILE /path/to/snippet.py\n' > /tmp/tpu_fifo
Each snippet runs in a shared namespace (state persists across snippets).
A line 'EXIT' stops the worker. After each snippet the worker prints
'=== DONE <name> ===' or '=== ERROR <name> ===' with the traceback.
"""

import os
import sys
import time
import traceback


def main():
    fifo_path, log_path = sys.argv[1], sys.argv[2]
    if os.path.exists(fifo_path):
        os.unlink(fifo_path)
    os.mkfifo(fifo_path)
    log = open(log_path, "a", buffering=1)
    sys.stdout = log
    sys.stderr = log

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    print(f"[worker] starting on {jax.devices()}", flush=True)
    t0 = time.time()
    float(jax.jit(lambda: jnp.zeros(()) + 1.0)())  # pay the transfer warmup
    print(f"[worker] warmup transfer done in {time.time() - t0:.1f}s", flush=True)
    print("=== READY ===", flush=True)

    ns: dict = {"jax": jax, "jnp": jnp}
    while True:
        with open(fifo_path) as f:  # blocks until a writer appears
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if line == "EXIT":
                    print("[worker] exiting", flush=True)
                    return
                if line.startswith("FILE "):
                    path = line[5:].strip()
                    name = os.path.basename(path)
                    t0 = time.time()
                    try:
                        code = open(path).read()
                        exec(compile(code, path, "exec"), ns)
                        print(f"=== DONE {name} ({time.time()-t0:.1f}s) ===", flush=True)
                    except Exception:
                        traceback.print_exc()
                        print(f"=== ERROR {name} ===", flush=True)


if __name__ == "__main__":
    main()
