"""Numerics debugging: NaN/Inf detection for training.

The reference installs forward/backward NaN hooks on every module when
BITDISTILLER_DEBUG=1 (train/train.py:300-376, mytrainer.py:36-79). The JAX
analogue: `jax.debug_nans` config for tracebacks, plus `checked(fn)` which
wraps a jitted step with checkify so NaN/Inf in any intermediate raises with
the source location, and `assert_tree_finite` for explicit checkpoints.

Enable via env: BITDISTILLER_DEBUG=1 (read by train/pipeline.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import checkify

DEBUG = os.environ.get("BITDISTILLER_DEBUG", "0") == "1"


def checked(fn, jit: bool = True):
    """Wrap a function so float-error checks (nan/inf/div/oob) raise eagerly.

    Returns an already-jitted callable — do NOT wrap it in jax.jit again
    (check_error must run outside the staged computation). Errors surface
    with the offending primitive's source line instead of propagating NaNs.
    """
    inner = jax.jit(fn) if jit else fn
    cfn = checkify.checkify(inner, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_tree_finite(tree, name: str = "tree"):
    """Host-side check: raise ValueError naming every non-finite leaf."""
    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                n_bad = int((~jnp.isfinite(leaf)).sum())
                bad.append(f"{jax.tree_util.keystr(path)}: {n_bad} non-finite")

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise ValueError(f"NaN or Inf detected in {name}:\n  " + "\n  ".join(bad))


def tap_check(x, name: str = "tensor"):
    """In-jit NaN check that prints from device (jax.debug) when DEBUG."""
    if not DEBUG:
        return x
    finite = jnp.isfinite(x).all()
    jax.debug.print(
        "[debug] {name} finite={f} max|x|={m:.3e}",
        name=name, f=finite, m=jnp.abs(x).max(),
    )
    return x
