"""Debug + profiling utility tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.utils.debug import assert_tree_finite, checked
from bitdistiller_tpu.utils.profiling import StepTimer, autotune
from bitdistiller_tpu.utils.prompts import render_prompt


def test_checked_raises_on_nan():
    def bad(x):
        return jnp.log(x) * 2.0  # log(-1) -> nan

    f = checked(bad)  # jits internally; must not be re-jitted
    assert np.isfinite(float(f(jnp.asarray(2.0))))
    with pytest.raises(Exception):  # checkify JaxRuntimeError
        f(jnp.asarray(-1.0))


def test_assert_tree_finite_names_leaf():
    tree = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, jnp.nan])}}
    with pytest.raises(ValueError, match="b"):
        assert_tree_finite(tree, "grads")
    assert_tree_finite({"a": jnp.ones(2)})  # clean tree passes


def test_step_timer():
    t = StepTimer()
    f = jax.jit(lambda x: x * 2)
    dt = t.time_fn(f, jnp.ones(128), warmup=1, iters=3)
    assert dt >= 0


def test_autotune_picks_fastest():
    def builder(cfg):
        if cfg == "broken":
            raise RuntimeError("bad config")
        return jax.jit(lambda x: x + cfg)

    best, results = autotune(builder, [1, 2, "broken"], jnp.ones(16), warmup=1, iters=2)
    assert best in (1, 2)
    assert "'broken'" not in results


def test_render_prompt():
    out = render_prompt("llama2", "hi", system="be nice")
    assert "[INST]" in out and "be nice" in out
    assert render_prompt("raw", "plain") == "plain"
    assert render_prompt("falcon", "hi") == "User: hi\nAssistant:"
    assert render_prompt("mpt-chat", "hi").startswith("<|im_start|>system\n")
    assert render_prompt("mpt-chat", "hi").endswith("<|im_start|>assistant\n")
    assert "### Response:" in render_prompt("code", "write fizzbuzz")
    with pytest.raises(ValueError):
        render_prompt("nope", "x")
