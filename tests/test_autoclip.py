"""AutoClip search tests: the searched clip must not increase (and usually
decreases) the layer-output MSE vs the unclipped quantized weight, matching
the objective of reference autoclip.py:13-83."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.models import TINY_TEST, forward, init_params
from bitdistiller_tpu.quant.autoclip import (
    apply_clip_cache,
    apply_clip_to_weight,
    load_clip_cache,
    run_autoclip,
    save_clip_cache,
    search_layer_clip,
)
from bitdistiller_tpu.quant import fake_quant_int

# Integration tier: this whole module is `-m slow` (many multi-second
# XLA CPU compiles). The default `-m 'not slow'` tier keeps the unit /
# parity / kernel tests for a minutes-scale pre-commit run; run the
# full suite (no -m filter) before shipping engine/trainer changes.
pytestmark = pytest.mark.slow



def quant_mse(w_kn, feat, bmax=None, bmin=None, g=64):
    w = jnp.asarray(w_kn)
    if bmax is not None:
        w = apply_clip_to_weight(w, jnp.asarray(bmax), jnp.asarray(bmin))
    wq = fake_quant_int(w.T, 2, g).T  # group along K
    out = feat @ wq
    ref = feat @ jnp.asarray(w_kn)
    return float(jnp.mean((out - ref) ** 2))


def test_search_reduces_quant_mse():
    rng = np.random.default_rng(0)
    k, n, t = 128, 32, 64
    w = rng.standard_normal((k, n)).astype(np.float32)
    # heavy-tailed outliers make clipping profitable
    w[rng.integers(0, k, 10), rng.integers(0, n, 10)] *= 8
    feat = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32))

    bmax, bmin = search_layer_clip(
        jnp.asarray(w), feat, quant_type="int", n_bit=2, group_size=64
    )
    assert bmax.shape == (n, k // 64)
    mse_unclipped = quant_mse(w, feat)
    mse_clipped = quant_mse(w, feat, bmax, bmin)
    assert mse_clipped <= mse_unclipped * 1.001
    assert mse_clipped < mse_unclipped * 0.95  # outliers should clip away


def test_search_nf3_runs():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((128, 16)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    bmax, bmin = search_layer_clip(w, feat, quant_type="nf3", n_bit=3, group_size=64)
    assert np.isfinite(np.asarray(bmax)).all()
    assert (np.asarray(bmax) >= np.asarray(bmin)).all()


def test_run_autoclip_end_to_end(tmp_path):
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    calib = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 32)).astype(np.int32)

    result = run_autoclip(
        params, cfg, calib, quant_type="int", n_bit=2, group_size=64,
        n_sample_token=32,
    )
    clip = result["clip"]
    assert set(clip.keys()) == {0, 1}
    assert set(clip[0].keys()) == {"v", "o", "gate", "up", "down"}

    # clipped params still produce finite logits
    logits, _ = forward(result["params"], cfg, jnp.asarray(calib[:1, :8]))
    assert np.isfinite(np.asarray(logits)).all()

    # q/k untouched
    np.testing.assert_array_equal(
        np.asarray(result["params"]["layers"]["q"]["w"]),
        np.asarray(params["layers"]["q"]["w"]),
    )
    # clipped weight magnitudes never exceed originals
    w0 = np.asarray(params["layers"]["down"]["w"])
    w1 = np.asarray(result["params"]["layers"]["down"]["w"])
    assert (np.abs(w1) <= np.abs(w0) + 1e-6).all()
    assert not np.allclose(w0, w1)

    # cache round-trip + apply parity
    path = str(tmp_path / "clip.npz")
    save_clip_cache(path, clip)
    loaded = load_clip_cache(path)
    reparams = apply_clip_cache(params, loaded)
    np.testing.assert_allclose(
        np.asarray(reparams["layers"]["down"]["w"]), w1, rtol=1e-6, atol=1e-6
    )
