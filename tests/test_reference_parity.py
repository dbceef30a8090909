"""Differential parity tests against the ACTUAL reference source.

Every other "parity" test in this suite checks our JAX code against a
hand-written torch restatement of the reference math. These tests instead
import the reference's own functions from /root/reference (read-only,
public content; only pure functions are executed — module import runs
nothing but imports/constant/def statements, verified by inspection) and
assert agreement on random inputs — values AND gradients:

  * pseudo_quantize_tensor / pseudo_quantize_n2f3_tensor
    (quantization/quantizer.py:25-114) vs quant.core fake_quant_int/nf3
  * SteInt2AsymQuantizer / SteInt3AsymQuantizer / SteN2F3Quantizer
    (quantizer.py:116-242) vs fake_quant_int(ste=True) / fake_quant_nf3 —
    including the K-axis transpose-free variants
  * all six KDTrainer losses (train/mytrainer.py:94-198) vs train.losses,
    including the fused analytic-VJP CAKLD's value and gradient
  * auto_2clip_layer (quantization/autoclip.py:13-83) vs
    quant.autoclip.search_layer_clip
  * get_hf_quant_params (train/convert_hf_to_gptq_manual.py:11-70) vs
    models.gptq_export.layer_to_gptq (pre-packing codes/scales/zeros)
"""

from __future__ import annotations

import ast
import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from bitdistiller_tpu.quant.core import (
    fake_quant_int,
    fake_quant_int_kaxis,
    fake_quant_nf3,
    fake_quant_nf3_kaxis,
)

REF = "/root/reference"


# ---------------------------------------------------------------------------
# Reference module loaders (cached per session)
# ---------------------------------------------------------------------------


def _load_ref_module(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def ref_quantizer():
    return _load_ref_module("quantizer", f"{REF}/quantization/quantizer.py")


@pytest.fixture(scope="session")
def ref_mytrainer():
    # mytrainer imports transformers.Trainer at module level (slow, ~15 s,
    # once per session) but defines no other module-level behavior
    if f"{REF}/train" not in sys.path:
        sys.path.insert(0, f"{REF}/train")
    import mytrainer

    return mytrainer


@pytest.fixture(scope="session")
def ref_autoclip(ref_quantizer):
    # autoclip does `from clip_utils import *` and `from quantizer import ...`
    # so both directories must be importable by plain name
    for p in (f"{REF}/quantization",):
        if p not in sys.path:
            sys.path.insert(0, p)
    return _load_ref_module("ref_autoclip", f"{REF}/quantization/autoclip.py")


@pytest.fixture(scope="session")
def ref_get_hf_quant_params():
    """convert_hf_to_gptq_manual.py imports gptqmodel (not installed) and
    prints at module level, so extract only the pure target function by AST."""
    src = open(f"{REF}/train/convert_hf_to_gptq_manual.py").read()
    tree = ast.parse(src)
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "get_hf_quant_params"
    )
    ns = {"torch": torch, "np": np}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "<ref>", "exec"), ns)
    return ns["get_hf_quant_params"]


def _t2j(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(t.detach().cpu().numpy())


def _agree(ours, theirs, atol=1e-6, rtol=1e-5):
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(theirs.detach().cpu().numpy()),
        atol=atol, rtol=rtol,
    )


# ---------------------------------------------------------------------------
# Quantizer values (PTQ path: torch.round / banker's rounding)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_bit,group", [(2, 64), (2, 128), (3, 128), (4, 64), (2, -1)])
def test_pseudo_quantize_tensor_values(ref_quantizer, n_bit, group):
    torch.manual_seed(n_bit * 100 + max(group, 0))
    w = torch.randn(16, 256, dtype=torch.float32)
    theirs = ref_quantizer.pseudo_quantize_tensor(
        w.clone(), n_bit=n_bit, zero_point=True, q_group_size=group
    )
    ours = fake_quant_int(_t2j(w), n_bit, group, ste=False)
    _agree(ours, theirs)


@pytest.mark.parametrize("group", [64, 128])
def test_pseudo_quantize_n2f3_values(ref_quantizer, group):
    torch.manual_seed(group)
    w = torch.randn(16, 256, dtype=torch.float32)
    theirs = ref_quantizer.pseudo_quantize_n2f3_tensor(w.clone(), q_group_size=group)
    ours = fake_quant_nf3(_t2j(w), group, ste=False)
    _agree(ours, theirs)


def test_pseudo_quantize_scale_zero_params(ref_quantizer):
    from bitdistiller_tpu.quant.core import asym_quant_params, _to_groups

    torch.manual_seed(7)
    w = torch.randn(8, 256, dtype=torch.float32)
    _, scales_t, zeros_t = ref_quantizer.pseudo_quantize_tensor(
        w.clone(), n_bit=2, q_group_size=64, get_scale_zp=True
    )
    wg, _ = _to_groups(_t2j(w), 64)
    p = asym_quant_params(wg, 2)
    _agree(p.scales.reshape(-1), scales_t.reshape(-1))
    _agree(p.zeros.reshape(-1), zeros_t.reshape(-1))


# ---------------------------------------------------------------------------
# STE quantizers: values AND gradients
# ---------------------------------------------------------------------------


def _torch_val_grad(module, x):
    xt = x.clone().requires_grad_(True)
    y = module(xt)
    ct = torch.empty_like(y)
    torch.manual_seed(1234)
    ct.normal_()
    (y * ct).sum().backward()
    return y, xt.grad, ct


@pytest.mark.parametrize("bits,group", [(2, 64), (2, 128), (3, 128)])
def test_ste_int_value_and_grad(ref_quantizer, bits, group):
    torch.manual_seed(bits * 10 + group)
    x = torch.randn(8, 256, dtype=torch.float32)
    cls = (
        ref_quantizer.SteInt2AsymQuantizer
        if bits == 2
        else ref_quantizer.SteInt3AsymQuantizer
    )
    y_t, g_t, ct = _torch_val_grad(cls(q_group_size=group), x)

    xj, ctj = _t2j(x), _t2j(ct)
    fn = lambda v: jnp.sum(fake_quant_int(v, bits, group, ste=True) * ctj)
    y_j = fake_quant_int(xj, bits, group, ste=True)
    g_j = jax.grad(fn)(xj)
    _agree(y_j, y_t)
    _agree(g_j, g_t, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("group", [64, 128])
def test_ste_nf3_value_and_grad(ref_quantizer, group):
    torch.manual_seed(group + 5)
    x = torch.randn(8, 256, dtype=torch.float32)
    y_t, g_t, ct = _torch_val_grad(ref_quantizer.SteN2F3Quantizer(q_group_size=group), x)

    xj, ctj = _t2j(x), _t2j(ct)
    fn = lambda v: jnp.sum(fake_quant_nf3(v, group, ste=True) * ctj)
    y_j = fake_quant_nf3(xj, group, ste=True)
    g_j = jax.grad(fn)(xj)
    _agree(y_j, y_t)
    _agree(g_j, g_t, atol=1e-5, rtol=1e-4)


def test_kaxis_variants_match_reference_via_transpose(ref_quantizer):
    """Our [K, N] K-axis-grouped quantizers must equal the reference applied
    to the [N, K] transpose — value and gradient."""
    torch.manual_seed(11)
    x = torch.randn(32, 256, dtype=torch.float32)  # [N, K] in ref orientation
    for ref_mod, ours in [
        (
            ref_quantizer.SteInt2AsymQuantizer(q_group_size=64),
            lambda v: fake_quant_int_kaxis(v, 2, 64, ste=True),
        ),
        (
            ref_quantizer.SteN2F3Quantizer(q_group_size=64),
            lambda v: fake_quant_nf3_kaxis(v, 64, ste=True),
        ),
    ]:
        y_t, g_t, ct = _torch_val_grad(ref_mod, x)
        xj = _t2j(x).T  # ours: [K, N]
        ctj = _t2j(ct).T
        _agree(ours(xj).T, y_t)
        g_j = jax.grad(lambda v: jnp.sum(ours(v) * ctj))(xj)
        _agree(g_j.T, g_t, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# KD losses: values and student-logit gradients vs KDTrainer methods
# ---------------------------------------------------------------------------


def _make_kd(ref_mytrainer):
    kd = ref_mytrainer.KDTrainer.__new__(ref_mytrainer.KDTrainer)
    kd.tmp = 1
    kd.ce_loss_none = torch.nn.CrossEntropyLoss(reduction="none")
    kd.loss_fct_none = torch.nn.CrossEntropyLoss(reduction="none")
    return kd


def _loss_case(seed=0, B=2, S=12, V=64):
    torch.manual_seed(seed)
    sl = torch.randn(B, S, V, dtype=torch.float32)
    tl = torch.randn(B, S, V, dtype=torch.float32)
    labels = torch.randint(0, V, (B, S))
    labels[:, :3] = -100  # masked prefix like real KD batches
    return labels, sl, tl


def _torch_loss_grad(fn, labels, sl, tl, *args):
    s = sl.clone().requires_grad_(True)
    loss = fn(labels, s, tl, *args)
    loss.backward()
    return loss, s.grad


@pytest.mark.parametrize("beta", [0.0, 0.33, 1.0])
def test_cakld_loss_parity(ref_mytrainer, beta):
    from bitdistiller_tpu.train.losses import cakld_loss, cakld_loss_fused

    kd = _make_kd(ref_mytrainer)
    labels, sl, tl = _loss_case(seed=int(beta * 10))
    loss_t, grad_t = _torch_loss_grad(kd.cakld_loss, labels, sl, tl, beta)

    lj, slj, tlj = _t2j(labels), _t2j(sl), _t2j(tl)
    for ours in (cakld_loss, cakld_loss_fused):
        val = ours(lj, slj, tlj, jnp.asarray(beta))
        grad = jax.grad(lambda s: ours(lj, s, tlj, jnp.asarray(beta)))(slj)
        np.testing.assert_allclose(float(val), float(loss_t), rtol=1e-5)
        _agree(grad, grad_t, atol=1e-6, rtol=1e-4)


def test_cakld_fused_beta_grad_parity(ref_mytrainer):
    from bitdistiller_tpu.train.losses import cakld_loss_fused

    kd = _make_kd(ref_mytrainer)
    labels, sl, tl = _loss_case(seed=3)
    beta_t = torch.tensor(0.4, requires_grad=True)
    loss = kd.cakld_loss(labels, sl, tl, beta_t)
    loss.backward()

    g = jax.grad(
        lambda b: cakld_loss_fused(_t2j(labels), _t2j(sl), _t2j(tl), b)
    )(jnp.asarray(0.4))
    np.testing.assert_allclose(float(g), float(beta_t.grad), rtol=1e-4)


def test_jsd_loss_parity(ref_mytrainer):
    from bitdistiller_tpu.train.losses import jsd_loss

    kd = _make_kd(ref_mytrainer)
    labels, sl, tl = _loss_case(seed=4)
    loss_t, grad_t = _torch_loss_grad(kd.jsd_loss, labels, sl, tl, 0.5)
    val = jsd_loss(_t2j(labels), _t2j(sl), _t2j(tl), 0.5)
    grad = jax.grad(lambda s: jsd_loss(_t2j(labels), s, _t2j(tl), 0.5))(_t2j(sl))
    np.testing.assert_allclose(float(val), float(loss_t), rtol=1e-5)
    _agree(grad, grad_t, atol=1e-6, rtol=1e-4)


def test_forward_ce_loss_parity(ref_mytrainer):
    from bitdistiller_tpu.train.losses import forward_kl_loss

    kd = _make_kd(ref_mytrainer)
    labels, sl, tl = _loss_case(seed=5)
    loss_t, grad_t = _torch_loss_grad(kd.ce_loss, labels, sl, tl)
    val = forward_kl_loss(_t2j(labels), _t2j(sl), _t2j(tl), 1.0)
    grad = jax.grad(lambda s: forward_kl_loss(_t2j(labels), s, _t2j(tl), 1.0))(_t2j(sl))
    np.testing.assert_allclose(float(val), float(loss_t), rtol=1e-5)
    _agree(grad, grad_t, atol=1e-6, rtol=1e-4)


def test_reverse_loss_parity(ref_mytrainer):
    from bitdistiller_tpu.train.losses import reverse_kl_loss

    kd = _make_kd(ref_mytrainer)
    labels, sl, tl = _loss_case(seed=6)
    loss_t, grad_t = _torch_loss_grad(kd.re_loss, labels, sl, tl)
    val = reverse_kl_loss(_t2j(labels), _t2j(sl), _t2j(tl))
    grad = jax.grad(lambda s: reverse_kl_loss(_t2j(labels), s, _t2j(tl)))(_t2j(sl))
    np.testing.assert_allclose(float(val), float(loss_t), rtol=1e-5)
    _agree(grad, grad_t, atol=1e-6, rtol=1e-4)


def test_tlsd_loss_parity(ref_mytrainer):
    from bitdistiller_tpu.train.losses import tlsd_loss

    kd = _make_kd(ref_mytrainer)
    # TLSD's CE-of-teacher ignores -100 labels via CrossEntropyLoss(reduction
    # ='none'); keep some masked positions to exercise that path
    labels, sl, tl = _loss_case(seed=7)
    loss_t, grad_t = _torch_loss_grad(kd.TLSD_loss, labels, sl, tl)
    val = tlsd_loss(_t2j(labels), _t2j(sl), _t2j(tl))
    grad = jax.grad(lambda s: tlsd_loss(_t2j(labels), s, _t2j(tl)))(_t2j(sl))
    np.testing.assert_allclose(float(val), float(loss_t), rtol=1e-5)
    _agree(grad, grad_t, atol=1e-6, rtol=1e-4)


def test_mse_loss_parity(ref_mytrainer):
    from bitdistiller_tpu.train.losses import mse_loss

    kd = _make_kd(ref_mytrainer)
    _, sl, tl = _loss_case(seed=8)
    loss_t = kd.mse_loss(sl, tl)
    val = mse_loss(_t2j(sl), _t2j(tl))
    np.testing.assert_allclose(float(val), float(loss_t), rtol=1e-6)


# ---------------------------------------------------------------------------
# AutoClip grid search vs auto_2clip_layer
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("quant_type,n_bit", [("int", 2), ("nf3", 3)])
def test_auto_2clip_layer_parity(ref_autoclip, quant_type, n_bit):
    torch.manual_seed(21 + n_bit)
    CO, CI, G, T = 64, 128, 64, 128
    w = torch.randn(CO, CI, dtype=torch.float32)
    feat = torch.randn(T, CI, dtype=torch.float32)
    q_config = {"q_group_size": G, "quant_type": quant_type}
    # T == n_sample_token so the reference's strided sampling is identity
    bmax_t, bmin_t = ref_autoclip.auto_2clip_layer(
        w.clone(), feat.clone(), n_bit, q_config, n_sample_token=T
    )

    from bitdistiller_tpu.quant.autoclip import search_layer_clip

    bmax_j, bmin_j = search_layer_clip(
        _t2j(w).T,  # ours takes [K, N]
        _t2j(feat),
        quant_type=quant_type,
        n_bit=n_bit,
        group_size=G,
    )
    _agree(bmax_j, bmax_t.squeeze(-1), atol=1e-6, rtol=1e-5)
    _agree(bmin_j, bmin_t.squeeze(-1), atol=1e-6, rtol=1e-5)


# ---------------------------------------------------------------------------
# GPTQ export quant params vs get_hf_quant_params
# ---------------------------------------------------------------------------


def test_gptq_quant_params_parity(ref_get_hf_quant_params):
    torch.manual_seed(31)
    O, I, G, BITS = 32, 128, 64, 2
    lin = torch.nn.Linear(I, O, bias=True, dtype=torch.float32)
    qw_t, scales_t, zeros_t, bias_t = ref_get_hf_quant_params(
        lin, n_bit=BITS, zero_point=True, q_group_size=G
    )
    # reference: qw [O, I] codes, scales [I/G, O], zeros [I/G, O]

    from bitdistiller_tpu.models.gptq_export import (
        layer_to_gptq,
        unpack_gptq_qweight,
    )
    from bitdistiller_tpu.quant.core import quantize_int

    w_kn = _t2j(lin.weight).T  # ours: [K, N] = [I, O]
    codes_g, params = quantize_int(w_kn.T, BITS, G)
    codes = np.asarray(codes_g).reshape(O, I)  # [O, I] like the reference
    np.testing.assert_array_equal(codes, qw_t.detach().numpy().astype(np.int32))
    _agree(np.asarray(params.scales).reshape(O, I // G).T, scales_t)
    np.testing.assert_array_equal(
        np.asarray(params.zeros).reshape(O, I // G).T.astype(np.int32),
        zeros_t.detach().numpy().astype(np.int32),
    )

    # and through the full packed exporter: unpacked qweight must equal the
    # reference codes transposed to GPTQ's [K, N] orientation
    tensors = layer_to_gptq(np.asarray(w_kn), BITS, G)
    unpacked = unpack_gptq_qweight(tensors["qweight"], BITS)  # [K, N]
    np.testing.assert_array_equal(unpacked.T, codes)
    np.testing.assert_allclose(
        tensors["scales"].astype(np.float32),
        scales_t.to(torch.float32).detach().numpy(),
        rtol=1e-3,
    )
