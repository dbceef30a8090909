"""Native C++ packer vs the JAX reference implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.native import (
    native_available,
    quantize_pack_native,
    unpack_native,
)
from bitdistiller_tpu.quant.packing import quantize_pack_linear, unpack_codes

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for native packlib"
)


@pytest.mark.parametrize("bits,group", [(2, 128), (4, 128), (2, 64)])
def test_native_pack_matches_jax(bits, group):
    rng = np.random.default_rng(0)
    k, n = 256, 96
    w = rng.standard_normal((k, n)).astype(np.float32)
    qw_n, s_n, sz_n = quantize_pack_native(w, bits, group)
    ref = quantize_pack_linear(jnp.asarray(w), bits, group)
    np.testing.assert_allclose(s_n, np.asarray(ref.scales), rtol=1e-6)
    np.testing.assert_allclose(sz_n, np.asarray(ref.szeros), rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(qw_n, np.asarray(ref.qweight))


def test_native_unpack_roundtrip():
    rng = np.random.default_rng(1)
    k, n = 256, 64
    w = rng.standard_normal((k, n)).astype(np.float32)
    qw, _, _ = quantize_pack_native(w, 2, 128)
    codes_native = unpack_native(qw, k, 2, 128)
    codes_jax = np.asarray(unpack_codes(jnp.asarray(qw), 2, 128))
    np.testing.assert_array_equal(codes_native, codes_jax)
    assert codes_native.min() >= 0 and codes_native.max() <= 3


def test_native_multithreaded_consistent():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((1024, 128)).astype(np.float32)
    a = quantize_pack_native(w, 2, 128, n_threads=1)
    b = quantize_pack_native(w, 2, 128, n_threads=4)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
