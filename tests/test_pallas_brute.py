"""Pallas BRUTE kernel (interpret mode) vs the XLA scan formulation —
both byte-identical to the OpenCL reference semantics (the XLA path is
oracle-verified in test_brute_parity.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from chaq_sdfgen_tpu.ops import brute
from chaq_sdfgen_tpu.ops.pallas_brute import brute_sdf_bytes_pallas


@pytest.mark.parametrize(
    "shape,spread,asym,inv",
    [
        ((40, 56), 9, False, False),
        ((33, 41), 7, True, True),
        ((64, 30), 17, False, True),
        ((16, 16), 20, False, False),  # spread covers the whole image
    ],
)
def test_pallas_brute_matches_xla(shape, spread, asym, inv):
    rng = np.random.default_rng(hash((shape, spread)) % 2**31)
    b = jnp.asarray(rng.random(shape) < 0.35)
    want = np.asarray(brute.brute_sdf_bytes(b, spread, asym, inv, use_pallas=False))
    got = np.asarray(brute_sdf_bytes_pallas(b, spread, asym, inv, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_brute_uniform_images():
    # all-true / all-false: the ±INF fallback path (opencl/sdf.cl:213-214)
    for val in (True, False):
        b = jnp.full((24, 40), val)
        want = np.asarray(brute.brute_sdf_bytes(b, 8, use_pallas=False))
        got = np.asarray(brute_sdf_bytes_pallas(b, 8, interpret=True))
        np.testing.assert_array_equal(got, want)


def test_pallas_brute_batched():
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.random((3, 24, 32)) < 0.3)
    want = np.asarray(brute.brute_sdf_bytes(b, 6, use_pallas=False))
    got = np.asarray(brute_sdf_bytes_pallas(b, 6, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_brute_rejects_oversized_spread():
    with pytest.raises(ValueError):
        brute_sdf_bytes_pallas(jnp.zeros((8, 8), bool), 255, interpret=True)
