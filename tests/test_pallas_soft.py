"""Pallas soft-min kernels (interpreter mode) vs the XLA scan implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chaq_sdfgen_tpu.ops import pallas_soft, softsdf


@pytest.mark.parametrize("band,t", [(3, 0.5), (7, 1.5)])
def test_softmin_fwd_kernel_matches_xla(band, t):
    rng = np.random.default_rng(band)
    h, w = 40, 36
    gext = jnp.asarray((rng.random((h + 2 * band, w)) * 30).astype(np.float32))
    got = np.asarray(pallas_soft.softmin_col_fwd(gext, band, t, interpret=True))
    want = np.asarray(softsdf._band_softmin_fwd_impl(gext, band, t, 0))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("band,t", [(3, 0.5), (5, 1.0)])
def test_softmin_bwd_kernel_matches_xla(band, t):
    rng = np.random.default_rng(10 + band)
    h, w = 32, 24
    gext = jnp.asarray((rng.random((h + 2 * band, w)) * 20).astype(np.float32))
    s = softsdf._band_softmin_fwd_impl(gext, band, t, 0)
    ct = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    got = np.asarray(pallas_soft.softmin_col_bwd(gext, s, ct, band, t, interpret=True))
    want, _ = softsdf._band_softmin_ext_bwd(band, 0, None, (gext, jnp.float32(t), s), ct)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-5)


def test_softmin_fwd_saturated_region():
    band, t = 4, 0.5
    gext = jnp.full((30, 16), 1e30, jnp.float32)
    out = np.asarray(pallas_soft.softmin_col_fwd(gext, band, t, interpret=True))
    assert np.isfinite(out).all()
    assert (out > 1e29).all()
