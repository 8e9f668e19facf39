"""Pallas banded cols-conv kernel (ops/pallas_band_conv.py) vs the XLA
window einsum, interpret mode (the suite's Pallas race/parity pattern)."""

import numpy as np
import pytest

import jax.numpy as jnp

from chaq_sdfgen_tpu.ops import pallas_band_conv, soft_mxu


@pytest.mark.parametrize("k", [1, 5, 16])
@pytest.mark.parametrize("shape", [(128, 128), (256, 384), (512, 128)])
def test_cols_conv_matches_einsum(shape, k):
    rng = np.random.default_rng(7)
    e = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    want = soft_mxu._conv_cols(e, soft_mxu._band_matrix(k, 1.7, blk=128), k)
    got = pallas_band_conv.cols_conv(e, k, 1.7, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_cols_conv_geometry_gate():
    e = jnp.zeros((96, 128), jnp.float32)  # 96 % _RS != 0
    assert not pallas_band_conv.cols_conv_ok(e, 5)
    assert not pallas_band_conv.cols_conv_ok(jnp.zeros((128, 128)), 17)  # k > halo
    assert pallas_band_conv.cols_conv_ok(jnp.zeros((128, 256)), 16)
    with pytest.raises(ValueError):
        pallas_band_conv.cols_conv(e, 5, 1.0, True)


def test_cols_conv_zero_boundary():
    """Top/bottom image edges must see zero fill, not the clamped
    neighbour block the BlockSpec index map points at."""
    rng = np.random.default_rng(8)
    e = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    k = 16
    got = np.asarray(pallas_band_conv.cols_conv(e, k, 2.0, True))
    w = np.asarray(soft_mxu._band_matrix(k, 2.0, blk=128))
    # brute-force row 0 and row -1 directly
    en = np.asarray(e)
    taps = np.exp(-(np.arange(-k, k + 1) ** 2) / 2.0)
    top = sum(
        taps[d + k] * en[0 + d] for d in range(0, k + 1)
    )  # rows above 0 are zero
    bot = sum(taps[d + k] * en[255 + d] for d in range(-k, 1))
    np.testing.assert_allclose(got[0], top, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[255], bot, rtol=1e-5, atol=1e-5)
