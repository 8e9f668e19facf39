"""Pallas kernels in interpreter mode (CPU): byte parity vs the XLA path
and the oracle. On the real chip, scripts/tpu_check.py runs the same
assertions compiled."""

import numpy as np
import pytest

import jax.numpy as jnp

from sdfref import oracle
from chaq_sdfgen_tpu.ops import pallas_edt
from chaq_sdfgen_tpu.models.sdf_model import hard_sdf_exact_from_bool


@pytest.mark.parametrize("shape,spread", [((64, 48), 8), ((40, 140), 5), ((139, 131), 13)])
def test_fused_sdf_bytes_matches_xla(shape, spread):
    rng = np.random.default_rng(spread)
    b = rng.random(shape) < 0.35
    got = pallas_edt.fused_sdf_bytes(jnp.asarray(b), spread, interpret=True)
    want = hard_sdf_exact_from_bool(jnp.asarray(b), spread, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_sdf_bytes_matches_oracle_asymmetric():
    rng = np.random.default_rng(0)
    b = rng.random((48, 40)) < 0.25
    img2ch = np.zeros((48, 40, 2), dtype=np.uint8)
    img2ch[..., 1] = np.where(b, 255, 0)
    want = oracle.sdf_pipeline_openmp(img2ch, spread=10, asymmetric=True, channel=1)
    got = pallas_edt.fused_sdf_bytes(jnp.asarray(b), 10, asymmetric=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_fused_sdf_bytes_batched():
    rng = np.random.default_rng(1)
    b = rng.random((3, 32, 32)) < 0.4
    got = np.asarray(pallas_edt.fused_sdf_bytes(jnp.asarray(b), 6, interpret=True))
    for i in range(3):
        want = np.asarray(hard_sdf_exact_from_bool(jnp.asarray(b[i]), 6, use_pallas=False))
        np.testing.assert_array_equal(got[i], want)


def test_fused_uniform():
    for fill in (True, False):
        b = np.full((16, 16), fill, dtype=bool)
        got = pallas_edt.fused_sdf_bytes(jnp.asarray(b), 5, interpret=True)
        want = hard_sdf_exact_from_bool(jnp.asarray(b), 5, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
