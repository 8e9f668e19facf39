"""fused_sdf_bytes_dynamic: one compiled kernel per band bucket must be
byte-identical to the per-spread static pipeline (the banding argument —
taps beyond spread+2 clamp identically through the byte remap)."""
import numpy as np
import jax.numpy as jnp
import pytest

from chaq_sdfgen_tpu.ops import pallas_edt


@pytest.mark.parametrize("asym", [False, True])
def test_dynamic_spread_matches_static(asym):
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.random((96, 200)) < 0.3)
    band = 48  # bucket serving spreads up to 46
    for spread in (3, 17, 30, 46):
        want = np.asarray(
            pallas_edt.fused_sdf_bytes(
                b, spread, asymmetric=asym, band=band, interpret=True
            )
        )
        got = np.asarray(
            pallas_edt.fused_sdf_bytes_dynamic(
                b, jnp.int32(spread), band=band, asymmetric=asym, interpret=True
            )
        )
        assert (got == want).all(), (spread, asym, int((got != want).sum()))


def test_dynamic_spread_batched():
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.random((3, 64, 96)) < 0.4)
    want = np.asarray(
        pallas_edt.fused_sdf_bytes(b, 20, band=32, interpret=True)
    )
    got = np.asarray(
        pallas_edt.fused_sdf_bytes_dynamic(b, jnp.int32(20), band=32, interpret=True)
    )
    assert (got == want).all()


def test_dynamic_spread_one_compile():
    # same traced program across spreads: jit cache must not grow
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.random((64, 64)) < 0.3)
    f = pallas_edt.fused_sdf_bytes_dynamic
    f(b, jnp.int32(5), band=32, interpret=True)
    misses0 = f._cache_size()
    f(b, jnp.int32(9), band=32, interpret=True)
    f(b, jnp.int32(30), band=32, interpret=True)
    assert f._cache_size() == misses0
