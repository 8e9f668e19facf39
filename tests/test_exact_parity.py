"""Hard-mode EXACT pipeline parity: byte-for-byte vs the NumPy oracle (and
hence vs the reference OpenMP binary / golden sample). BASELINE config 1."""

import numpy as np
import pytest

import jax.numpy as jnp

from sdfref import oracle
from chaq_sdfgen_tpu.models.sdf_model import hard_sdf_exact, hard_sdf_exact_from_bool
from chaq_sdfgen_tpu.ops import edt


def test_exact_matches_golden_sample(sample_input_2ch, sample_golden):
    out = hard_sdf_exact(
        jnp.asarray(sample_input_2ch),
        spread=100,
        asymmetric=True,
        channel=0,
        test_above=True,
        use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(out), sample_golden)


@pytest.mark.parametrize("spread", [1, 3, 16, 64])
@pytest.mark.parametrize("asymmetric", [False, True])
def test_exact_matches_oracle_random(spread, asymmetric):
    rng = np.random.default_rng(42 + spread)
    b = rng.random((48, 40)) < 0.3
    img2ch = np.zeros((48, 40, 2), dtype=np.uint8)
    img2ch[..., 1] = np.where(b, 255, 0)
    want = oracle.sdf_pipeline_openmp(img2ch, spread=spread, asymmetric=asymmetric, channel=1)
    got = hard_sdf_exact(
        jnp.asarray(img2ch), spread=spread, asymmetric=asymmetric, channel=1, use_pallas=False
    )
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize(
    "shape", [(1, 1), (1, 17), (17, 1), (5, 64), (64, 5), (33, 47)]
)
def test_exact_degenerate_and_nonsquare(shape):
    rng = np.random.default_rng(7)
    b = rng.random(shape) < 0.4
    img2ch = np.zeros(shape + (2,), dtype=np.uint8)
    img2ch[..., 1] = np.where(b, 200, 20)
    want = oracle.sdf_pipeline_openmp(img2ch, spread=8, asymmetric=False, channel=1)
    got = hard_sdf_exact(jnp.asarray(img2ch), spread=8, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_exact_uniform_images():
    # uniform true and uniform false: one EDT field is all-INF in the
    # reference; our finite sentinel must clamp to the same bytes.
    for fill, spread, asym in [(255, 16, False), (0, 16, False), (255, 7, True), (0, 7, True)]:
        img2ch = np.full((12, 9, 2), fill, dtype=np.uint8)
        want = oracle.sdf_pipeline_openmp(img2ch, spread=spread, asymmetric=asym, channel=1)
        got = hard_sdf_exact(jnp.asarray(img2ch), spread=spread, asymmetric=asym, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_invert_flag_matches_oracle():
    rng = np.random.default_rng(3)
    img2ch = (rng.random((20, 20, 2)) * 255).astype(np.uint8)
    want = oracle.sdf_pipeline_openmp(img2ch, spread=10, channel=1, test_above=False)
    got = hard_sdf_exact(jnp.asarray(img2ch), spread=10, channel=1, test_above=False, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_luminance_channel_matches_oracle():
    rng = np.random.default_rng(4)
    img2ch = (rng.random((20, 20, 2)) * 255).astype(np.uint8)
    want = oracle.sdf_pipeline_openmp(img2ch, spread=10, channel=0)
    got = hard_sdf_exact(jnp.asarray(img2ch), spread=10, channel=0, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_row_nearest_sq_exact():
    rng = np.random.default_rng(5)
    b = rng.random((8, 30)) < 0.25
    band = 31
    got = np.asarray(edt.row_nearest_sq(jnp.asarray(b), band))
    big = edt.big_sentinel(band)
    for y in range(b.shape[0]):
        xs = np.nonzero(b[y])[0]
        for x in range(b.shape[1]):
            if len(xs) == 0:
                want = big
            else:
                d = np.abs(xs - x).min()
                want = min(d * d, big)
            assert got[y, x] == want, (y, x)


def test_batched_leading_dims():
    rng = np.random.default_rng(6)
    imgs = (rng.random((3, 16, 16, 2)) * 255).astype(np.uint8)
    batched = hard_sdf_exact(jnp.asarray(imgs), spread=6, use_pallas=False)
    for i in range(3):
        single = hard_sdf_exact(jnp.asarray(imgs[i]), spread=6, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(batched[i]), np.asarray(single))


@pytest.mark.parametrize("spread", [300, 1024])
def test_exact_large_spread_u16_strips(spread):
    """band > 253 routes through u16 row-distance strips + wide-group
    adaptive pass 2 (the reference EDT is spread-independent,
    openmp/df.c:29-136); still byte-exact at any -s."""
    from chaq_sdfgen_tpu.ops import pallas_edt

    rng = np.random.default_rng(spread)
    b = rng.random((256, 250)) < 0.02  # sparse: large distances live
    inside = oracle.felzenszwalb_edt_2d(oracle.bool_to_indicator(b, True))
    outside = oracle.felzenszwalb_edt_2d(oracle.bool_to_indicator(b, False))
    want = oracle.float_to_byte(
        oracle.signed_merge(outside, inside), spread, False
    )
    got = pallas_edt.fused_sdf_bytes(jnp.asarray(b), spread, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_exact_large_spread_single_seed():
    from chaq_sdfgen_tpu.ops import pallas_edt

    b = np.zeros((200, 130), bool)
    b[5, 7] = True
    inside = oracle.felzenszwalb_edt_2d(oracle.bool_to_indicator(b, True))
    outside = oracle.felzenszwalb_edt_2d(oracle.bool_to_indicator(b, False))
    want = oracle.float_to_byte(
        oracle.signed_merge(outside, inside), 300, True
    )
    got = pallas_edt.fused_sdf_bytes(
        jnp.asarray(b), 300, asymmetric=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("spread", [638])
def test_exact_spread_band_multiple_of_128(spread):
    """Regression (r4 advisor): band = spread + 2 a multiple of 128 made
    row_off == band, which the looped pass-2 kernel rejected at trace time
    ('needs row_off >= band+8') on valid inputs. fused_sdf_bytes must
    request the +8 strip headroom like the dynamic variant; bytes stay
    identical (pass 2 re-clips to band+1)."""
    from chaq_sdfgen_tpu.ops import pallas_edt

    rng = np.random.default_rng(spread)
    b = rng.random((64, 80)) < 0.02
    inside = oracle.felzenszwalb_edt_2d(oracle.bool_to_indicator(b, True))
    outside = oracle.felzenszwalb_edt_2d(oracle.bool_to_indicator(b, False))
    want = oracle.float_to_byte(
        oracle.signed_merge(outside, inside), spread, False
    )
    got = pallas_edt.fused_sdf_bytes(jnp.asarray(b), spread, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)
