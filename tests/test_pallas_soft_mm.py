"""Fully-fused collapsed-mm soft kernels (ops/pallas_soft_mm.py) vs the
einsum cascade (ops/soft_mxu.py), in interpret mode on CPU.

The fused kernels must match the einsum path to float tolerance (same
math, same global shift, different evaluation order), and the sharded
split must be BITWISE equal to the unsharded kernels — every strip does
identical arithmetic; only the halo source changes."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from chaq_sdfgen_tpu.ops import pallas_soft_mm as PM
from chaq_sdfgen_tpu.ops import soft_mxu

from conftest import needs_devices

TAU, T, EPS = 2.0, 1.0, 1e-6


def _fused(gray, band, **kw):
    return PM.soft_field_mm_fused(gray, band, TAU, T, EPS, interpret=True, **kw)


def _einsum(gray, band, **kw):
    return soft_mxu.soft_sdf_field_mxu(gray, band, TAU, T, EPS, interpret=True, **kw)


@pytest.mark.parametrize("shape,spread", [((256, 256), 14), ((129, 130), 9), ((384, 260), 20)])
def test_fused_matches_einsum(shape, spread):
    rng = np.random.default_rng(3)
    gray = jnp.asarray((rng.random(shape) * 255).astype(np.float32))
    band = spread + 2
    assert PM.soft_field_mm_ok(gray, band, TAU, T, (0.0, 255.0))
    got = _fused(gray, band)
    want = _einsum(gray, band)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=0)


def test_fused_gradient_matches_einsum():
    rng = np.random.default_rng(5)
    gray = jnp.asarray((rng.random((200, 190)) * 255).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((200, 190)).astype(np.float32))
    band = 16
    g1 = jax.grad(lambda g: jnp.sum(w * _fused(g, band)))(gray)
    g2 = jax.grad(lambda g: jnp.sum(w * _einsum(g, band)))(gray)
    scale = float(jnp.max(jnp.abs(g2)))
    err = float(jnp.max(jnp.abs(g1 - g2)))
    assert err / scale < 1e-4, (err, scale)


def test_fused_inverted():
    rng = np.random.default_rng(6)
    gray = jnp.asarray((rng.random((200, 190)) * 255).astype(np.float32))
    got = _fused(gray, 16, test_above=False)
    want = _einsum(gray, 16, test_above=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=0)


def test_fused_vmap_bitwise():
    rng = np.random.default_rng(9)
    g3 = jnp.asarray((rng.random((3, 256, 128)) * 255).astype(np.float32))
    f = lambda g: _fused(g, 16)
    out = jax.vmap(f)(g3)
    ref = jnp.stack([f(g3[i]) for i in range(3)])
    assert float(jnp.max(jnp.abs(out - ref))) == 0.0


def test_sharded_bitwise_fwd_and_grad():
    needs_devices(4)
    rng = np.random.default_rng(7)
    H, W = 512, 256
    gray = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    wloss = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
    band = 16
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("y",))

    def local(gblk):
        return PM.sharded_local_mm_fused(
            gblk, band, TAU, T, EPS, True, (0.0, 255.0), "y", W,
            interpret=True, vma=None,
        )

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(P("y", None),), out_specs=P("y", None),
        check_vma=False,
    )
    got = np.asarray(sharded(gray))
    want = np.asarray(_fused(gray, band))
    np.testing.assert_array_equal(got, want)

    g1 = jax.grad(lambda g: jnp.sum(wloss * sharded(g)))(gray)
    g2 = jax.grad(lambda g: jnp.sum(wloss * _fused(g, band)))(gray)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_geometry_gate():
    gray = jnp.zeros((64, 64), jnp.float32)  # too short for any strip grid
    # padded to 256 rows -> ok; k out of range -> not ok
    assert PM.soft_field_mm_ok(gray, 18, TAU, T, (0.0, 255.0))
    assert not PM.soft_field_mm_ok(gray, 18, TAU, T, None)
    # huge temperature pushes k beyond the 16-row halo
    assert not PM.soft_field_mm_ok(gray, 300, 2.0, 8.0, (0.0, 255.0))


def test_fused_matches_composed_reference():
    """End-to-end guard against drift: the fused kernel vs the composed
    scan path (the oracle for the whole soft family)."""
    from chaq_sdfgen_tpu.ops import softsdf
    import os

    rng = np.random.default_rng(11)
    gray = jnp.asarray((rng.random((256, 256)) * 255).astype(np.float32))
    spread = 14
    got = _fused(gray, spread + 2)
    old = dict(os.environ)
    os.environ["CHAQ_SOFT_FUSED"] = "0"
    try:
        want = softsdf.soft_sdf_field(gray, spread, tau=TAU, temperature=T, eps=EPS)
    finally:
        os.environ.clear()
        os.environ.update(old)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=0)


def _composed(gray, spread, band=None):
    import os
    from chaq_sdfgen_tpu.ops import softsdf

    old = dict(os.environ)
    os.environ["CHAQ_SOFT_FUSED"] = "0"
    try:
        return softsdf.soft_sdf_field(
            gray, spread, tau=TAU, temperature=T, eps=EPS, band=band
        )
    finally:
        os.environ.clear()
        os.environ.update(old)


def test_rt_shift_matches_composed_u8_range():
    """Runtime-shift kernel on an (undeclared) u8-range image: the shift
    rides as a traced SMEM scalar, result matches the composed oracle."""
    rng = np.random.default_rng(31)
    gray = jnp.asarray((rng.random((256, 200)) * 255).astype(np.float32))
    band = 16
    labs = jnp.max(jnp.abs(gray - 127.5)) / TAU
    shift = jnp.maximum(jnp.float32(T) * jax.nn.softplus(labs) - 60.0 * T, 0.0)
    got = PM.soft_field_mm_rt(gray, shift, band, TAU, T, EPS, interpret=True)
    want = _composed(gray, band - 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=0)


def test_rt_shift_wide_range_input():
    """Values ~2x outside [0,255] (a mid-training image): still inside
    the runtime gate's gamut; matches the composed path, gradient too."""
    rng = np.random.default_rng(33)
    gray = jnp.asarray((rng.random((256, 128)) * 550.0 - 150.0).astype(np.float32))
    band = 18
    t = float(T)
    labs = jnp.max(jnp.abs(gray - 127.5)) / TAU
    h_max = jnp.float32(t) * jax.nn.softplus(labs)
    assert float(h_max) <= min(140.0 * t, 16 * 16 - 36.0 * t)  # gate would pass
    shift = jnp.maximum(h_max - 60.0 * t, 0.0)
    got = PM.soft_field_mm_rt(gray, shift, band, TAU, T, EPS, interpret=True)
    want = _composed(gray, band - 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=0)

    w = jnp.asarray(rng.standard_normal(gray.shape).astype(np.float32))
    g1 = jax.grad(
        lambda g: jnp.sum(w * PM.soft_field_mm_rt(g, shift, band, TAU, T, EPS, interpret=True))
    )(gray)
    g2 = jax.grad(lambda g: jnp.sum(w * _composed(g, band - 2)))(gray)
    scale = float(jnp.max(jnp.abs(g2)))
    assert float(jnp.max(jnp.abs(g1 - g2))) / scale < 2e-3


def test_rt_gate_rejects_extreme_range():
    """The dispatch limit: h_max beyond the f32 global-shift gamut must
    keep the adaptive kernels (checked via the gate arithmetic)."""
    t = 1.0
    limit = min(140.0 * t, 16 * 16 - 36.0 * t)
    gray = np.array([[2000.0]], np.float32)  # |l| ~ 936 -> h_max ~ 936
    labs = abs(2000.0 - 127.5) / 2.0
    h_max = t * np.log1p(np.exp(-abs(labs))) + t * max(labs, 0.0)
    assert h_max > limit


def test_prec_high_3pass_close_to_highest():
    """CHAQ_SOFT_MXU_PREC=high (manual bf16 hi/lo 3-pass — Mosaic has no
    HIGH lowering for in-kernel dots) must track the 6-pass HIGHEST
    default to the documented tolerance: ~2e-4 relative forward, grads
    within a few percent of scale at sigmoid-knee pixels. Measured on
    chip: 2.19 vs 2.89 ms fwd+bwd at 4K (-24%)."""
    rng = np.random.default_rng(21)
    gray = jnp.asarray((rng.random((256, 256)) * 255).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    band = 16
    old = PM._PREC_HIGH
    try:
        outs = {}
        for mode in (False, True):
            PM._PREC_HIGH = mode
            jax.clear_caches()
            outs[mode] = (
                np.asarray(_fused(gray, band)),
                np.asarray(
                    jax.grad(lambda g: jnp.sum(w * _fused(g, band)))(gray)
                ),
            )
    finally:
        PM._PREC_HIGH = old
        jax.clear_caches()
    fwd_hi, grad_hi = outs[False]
    fwd_3p, grad_3p = outs[True]
    fscale = np.abs(fwd_hi).max()
    gscale = np.abs(grad_hi).max()
    assert np.abs(fwd_3p - fwd_hi).max() < 2e-3 * fscale
    assert np.abs(grad_3p - grad_hi).max() < 0.08 * gscale
