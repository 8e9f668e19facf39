"""Pallas remote-DMA halo exchange vs the ppermute implementation
(interpreter backend on the 8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from chaq_sdfgen_tpu.parallel import mesh as meshlib
from chaq_sdfgen_tpu.parallel.halo import exchange_row_halo
from chaq_sdfgen_tpu.parallel.pallas_halo import exchange_row_halo_rdma


from conftest import needs_devices

@pytest.mark.parametrize("n,band", [(4, 3), (8, 8)])
def test_rdma_halo_matches_ppermute(n, band):
    rng = np.random.default_rng(n)
    h, w = 8 * n, 128
    g = jnp.asarray(rng.random((h, w)).astype(np.float32))
    needs_devices(n)
    mesh = meshlib.make_mesh((n,), ("y",))
    fill = 123.5

    def via_rdma(blk):
        return exchange_row_halo_rdma(blk, band, "y", fill, True)

    def via_ppermute(blk):
        return exchange_row_halo(blk, band, "y", fill)

    spec = P("y", None)
    # extended blocks stay per-device; return as a stacked leading axis
    out_spec = P("y", None)
    r1 = jax.jit(
        jax.shard_map(via_rdma, mesh=mesh, in_specs=(spec,), out_specs=out_spec,
                      check_vma=False)
    )(g)
    r2 = jax.jit(
        jax.shard_map(via_ppermute, mesh=mesh, in_specs=(spec,), out_specs=out_spec,
                      check_vma=False)
    )(g)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


@pytest.mark.parametrize("band", [9, 17])
def test_rdma_halo_multihop_matches_ppermute(band):
    # band > 8-row shards: the hop-wise full-block RDMA chain must agree
    # with the multi-hop ppermute halo bitwise
    rng = np.random.default_rng(band)
    needs_devices(8)
    mesh = meshlib.make_mesh((8,), ("y",))
    g = jnp.asarray(rng.random((64, 128)).astype(np.float32))
    fill = -7.25

    def via_rdma(blk):
        return exchange_row_halo_rdma(blk, band, "y", fill, True)

    def via_ppermute(blk):
        return exchange_row_halo(blk, band, "y", fill)

    spec = P("y", None)
    r1 = jax.jit(
        jax.shard_map(via_rdma, mesh=mesh, in_specs=(spec,), out_specs=spec,
                      check_vma=False)
    )(g)
    r2 = jax.jit(
        jax.shard_map(via_ppermute, mesh=mesh, in_specs=(spec,), out_specs=spec,
                      check_vma=False)
    )(g)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
