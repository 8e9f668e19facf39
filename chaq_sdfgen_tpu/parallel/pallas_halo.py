"""Row-halo exchange as a Pallas inter-chip RDMA kernel.

The shard_map pipelines default to lax.ppermute (parallel/halo.py) and let
XLA schedule the collective; this module is the hand-rolled ICI path
(SURVEY.md §7 step 7): each chip DMAs its boundary rows directly into its
neighbours' receive buffers with pltpu.make_async_remote_copy and
semaphore signalling — no XLA collective, the transfer can overlap
whatever compute follows kernel issue. Non-periodic: edge chips receive a
sentinel fill instead.

Band <= rows-per-shard exchanges boundary slabs directly (one DMA pair);
larger bands fall back to hop-wise full-block ring shifts (the same
block-chain scheme as halo.exchange_row_halo, with remote DMAs instead of
ppermute). Validated bitwise against the ppermute implementation on the
interpreter backend; on hardware the kernels carry a collective_id like
any Pallas collective.

The exchange carries a custom VJP (the halo gather's transpose is a
reverse exchange plus a boundary scatter-add) so the differentiable soft
pipeline can run on it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_kernel(g_ref, up_ref, down_ref, send_dn, recv_up, send_up, recv_dn, *, band, h_local, axis_name, n):
    """Symmetric periodic ring: every device sends both boundary slabs and
    waits both receives (conditional sends deadlock under SPMD interpret);
    the wrapped edge slabs are overwritten with the boundary sentinel by
    the caller."""
    my = lax.axis_index(axis_name)
    right = lax.rem(my + 1, n)
    left = lax.rem(my + n - 1, n)

    # my BOTTOM rows -> right neighbour's up buffer
    op_dn = pltpu.make_async_remote_copy(
        src_ref=g_ref.at[pl.ds(h_local - band, band), :],
        dst_ref=up_ref,
        send_sem=send_dn,
        recv_sem=recv_up,
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    # my TOP rows -> left neighbour's down buffer
    op_up = pltpu.make_async_remote_copy(
        src_ref=g_ref.at[pl.ds(0, band), :],
        dst_ref=down_ref,
        send_sem=send_up,
        recv_sem=recv_dn,
        device_id=left,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    op_dn.start()
    op_up.start()
    op_dn.wait()
    op_up.wait()


def _slab_exchange(g, band, axis_name, n, interpret):
    """One DMA pair: returns (up, down) = (band, W) slabs received from the
    ring neighbours (periodic; caller masks the wrap-around edges)."""
    h_local, w = g.shape
    kern = functools.partial(
        _halo_kernel, band=band, h_local=h_local, axis_name=axis_name, n=n
    )
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((band, w), g.dtype),
            jax.ShapeDtypeStruct((band, w), g.dtype),
        ],
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True, collective_id=7),
        interpret=interpret,
    )(g)


def _ring_shift_kernel(up_ref, dn_ref, up_out, dn_out, s1, r1, s2, r2, *, axis_name, n):
    """Shift full blocks one step both ways along the periodic ring:
    up chain moves toward higher indices, down chain toward lower."""
    my = lax.axis_index(axis_name)
    right = lax.rem(my + 1, n)
    left = lax.rem(my + n - 1, n)
    op_up = pltpu.make_async_remote_copy(
        src_ref=up_ref, dst_ref=up_out, send_sem=s1, recv_sem=r1,
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    op_dn = pltpu.make_async_remote_copy(
        src_ref=dn_ref, dst_ref=dn_out, send_sem=s2, recv_sem=r2,
        device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    op_up.start()
    op_dn.start()
    op_up.wait()
    op_dn.wait()


def _block_shift_pair(up_blk, dn_blk, axis_name, n, interpret):
    """RDMA analogue of one (ppermute right, ppermute left) pair on full
    local blocks — the hop primitive for band > H_local."""
    kern = functools.partial(_ring_shift_kernel, axis_name=axis_name, n=n)
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(up_blk.shape, up_blk.dtype),
            jax.ShapeDtypeStruct(dn_blk.shape, dn_blk.dtype),
        ],
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True, collective_id=7),
        interpret=interpret,
    )(up_blk, dn_blk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def exchange_row_halo_rdma(
    g: jnp.ndarray,
    band: int,
    axis_name: str,
    fill: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for halo.exchange_row_halo built on Pallas remote DMA.
    Must be called inside shard_map over ``axis_name``; g: (H_local, W).
    Multi-hop (band > H_local) falls back to hop-wise full-block ring
    shifts. Differentiable: the VJP scatter-adds halo cotangents back to
    their owning shards via the reverse exchange."""
    return _rdma_halo_fwd_impl(g, band, axis_name, fill, interpret)


def _rdma_halo_fwd_impl(g, band, axis_name, fill, interpret):
    h_local, w = g.shape
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    fillv = jnp.asarray(fill, g.dtype)
    if n == 1:
        halo = jnp.full((band, w), fillv, g.dtype)
        return jnp.concatenate([halo, g, halo], axis=0)
    if band <= h_local:
        up, down = _slab_exchange(g, band, axis_name, n, interpret)
        up = jnp.where(i == 0, fillv, up)
        down = jnp.where(i == n - 1, fillv, down)
        return jnp.concatenate([up, g, down], axis=0)
    # multi-hop: chain whole blocks like halo.exchange_row_halo
    hops = -(-band // h_local)
    up_parts, down_parts = [], []
    cur_up, cur_dn = g, g
    for hop in range(1, hops + 1):
        cur_up, cur_dn = _block_shift_pair(cur_up, cur_dn, axis_name, n, interpret)
        up_parts.insert(0, jnp.where(i >= hop, cur_up, fillv))
        down_parts.append(jnp.where(i < n - hop, cur_dn, fillv))
    from_up = jnp.concatenate(up_parts, axis=0)[hops * h_local - band :][:band]
    from_down = jnp.concatenate(down_parts, axis=0)[:band]
    return jnp.concatenate([from_up, g, from_down], axis=0)


def _rdma_halo_fwd(g, band, axis_name, fill, interpret):
    return _rdma_halo_fwd_impl(g, band, axis_name, fill, interpret), g.shape


def _rdma_halo_bwd(band, axis_name, fill, interpret, shape, ct):
    # transpose of [gather up-halo | identity | gather down-halo]:
    # dg = ct_center + (cotangents my rows contributed as OTHER shards'
    # halos). My bottom rows fed down-neighbours' up-halos and my top rows
    # fed up-neighbours' down-halos; ship the halo cotangent slabs around
    # the reverse ring and accumulate. Implemented with the same padded
    # block chain (zero fill — cotangent of the boundary sentinel drops).
    h_local, w = shape
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    ct_up = ct[:band]  # my up-halo cotangent: rows owned by shards i-1..i-hops
    ct_dn = ct[band + h_local :]  # rows owned by shards i+1..i+hops
    dg = ct[band : band + h_local]
    zero = jnp.zeros((), ct.dtype)
    hops = -(-band // h_local)
    if n > 1:
        # pad the slabs to full block chains positioned where the rows
        # came from: up_full block j holds the cotangent of shard
        # i-(hops-j)'s rows; dn_full block j-1 holds shard i+j's rows
        up_full = jnp.zeros((hops * h_local, w), ct.dtype).at[hops * h_local - band :].add(ct_up)
        dn_full = jnp.zeros((hops * h_local, w), ct.dtype).at[:band].add(ct_dn)
        for hop in range(1, hops + 1):
            # the hop-h block must travel h ring steps back to its owner;
            # mask fwd-fill blocks at the source (the fwd read the
            # boundary sentinel there, whose cotangent drops)
            blk_u = up_full[(hops - hop) * h_local : (hops - hop + 1) * h_local]
            blk_d = dn_full[(hop - 1) * h_local : hop * h_local]
            blk_u = jnp.where(i >= hop, blk_u, zero)
            blk_d = jnp.where(i < n - hop, blk_d, zero)
            for _ in range(hop):
                # reverse directions vs fwd: up-halo ct rides the
                # toward-lower-index chain and vice versa
                blk_d, blk_u = _block_shift_pair(blk_d, blk_u, axis_name, n, interpret)
            # after `hop` steps I hold shard (i+hop)'s up-ct block (my
            # tail rows) and shard (i-hop)'s down-ct block (my head rows);
            # mask ring wrap-around
            recv_u = jnp.where(i < n - hop, blk_u, zero)
            recv_d = jnp.where(i >= hop, blk_d, zero)
            dg = dg + recv_u + recv_d
    return (dg,)


exchange_row_halo_rdma.defvjp(_rdma_halo_fwd, _rdma_halo_bwd)
