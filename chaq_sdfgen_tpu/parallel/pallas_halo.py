"""Row-halo exchange as a Pallas inter-chip RDMA kernel.

The shard_map pipelines default to lax.ppermute (parallel/halo.py) and let
XLA schedule the collective; this module is the hand-rolled ICI path
(SURVEY.md §7 step 7): each chip DMAs its boundary rows directly into its
neighbours' receive buffers with pltpu.make_async_remote_copy and
semaphore signalling — no XLA collective, the transfer can overlap
whatever compute follows kernel issue. Non-periodic: edge chips receive a
sentinel fill instead.

Single-hop (band <= rows-per-shard); the ppermute implementation remains
the general fallback. Validated bitwise against it on the interpreter
backend; on hardware the kernel carries a collective_id like any
Pallas collective.
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


def exchange_row_halo_rdma(
    g: jnp.ndarray,
    band: int,
    axis_name: str,
    fill: float,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for halo.exchange_row_halo (single-hop case) built on
    Pallas remote DMA. Must be called inside shard_map over ``axis_name``;
    g: (H_local, W) float32 with band <= H_local."""
    h_local, w = g.shape
    if band > h_local:
        raise ValueError(f"rdma halo is single-hop: band {band} > shard rows {h_local}")
    n = lax.axis_size(axis_name)
    kern = functools.partial(
        _halo_kernel, band=band, h_local=h_local, axis_name=axis_name, n=n
    )
    up, down = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
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
    i = lax.axis_index(axis_name)
    fillv = jnp.asarray(fill, g.dtype)
    up = jnp.where(i == 0, fillv, up)
    down = jnp.where(i == lax.axis_size(axis_name) - 1, fillv, down)
    return jnp.concatenate([up, g, down], axis=0)
