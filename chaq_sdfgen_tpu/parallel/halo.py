"""ICI halo exchange for banded column passes (inside shard_map).

The reference assumes shared memory (openmp/df.c reads any row freely);
across chips, pass 2 needs each shard's top/bottom ``band`` rows from its
mesh neighbours. Halos ride the ICI ring via lax.ppermute; when the band
exceeds one shard's height, multiple hops gather further neighbours (the
general case for small shards / large spreads). Edge shards read the
boundary sentinel instead (non-periodic image)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def exchange_row_halo(g: jnp.ndarray, band: int, axis_name: str, fill: float) -> jnp.ndarray:
    """g: (..., H_local, W) inside shard_map, sharded over ``axis_name``.
    Returns (..., H_local + 2*band, W) with neighbour halos attached.

    hop h moves whole local blocks h shards along the ring; shard i's hop-h
    block is shard (i-h)'s data (or (i+h) downward). ppermute delivers zeros
    to non-receiving edge shards; an axis_index mask rewrites those to
    ``fill``. ceil(band / H_local) hops cover any band."""
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    yax = g.ndim - 2
    h_local = g.shape[yax]
    fillv = jnp.asarray(fill, g.dtype)
    hops = -(-band // h_local)  # ceil

    def take_rows(x, start, size):
        return lax.slice_in_dim(x, start, start + size, axis=yax)

    # blocks above: [i-hops, ..., i-1] then keep the last `band` rows
    up_parts = []
    cur = g
    for hop in range(1, hops + 1):
        if n > 1:
            cur = lax.ppermute(cur, axis_name, [(j, j + 1) for j in range(n - 1)])
            blk = jnp.where(i >= hop, cur, fillv)
        else:
            blk = jnp.full_like(cur, fillv)
        up_parts.insert(0, blk)
    from_up = take_rows(jnp.concatenate(up_parts, axis=yax), hops * h_local - band, band)

    # blocks below: [i+1, ..., i+hops] then keep the first `band` rows
    down_parts = []
    cur = g
    for hop in range(1, hops + 1):
        if n > 1:
            cur = lax.ppermute(cur, axis_name, [(j + 1, j) for j in range(n - 1)])
            blk = jnp.where(i < n - hop, cur, fillv)
        else:
            blk = jnp.full_like(cur, fillv)
        down_parts.append(blk)
    from_down = take_rows(jnp.concatenate(down_parts, axis=yax), 0, band)

    return jnp.concatenate([from_up, g, from_down], axis=yax)
