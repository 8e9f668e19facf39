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

    Rows are SLICED BEFORE the collective so exactly ``band`` rows ride the
    ICI per direction (not whole blocks): the source shard at offset j
    contributes only the rows of its block that fall inside the halo
    window, shipped with a direct offset-j ppermute (XLA routes it; no
    store-and-forward relaying). ppermute delivers zeros to edge shards
    outside the permutation; an axis_index mask rewrites those to
    ``fill``."""
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    yax = g.ndim - 2
    h_local = g.shape[yax]
    fillv = jnp.asarray(fill, g.dtype)
    hops = -(-band // h_local)  # ceil

    def take_rows(x, start, size):
        return lax.slice_in_dim(x, start, start + size, axis=yax)

    # halo above = rows [start - band, start): shard i-j contributes its
    # last min(band - (j-1)*H, H) rows; farthest shard first
    up_parts = []
    for j in range(hops, 0, -1):
        take = min(band - (j - 1) * h_local, h_local)
        sl = take_rows(g, h_local - take, take)
        if n > 1:
            recv = lax.ppermute(sl, axis_name, [(s, s + j) for s in range(n - j)])
            blk = jnp.where(i >= j, recv, fillv)
        else:
            blk = jnp.full_like(sl, fillv)
        up_parts.append(blk)
    from_up = up_parts[0] if len(up_parts) == 1 else jnp.concatenate(up_parts, axis=yax)

    # halo below = rows [end, end + band): shard i+j contributes its first
    # min(band - (j-1)*H, H) rows; nearest shard first
    down_parts = []
    for j in range(1, hops + 1):
        take = min(band - (j - 1) * h_local, h_local)
        sl = take_rows(g, 0, take)
        if n > 1:
            recv = lax.ppermute(sl, axis_name, [(s + j, s) for s in range(n - j)])
            blk = jnp.where(i < n - j, recv, fillv)
        else:
            blk = jnp.full_like(sl, fillv)
        down_parts.append(blk)
    from_down = (
        down_parts[0] if len(down_parts) == 1 else jnp.concatenate(down_parts, axis=yax)
    )

    return jnp.concatenate([from_up, g, from_down], axis=yax)


def fetch_row_slab(g: jnp.ndarray, offset: int, axis_name: str, fill) -> jnp.ndarray:
    """Same-shape slab shifted ``offset`` rows in GLOBAL coordinates: out
    row y holds global row (y_global - offset), or ``fill`` beyond the
    image. offset may be any positive/negative stride (JFA's ±k taps).

    Ships at most H_local rows per call (split across the <= 2 source
    shards the slab straddles) with direct offset ppermutes — the
    information-theoretic minimum for a full-block shifted read, vs. the
    |offset| rows a contiguous halo would carry."""
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    yax = g.ndim - 2
    h_local = g.shape[yax]
    fillv = jnp.asarray(fill, g.dtype)
    k = int(offset)
    if k == 0:
        return g

    def take_rows(x, start, size):
        return lax.slice_in_dim(x, start, start + size, axis=yax)

    q, r = divmod(abs(k), h_local)
    sgn = 1 if k > 0 else -1  # k>0: read from ABOVE (sources at i-q, i-q-1)

    def perm_from(j):
        """receive the permuted slice from shard i - sgn*j (None rows for
        edge shards filled later by the global-row validity mask)."""
        if j == 0:
            return lambda sl: sl
        if sgn > 0:
            pairs = [(s, s + j) for s in range(n - j)]
        else:
            pairs = [(s + j, s) for s in range(n - j)]
        return lambda sl: lax.ppermute(sl, axis_name, pairs) if n > 1 else jnp.full_like(sl, fillv)

    if r == 0:
        slab = perm_from(q)(g)
    else:
        # out rows [r, H) <- source shard i-sgn*q rows [0, H-r) (k>0);
        # out rows [0, r) <- shard i-sgn*(q+1) rows [H-r, H)
        if sgn > 0:
            near = perm_from(q)(take_rows(g, 0, h_local - r))
            far = perm_from(q + 1)(take_rows(g, h_local - r, r))
            slab = jnp.concatenate([far, near], axis=yax)
        else:
            near = perm_from(q)(take_rows(g, r, h_local - r))
            far = perm_from(q + 1)(take_rows(g, 0, r))
            slab = jnp.concatenate([near, far], axis=yax)

    # validity in global coordinates: source row y_global - k inside image
    iota_shape = [1] * g.ndim
    iota_shape[yax] = h_local
    y_loc = lax.broadcasted_iota(jnp.int32, tuple(iota_shape), yax)
    y_glob = y_loc + i.astype(jnp.int32) * jnp.int32(h_local)
    src = y_glob - jnp.int32(k)
    ok = jnp.logical_and(src >= 0, src < jnp.int32(n * h_local))
    return jnp.where(ok, slab, fillv)
