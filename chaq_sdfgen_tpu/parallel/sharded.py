"""Sharded SDF pipelines: shard_map over a ('data', 'y') mesh.

Layout (SURVEY.md §5 long-context plan, tier (a)+(b)):
- rows stay whole per shard -> pass 1 (row scans) is communication-free,
  exactly like the omp-for row axis (openmp/df.c:113-117);
- pass 2 (banded column stencil) attaches a band-row halo exchanged over
  ICI (parallel/halo.py), then runs the same band_min/band_softmin core as
  the single-chip path — so sharded results are bitwise identical to
  single-chip results;
- the batch axis is pure data parallelism (multi-host DCN tier).

Gradients flow through ppermute/shard_map (config 5: grad all-reduce is
inserted by XLA when the loss contracts over the data axis).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chaq_sdfgen_tpu.ops import edt, merge, softsdf, threshold
from chaq_sdfgen_tpu.ops.numerics import refined_sqrt
from chaq_sdfgen_tpu.parallel.halo import exchange_row_halo, fetch_row_slab


def _halo_fn(halo: str, interpret: bool):
    """Select the halo-exchange implementation (ShardingConfig.halo_impl):
    'ppermute' (XLA collective) or 'rdma' (Pallas remote-DMA ring,
    parallel/pallas_halo.py). Both are bitwise-identical by construction
    and cross-validated in tests."""
    if halo == "rdma":
        from chaq_sdfgen_tpu.parallel.pallas_halo import exchange_row_halo_rdma

        return lambda g, band, ax, fill: exchange_row_halo_rdma(
            g, band, ax, fill, interpret
        )
    return exchange_row_halo


def _local_hard_bytes(b_blk, spread, asymmetric, band, y_axis, halo_fn=exchange_row_halo):
    """Per-shard hard EXACT pipeline with halo'd pass 2 (XLA scan cores —
    the portable path; the Pallas variant below is the TPU perf path)."""
    big = edt.big_sentinel(band)

    def field(seeds):
        g = edt.row_nearest_sq(seeds, band)
        gext = halo_fn(g, band, y_axis, big)
        sq = edt.band_min_ext(gext, band)
        # (the reference's single-row no-sqrt quirk can't arise here: a
        # 1-row image is not shardable over 'y' — use the single-chip path)
        return refined_sqrt(sq)

    d_in = field(b_blk)
    d_out = field(jnp.logical_not(b_blk))
    vals = merge.signed_merge(d_out, d_in)
    return merge.remap_to_byte(vals, spread, asymmetric)


def _local_hard_bytes_pallas(b_blk, spread, asymmetric, band, y_axis, interpret,
                             halo_fn=exchange_row_halo):
    """Per-shard hard EXACT pipeline on the fused Pallas kernels
    (ops/pallas_edt.py): pass 1 local (rows never cross shards), u8
    row-distance strips exchange a band-row halo over ICI, and the fused
    pass-2 kernel consumes the pre-extended strips directly — the same
    kernels as the single-chip path, so bytes are identical to it
    (halo rows carry exactly the values the single-chip strip holds at
    those rows; edge shards read the 255 saturation sentinel)."""
    from chaq_sdfgen_tpu.ops import pallas_edt

    # halo carries band + 8 rows (8-aligned) so the looped-group pass-2
    # kernel's trip headroom holds under sharding too (same bytes either
    # way; the extra rows are sentinel-equivalent neighbour data)
    hr = -(-(band + 8) // 8) * 8
    din, dout = pallas_edt.row_distances_u8(b_blk, band, interpret=interpret)
    if halo_fn is exchange_row_halo and b_blk.shape[-2] % 8 == 0:
        # seam-free form: the ppermute-received halo rows ride as explicit
        # kernel operands; the whole-strip concat copy never happens
        # (measured +8.9% 1-dev overhead in BENCH_r04)
        from chaq_sdfgen_tpu.parallel.halo import exchange_row_halo_parts

        up_in, dn_in = exchange_row_halo_parts(din, hr, y_axis, 255)
        up_out, dn_out = exchange_row_halo_parts(dout, hr, y_axis, 255)
        return pallas_edt.fused_pass2_bytes_halo(
            din, dout, up_in, dn_in, up_out, dn_out, spread, asymmetric,
            band, interpret=interpret,
        )
    din_ext = halo_fn(din, hr, y_axis, 255)
    dout_ext = halo_fn(dout, hr, y_axis, 255)
    return pallas_edt.fused_pass2_bytes(
        din_ext, dout_ext, spread, asymmetric, band, interpret=interpret,
        row_off=hr, out_rows=-(-b_blk.shape[-2] // 8) * 8,
    )


def _local_hard_bytes_pallas_2d(
    b_blk, spread, asymmetric, band, y_axis, x_axis, interpret,
    halo_fn=exchange_row_halo,
):
    """Per-TILE hard EXACT pipeline for a 2-D ('y','x') mesh — the TPU
    analogue of the reference's 2-D NDRange decomposition
    (opencl/main.cpp:798, one work item per pixel). Pass 1's influence
    range along a row is <= band (distances saturate at band+1), so a
    band-column SEED halo makes the local row distances exact; beyond-
    image halo columns carry the tri-state dead code 2 (seeds neither
    field — see pallas_edt._row_pass_body). Pass 2 is columnwise and
    reuses the 1-D band-row halo unchanged. Bitwise equal to the 1-D and
    single-chip paths."""
    from chaq_sdfgen_tpu.ops import pallas_edt
    from chaq_sdfgen_tpu.parallel.halo import exchange_col_halo

    w_loc = b_blk.shape[-1]
    t = b_blk.astype(jnp.uint8)
    text = exchange_col_halo(t, band, x_axis, 2)
    din, dout = pallas_edt.row_distances_u8(text, band, interpret=interpret)
    din = jax.lax.slice_in_dim(din, band, band + w_loc, axis=-1)
    dout = jax.lax.slice_in_dim(dout, band, band + w_loc, axis=-1)
    hr = -(-(band + 8) // 8) * 8
    if halo_fn is exchange_row_halo and b_blk.shape[-2] % 8 == 0:
        from chaq_sdfgen_tpu.parallel.halo import exchange_row_halo_parts

        up_in, dn_in = exchange_row_halo_parts(din, hr, y_axis, 255)
        up_out, dn_out = exchange_row_halo_parts(dout, hr, y_axis, 255)
        return pallas_edt.fused_pass2_bytes_halo(
            din, dout, up_in, dn_in, up_out, dn_out, spread, asymmetric,
            band, interpret=interpret,
        )
    din_ext = halo_fn(din, hr, y_axis, 255)
    dout_ext = halo_fn(dout, hr, y_axis, 255)
    return pallas_edt.fused_pass2_bytes(
        din_ext, dout_ext, spread, asymmetric, band, interpret=interpret,
        row_off=hr, out_rows=-(-b_blk.shape[-2] // 8) * 8,
    )


def sharded_hard_sdf_bytes(
    b: jnp.ndarray,
    spread: int,
    mesh: Mesh,
    asymmetric: bool = False,
    band: Optional[int] = None,
    y_axis: str = "y",
    batch_axis: Optional[str] = None,
    use_pallas: Optional[bool] = None,
    interpret: Optional[bool] = None,
    halo: str = "ppermute",
    x_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Hard EXACT pipeline over a mesh. b: bool (H, W) or (N, H, W) with H
    divisible by the 'y' mesh axis. Bitwise identical to the single-chip
    path (same cores, same exact-integer arithmetic).

    use_pallas=None auto-selects the fused Pallas kernels whenever the
    per-shard geometry admits them (8-aligned shard height, u8-range
    band); pass False to force the portable XLA-scan cores.

    x_axis: optional second mesh axis sharding image COLUMNS — the 2-D
    per-chip tile decomposition (SURVEY §2.4; reference analogue
    opencl/main.cpp:798's width x height NDRange). Requires the Pallas
    cores."""
    band = band if band is not None else spread + 2
    if batch_axis is None:
        spec = P(y_axis, None) if x_axis is None else P(y_axis, x_axis)
    else:
        spec = (
            P(batch_axis, y_axis, None)
            if x_axis is None
            else P(batch_axis, y_axis, x_axis)
        )

    n_y = dict(zip(mesh.axis_names, mesh.devices.shape))[y_axis]
    h_local = b.shape[-2] // n_y
    if use_pallas is None:
        use_pallas = h_local % 8 == 0 and h_local > 1 and band + 1 <= 255
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    halo_fn = _halo_fn(halo, interpret)
    if x_axis is not None:
        if not use_pallas:
            raise NotImplementedError(
                "2-D (y,x) tiling requires the Pallas cores (use_pallas)"
            )
        fn = functools.partial(
            _local_hard_bytes_pallas_2d, spread=spread, asymmetric=asymmetric,
            band=band, y_axis=y_axis, x_axis=x_axis, interpret=interpret,
            halo_fn=halo_fn,
        )
    elif use_pallas:
        fn = functools.partial(
            _local_hard_bytes_pallas, spread=spread, asymmetric=asymmetric,
            band=band, y_axis=y_axis, interpret=interpret, halo_fn=halo_fn,
        )
    else:
        fn = functools.partial(
            _local_hard_bytes, spread=spread, asymmetric=asymmetric, band=band,
            y_axis=y_axis, halo_fn=halo_fn,
        )
    if batch_axis is not None and use_pallas:
        inner = fn
        fn = lambda blk: jax.vmap(inner)(blk)
    # pallas_call cannot declare how its outputs vary over mesh axes, so
    # the vma check must be off for the Pallas branch
    mapped = jax.shard_map(
        fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=not (use_pallas or halo == "rdma"),
    )
    return mapped(b)


def _local_brute_bytes_pallas(b_blk, spread, asymmetric, invert, y_axis, interpret):
    """Per-shard BRUTE pipeline (OpenCL-kernel semantics): pass A is
    row-local (seed distances never cross rows), a roundup(spread, 8)-row
    halo of the four dual-polarity strips rides the ICI, and the dy-scan
    kernel takes the halos as explicit operands (seam-free; see
    pallas_brute.brute_sdf_bytes_pallas_halo). Reference analogue: the
    kernel's own 2-D NDRange decomposition (opencl/main.cpp:798, 812)."""
    from chaq_sdfgen_tpu.ops import pallas_brute as PB
    from chaq_sdfgen_tpu.parallel.halo import exchange_row_halo_parts

    h_loc = b_blk.shape[-2]
    l1, l2, r1, r2, loc_off, wp = PB.row_seed_distances_ext(
        b_blk, spread, interpret
    )
    sent = spread + 1
    hr = -(-max(spread, 8) // 8) * 8
    ups, dns = [], []
    for s in (l1, l2, r1, r2):
        real = jax.lax.slice_in_dim(s, loc_off, loc_off + h_loc, axis=0)
        up, dn = exchange_row_halo_parts(real, hr, y_axis, sent)
        ups.append(up)
        dns.append(dn)
    return PB.brute_sdf_bytes_pallas_halo(
        b_blk, (l1, l2, r1, r2), tuple(ups), tuple(dns), loc_off, wp,
        spread, asymmetric=asymmetric, invert=invert, interpret=interpret,
    )


def _local_brute_bytes_pallas_2d(
    b_blk, spread, asymmetric, invert, y_axis, x_axis, interpret
):
    """Per-TILE BRUTE pipeline for a 2-D ('y','x') mesh — the TPU
    analogue of the reference kernel's width x height NDRange
    (opencl/main.cpp:798). Pass A's influence range along a row is
    <= spread (distances clip at the u8 sentinel spread+1), so a
    spread-COLUMN seed halo makes the local row strips exact; beyond-
    image halo columns carry the tri-state dead code 2 (seeds NEITHER
    polarity — pass A's `blk == 1` / `blk == 0` predicates, matching
    the single-chip boundary where the scan simply ends). The strips'
    interior columns are then repacked to the local lane width and the
    1-D row-halo dy-scan runs unchanged. Bitwise equal to the 1-D and
    single-chip paths."""
    from chaq_sdfgen_tpu.ops import pallas_brute as PB
    from chaq_sdfgen_tpu.parallel.halo import (
        exchange_col_halo,
        exchange_row_halo_parts,
    )

    h_loc, w_loc = b_blk.shape[-2], b_blk.shape[-1]
    sent = spread + 1
    t = b_blk.astype(jnp.uint8)
    text = exchange_col_halo(t, spread, x_axis, 2)
    l1, l2, r1, r2, loc_off, wp_ext = PB.row_seed_distances_ext(
        text, spread, interpret
    )
    # repack: interior columns of each polarity half -> (rows, 2*wp_loc)
    wp_loc = -(-w_loc // 128) * 128
    pad = ((0, 0), (0, wp_loc - w_loc))

    def repack(s):
        st = jax.lax.slice_in_dim(s, spread, spread + w_loc, axis=1)
        sf = jax.lax.slice_in_dim(
            s, wp_ext + spread, wp_ext + spread + w_loc, axis=1
        )
        return jnp.concatenate(
            [
                jnp.pad(st, pad, constant_values=sent),
                jnp.pad(sf, pad, constant_values=sent),
            ],
            axis=1,
        )

    strips = tuple(repack(s) for s in (l1, l2, r1, r2))
    hr = -(-max(spread, 8) // 8) * 8
    ups, dns = [], []
    for s in strips:
        real = jax.lax.slice_in_dim(s, loc_off, loc_off + h_loc, axis=0)
        up, dn = exchange_row_halo_parts(real, hr, y_axis, sent)
        ups.append(up)
        dns.append(dn)
    return PB.brute_sdf_bytes_pallas_halo(
        b_blk, strips, tuple(ups), tuple(dns), loc_off, wp_loc,
        spread, asymmetric=asymmetric, invert=invert, interpret=interpret,
    )


def sharded_brute_sdf_bytes(
    b: jnp.ndarray,
    spread: int,
    mesh: Mesh,
    asymmetric: bool = False,
    invert: bool = False,
    y_axis: str = "y",
    batch_axis: Optional[str] = None,
    interpret: Optional[bool] = None,
    x_axis: Optional[str] = None,
) -> jnp.ndarray:
    """BRUTE (OpenCL-parity) pipeline over a row-sharded mesh — bitwise
    identical to ops.brute.brute_sdf_bytes (and hence the reference
    kernel, opencl/sdf.cl:193-224). b: bool (H, W) or (N, H, W); H
    divisible by the 'y' mesh extent, per-shard height an 8-multiple;
    spread <= 254 (the u8 strip sentinel).

    x_axis: optional second mesh axis sharding image COLUMNS — the 2-D
    per-chip tile decomposition (SURVEY §2.4; reference analogue
    opencl/main.cpp:798's width x height NDRange)."""
    if spread + 1 > 255:
        raise ValueError(f"sharded brute needs spread <= 254, got {spread}")
    n_y = dict(zip(mesh.axis_names, mesh.devices.shape))[y_axis]
    h_local = b.shape[-2] // n_y
    if h_local % 8 != 0 or h_local < 2:
        raise ValueError(
            f"sharded brute needs an 8-aligned per-shard height >= 8, "
            f"got {h_local} ({b.shape[-2]} rows over {n_y} shards)"
        )
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if batch_axis is None:
        spec = P(y_axis, None) if x_axis is None else P(y_axis, x_axis)
    else:
        spec = (
            P(batch_axis, y_axis, None)
            if x_axis is None
            else P(batch_axis, y_axis, x_axis)
        )

    if x_axis is not None:
        fn = functools.partial(
            _local_brute_bytes_pallas_2d, spread=spread, asymmetric=asymmetric,
            invert=invert, y_axis=y_axis, x_axis=x_axis, interpret=interpret,
        )
    else:
        fn = functools.partial(
            _local_brute_bytes_pallas, spread=spread, asymmetric=asymmetric,
            invert=invert, y_axis=y_axis, interpret=interpret,
        )
    if batch_axis is not None:
        inner = fn
        fn = lambda blk: jax.vmap(inner)(blk)
    mapped = jax.shard_map(
        fn, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False
    )
    return mapped(b)


def sharded_jfa_distance(
    seeds: jnp.ndarray,
    mesh: Mesh,
    plus_one: bool = True,
    y_axis: str = "y",
    x_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Jump-flood distance field over a row-sharded mesh (BASELINE
    config 3's cross-tile nearest-seed reduction): every stride-k pass
    exchanges a k-row halo of the (seed-coord, d2, valid) state over the
    ICI ring — multi-hop when k exceeds a shard — so the propagation sees
    exactly the same candidates as the single-chip kernel. Bitwise equal
    to ops.jfa.jfa_distance. seeds: (H, W) bool, H divisible by the mesh.

    x_axis: optional second mesh axis sharding image COLUMNS — the 2-D
    per-chip tile decomposition (reference analogue: the kernel's own
    width x height NDRange, opencl/main.cpp:798). Each stride fetches
    the three dy row-slabs over 'y' and shifts them over 'x' per dx tap
    (fetch_col_slab); corner candidates route through both exchanges, so
    diagonal-neighbour data arrives in two hops. Candidate order matches
    the single-chip loop exactly -> bitwise equal."""
    from chaq_sdfgen_tpu.ops import jfa as jfa_ops
    from chaq_sdfgen_tpu.ops.numerics import refined_sqrt

    if x_axis is not None:
        return _sharded_jfa_distance_2d(seeds, mesh, plus_one, y_axis, x_axis)
    h, w = seeds.shape
    n = dict(zip(mesh.axis_names, mesh.devices.shape))[y_axis]
    h_local = h // n
    strides = jfa_ops._strides(h, w, plus_one)
    invalid = jfa_ops._INVALID_D2

    def local(seeds_blk):
        i = jax.lax.axis_index(y_axis)
        yy = (
            jax.lax.broadcasted_iota(jnp.int32, seeds_blk.shape, 0)
            + i.astype(jnp.int32) * jnp.int32(h_local)
        )
        xx = jax.lax.broadcasted_iota(jnp.int32, seeds_blk.shape, 1)
        # packed state (sy << xbits | sx, -1 = no seed) as in
        # jfa_seed_coords: ONE halo'd array per stride instead of three
        xbits = max((w - 1).bit_length(), 1)
        mask = jnp.int32((1 << xbits) - 1)
        none = jnp.int32(-1)
        p = jnp.where(seeds_blk, (yy << xbits) | xx, none)

        d2 = jnp.where(seeds_blk, jnp.int32(0), invalid)
        n_sh = jax.lax.axis_size(y_axis)
        row = jax.lax.broadcasted_iota(jnp.int32, seeds_blk.shape, 0)

        def perm_rows(rows_arr, j, sgn):
            """receive ``rows_arr`` from shard i - sgn*j; zero-delivery at
            edge shards maps to the -1 marker via the +-1 trick."""
            if j == 0 or n_sh == 1:
                return (
                    rows_arr
                    if j == 0
                    else jnp.full_like(rows_arr, jnp.int32(-1))
                )
            if sgn > 0:
                pairs = [(s, s + j) for s in range(n_sh - j)]
            else:
                pairs = [(s + j, s) for s in range(n_sh - j)]
            return jax.lax.ppermute(rows_arr + 1, y_axis, pairs) - 1

        def dy_candidate(sp, k, sgn):
            """Returns cp(dx) for the dy = -sgn*k tap (out[y] = p_glob at
            global row y - sgn*k) of the stride-start state ``sp``, built
            so every dx-variant stays a FUSED expression: the local part
            is a pad+slice of sp, the remote part is the (small) received
            row band behind a lazily-padded where — no shared
            materialized slab (measured 2.4x on the whole JFA when slabs
            materialize: single-chip fuses all eight candidate reads into
            the update chain)."""
            q, r = divmod(k, h_local)
            if k >= n_sh * h_local:
                return lambda dx: jnp.full_like(sp, none)
            if n_sh == 1:
                # exact reduction: with no neighbour, the received band is
                # the -1 fill, and where(row < r, fill, shift2d(sp, -sgn*r))
                # IS shift2d's own out-of-range fill — the single-chip
                # expression. Skipping the rem/pad/where constructs here
                # removes ~40% of the 1-dev runtime (XLA materializes the
                # padded constant bands inside the stride loop otherwise).
                return lambda dx: jfa_ops._shift2d(sp, -sgn * r, dx, none)
            if r == 0 or q >= 1:
                # the slab is (mostly) remote: one materialized exchange,
                # dx-shifts read it fused (only the 3 largest strides)
                slab = fetch_row_slab(sp, sgn * k, y_axis, -1)
                return lambda dx: jfa_ops._shift2d(slab, 0, dx, none)
            # q == 0: local pad+slice + a k-row band from the neighbour
            if sgn > 0:
                rec = perm_rows(
                    jax.lax.slice_in_dim(sp, h_local - r, h_local, axis=0), 1, 1
                )
                recp = jnp.pad(rec, ((0, h_local - r), (0, 0)), constant_values=none)
                cond = row < jnp.int32(r)
            else:
                rec = perm_rows(jax.lax.slice_in_dim(sp, 0, r, axis=0), 1, -1)
                recp = jnp.pad(rec, ((h_local - r, 0), (0, 0)), constant_values=none)
                cond = row >= jnp.int32(h_local - r)

            def cp(dx, sp=sp, recp=recp, cond=cond, dyl=-sgn * r):
                loc = jfa_ops._shift2d(sp, dyl, dx, none)
                rem = jfa_ops._shift2d(recp, 0, dx, none) if dx != 0 else recp
                return jnp.where(cond, rem, loc)

            return cp

        for k in strides:
            # all eight candidates read the stride-START state (textbook
            # synchronous JFA — bitwise equal to single-chip)
            sp = p
            # rebuild the running best distance from the packed state
            # (exact invariant d2 == dist(p), see ops/jfa.py) — only p
            # crosses passes/halos, halving the carried state
            sy0 = sp >> xbits
            sx0 = sp & mask
            d2 = jnp.where(sp >= 0, (yy - sy0) ** 2 + (xx - sx0) ** 2, invalid)
            up = dy_candidate(sp, k, 1)
            dn = dy_candidate(sp, k, -1)
            cands = [
                up,
                lambda dx, sp=sp: jfa_ops._shift2d(sp, 0, dx, none),
                dn,
            ]
            for si, cf in enumerate(cands):
                for dx in (-k, 0, k):
                    if si == 1 and dx == 0:
                        continue  # (0, 0) is the pixel itself (as single-chip)
                    cp = cf(dx)
                    csy = cp >> xbits
                    csx = cp & mask
                    cd2 = (yy - csy) ** 2 + (xx - csx) ** 2
                    cd2 = jnp.where(cp >= 0, cd2, invalid)
                    take = cd2 < d2
                    p = jnp.where(take, cp, p)
                    d2 = jnp.minimum(d2, cd2)
        return refined_sqrt(d2.astype(jnp.float32))

    spec = P(y_axis, None)
    return jax.shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)(seeds)


def _sharded_jfa_distance_2d(seeds, mesh, plus_one, y_axis, x_axis):
    from chaq_sdfgen_tpu.ops import jfa as jfa_ops
    from chaq_sdfgen_tpu.ops.numerics import refined_sqrt
    from chaq_sdfgen_tpu.parallel.halo import fetch_col_slab, fetch_row_slab

    h, w = seeds.shape
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    h_loc = h // axes[y_axis]
    w_loc = w // axes[x_axis]
    strides = jfa_ops._strides(h, w, plus_one)
    invalid = jfa_ops._INVALID_D2
    xbits = max((w - 1).bit_length(), 1)
    mask = jnp.int32((1 << xbits) - 1)
    none = jnp.int32(-1)

    def local(blk):
        iy = jax.lax.axis_index(y_axis).astype(jnp.int32)
        ix = jax.lax.axis_index(x_axis).astype(jnp.int32)
        yy = (
            jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
            + iy * jnp.int32(h_loc)
        )
        xx = (
            jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
            + ix * jnp.int32(w_loc)
        )
        p = jnp.where(blk, (yy << xbits) | xx, none)
        for k in strides:
            sp = p
            sy0 = sp >> xbits
            sx0 = sp & mask
            d2 = jnp.where(sp >= 0, (yy - sy0) ** 2 + (xx - sx0) ** 2, invalid)
            # dy slab: out[y] = p_glob[y + dy] -> fetch offset -dy
            for dy in (-k, 0, k):
                slab = sp if dy == 0 else fetch_row_slab(sp, -dy, y_axis, none)
                for dx in (-k, 0, k):
                    if dy == 0 and dx == 0:
                        continue
                    cp = (
                        slab
                        if dx == 0
                        else fetch_col_slab(slab, -dx, x_axis, none)
                    )
                    csy = cp >> xbits
                    csx = cp & mask
                    cd2 = (yy - csy) ** 2 + (xx - csx) ** 2
                    cd2 = jnp.where(cp >= 0, cd2, invalid)
                    take = cd2 < d2
                    p = jnp.where(take, cp, p)
                    d2 = jnp.minimum(d2, cd2)
        return refined_sqrt(d2.astype(jnp.float32))

    spec = P(y_axis, x_axis)
    return jax.shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)(seeds)


def _local_soft_mm(gray_blk, band, tau, temperature, eps, test_above,
                   gray_range, y_axis, halo_fn, w_real, interpret=False,
                   vma=None):
    """Shard-local collapsed two-einsum soft field (ops/soft_mxu.py's
    pass2='mm' split for the sharded tier): conv_rows is row-local, the
    pass-2 stencil needs only K2 (~10) rows of the pass-1 SUM per
    direction — the smallest halo of any soft split (zero fill = the
    dead-window sentinel on image edges)."""
    from chaq_sdfgen_tpu.ops import soft_mxu as SM

    t_f = float(temperature)
    k1, shift = SM._range_stats(band, tau, temperature, gray_range)
    k2, _ = SM._range_stats(
        band, tau, temperature, gray_range, margin=SM._P2_MARGIN_T * t_f
    )
    h, w = gray_blk.shape
    wl = -(-max(w, SM._BLK) // SM._BLK) * SM._BLK
    gray_p = jnp.pad(gray_blk.astype(jnp.float32), ((0, 0), (0, wl - w)))
    logits = threshold.soft_logits(gray_p, tau=tau, test_above=test_above)
    ls_in = jax.nn.log_sigmoid(logits)
    ls_out = ls_in - logits
    ct1 = jnp.float32(shift / t_f)
    live_c = jnp.arange(wl)[None, :] < w
    e_in = jnp.where(live_c, jnp.exp(ct1 + ls_in), jnp.float32(0.0))
    e_out = jnp.where(live_c, jnp.exp(ct1 + ls_out), jnp.float32(0.0))

    from chaq_sdfgen_tpu.ops import pallas_band_conv as PC

    def rows_and_halo(ev):
        # self-adjoint conv wrappers: backward is the same banded conv,
        # not XLA's transpose of the window build (see soft_mxu)
        s1 = SM.conv_rows_sym(ev, k1, t_f)  # rows never cross shards
        s1x = halo_fn(s1, k2, y_axis, 0.0)  # (h + 2*k2, wl)
        hx = s1x.shape[0]
        hp2 = -(-hx // SM._BLK) * SM._BLK
        return jnp.pad(s1x, ((0, hp2 - hx), (0, 0)))

    a_in = rows_and_halo(e_in)
    a_out = rows_and_halo(e_out)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if PC.cols_conv_ok(a_in, k2) and (on_tpu or interpret):
        # fused pass 2 (cols-conv + tails, one kernel each way) on the
        # halo-extended block; pad rows are dead windows the tails route
        # to the PAD sentinel and the slice below removes
        field_ext = SM.pass2_fused_sym(
            a_in, a_out, k2, t_f, shift, float(eps), vma=vma,
            interpret=not on_tpu,
        )
        return field_ext[k2 : k2 + h, :w_real]

    def d2_of(ap):
        s2 = SM.conv_cols_sym(ap, k2, t_f, vma=vma)[k2 : k2 + h]
        return SM._safe_neglog(s2, t_f, shift, 1e30)

    d2_in = d2_of(a_in)
    d2_out = d2_of(a_out)
    e = jnp.float32(eps)
    d_in = jnp.sqrt(jnp.maximum(d2_in, 0) + e)
    d_out = jnp.sqrt(jnp.maximum(d2_out, 0) + e)
    out = d_out - jnp.maximum(d_in - jnp.float32(1.0), jnp.float32(0.0))
    return out[:, :w_real]


def sharded_soft_sdf_field(
    gray: jnp.ndarray,
    spread: int,
    mesh: Mesh,
    tau: float = 1.0,
    temperature: float = 0.5,
    eps: float = 1e-6,
    test_above: bool = True,
    band: Optional[int] = None,
    y_axis: str = "y",
    batch_axis: Optional[str] = None,
    halo: str = "ppermute",
    interpret: Optional[bool] = None,
    use_fused: Optional[bool] = None,
    gray_range: Optional[tuple] = None,
    use_mm: Optional[bool] = None,
    fused_impl: Optional[str] = None,
    x_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Sharded differentiable soft SDF (parallel analogue of
    ops.softsdf.soft_sdf_field). Pass 1 local; pass 2 halo'd; fully
    differentiable (ppermute has a transpose rule; the rdma halo carries
    a custom VJP).

    use_fused=None auto-selects the fused Pallas kernel split
    (pallas_soft_fused.pass1_s1 / pass2_ext — the kernels behind the
    single-chip headline) when static params and the per-shard geometry
    admit them; False forces the portable composed scan cores.

    gray_range: declared (lo, hi) input bound (see ops.softsdf). When
    in-gamut (use_mm=None auto, on TPU), the shard-local pipeline is the
    collapsed two-einsum cascade with a K2-row pass-1-sum halo — the
    smallest communication volume of any soft split."""
    band = band if band is not None else spread + 2
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    halo_fn = _halo_fn(halo, interpret)
    big = edt.big_sentinel(band)
    if batch_axis is None:
        spec = P(y_axis, None) if x_axis is None else P(y_axis, x_axis)
    else:
        spec = (
            P(batch_axis, y_axis, None)
            if x_axis is None
            else P(batch_axis, y_axis, x_axis)
        )

    n_y = dict(zip(mesh.axis_names, mesh.devices.shape))[y_axis]
    h_local = gray.shape[-2] // n_y
    n_x = 1 if x_axis is None else dict(zip(mesh.axis_names, mesh.devices.shape))[x_axis]
    w_local = gray.shape[-1] // n_x

    if use_mm is None:
        from chaq_sdfgen_tpu.ops import soft_mxu as SM

        g2d = gray if gray.ndim == 2 else gray.reshape(-1, *gray.shape[-2:])[0]
        use_mm = SM.mxu_ok(g2d, band, tau, temperature, gray_range)
    if use_mm:
        from chaq_sdfgen_tpu.ops import pallas_band_conv as PC
        from chaq_sdfgen_tpu.ops import pallas_soft_mm as PM
        from chaq_sdfgen_tpu.ops import soft_mxu as SM

        w_real = gray.shape[-1]
        # seam-free fully-fused split (ops/pallas_soft_mm.py): the gray
        # halo rides as explicit kernel operands and the backward pulls
        # the neighbour ct/d2 edges itself — no reassembly copies at all;
        # bitwise equal to the unsharded fused kernels
        import os as _os

        shard_shape = jax.ShapeDtypeStruct((h_local, w_local), jnp.float32)
        use_mmf = (
            _os.environ.get("CHAQ_SOFT_MMF", "1") != "0"
            and PM._pick_rs(h_local) is not None
            and PM.soft_field_mm_ok(shard_shape, band, tau, temperature, gray_range)
            and (x_axis is None or w_local % 128 == 0)
        )
        if use_mmf:
            on_tpu_f = jax.default_backend() in ("tpu", "axon")
            check_f = not (interpret or halo == "rdma")
            if not check_f:
                vma_f = None
            elif x_axis is None:
                vma_f = frozenset({y_axis})
            else:
                vma_f = frozenset({y_axis, x_axis})

            if x_axis is None:
                def local_mmf(gray_blk):
                    return PM.sharded_local_mm_fused(
                        gray_blk, band, tau, temperature, eps, test_above,
                        gray_range, y_axis, w_real, interpret=not on_tpu_f,
                        vma=vma_f,
                    )
            else:
                def local_mmf(gray_blk):
                    return PM.sharded_local_mm_fused_2d(
                        gray_blk, band, tau, temperature, eps, test_above,
                        gray_range, y_axis, x_axis, interpret=not on_tpu_f,
                        vma=vma_f,
                    )

            fn_mmf = local_mmf
            if batch_axis is not None:
                fn_mmf = lambda blk: jax.vmap(local_mmf)(blk)
            mapped = jax.shard_map(
                fn_mmf, mesh=mesh, in_specs=(spec,), out_specs=spec,
                check_vma=check_f,
            )
            return mapped(gray)
        if x_axis is not None:
            raise NotImplementedError(
                "x-axis (column) sharding of the soft path requires the "
                "fused-mm tier: declared gray_range, static params, "
                "128-aligned tile width, 128-divisible tile height"
            )
        # Will _local_soft_mm take the fused Pallas pass-2 branch? Mirror
        # its geometry: halo-extended pass-1 slab padded to _BLK rows.
        t_f = float(temperature)
        k2, _ = SM._range_stats(
            band, tau, temperature, gray_range, margin=SM._P2_MARGIN_T * t_f
        )
        wl = -(-max(w_real, SM._BLK) // SM._BLK) * SM._BLK
        hx = h_local + 2 * k2
        hp2 = -(-hx // SM._BLK) * SM._BLK
        slab = jax.ShapeDtypeStruct((hp2, wl), jnp.float32)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        fused_p2 = PC.cols_conv_ok(slab, k2) and (on_tpu or interpret)
        # The interpret-mode Pallas kernel cannot satisfy check_vma: its
        # jaxpr traces with vma-empty ref loads/consts but evaluates with
        # vma-carrying blocks (same reason the hard pipeline runs
        # check_vma=False with Pallas, see sharded_hard_bytes). Compiled
        # Mosaic kernels only face vma at the pallas_call boundary, where
        # threading vma through out_shape + pcast'd weights suffices.
        check = (halo != "rdma") and not (fused_p2 and interpret)
        vma = frozenset({y_axis}) if check else None

        def local_mm(gray_blk):
            return _local_soft_mm(
                gray_blk, band, tau, temperature, eps, test_above,
                gray_range, y_axis, halo_fn, w_real, interpret=interpret,
                vma=vma,
            )

        fn_mm = local_mm
        if batch_axis is not None:
            fn_mm = lambda blk: jax.vmap(local_mm)(blk)
        mapped = jax.shard_map(
            fn_mm, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=check,
        )
        return mapped(gray)
    if x_axis is not None:
        raise NotImplementedError(
            "x-axis (column) sharding of the soft path requires the "
            "fused-mm tier (declared gray_range + static params)"
        )
    if use_fused is None:
        from chaq_sdfgen_tpu.ops import pallas_soft_fused as PF

        use_fused = (
            isinstance(tau, (int, float))
            and isinstance(temperature, (int, float))
            and h_local % 8 == 0
            and h_local >= 2
            and band <= PF._TM - 16
            and jax.default_backend() in ("tpu", "axon")
        )

    if use_fused:
        from chaq_sdfgen_tpu.ops import pallas_soft_fused as PF

        tau_f, t_f, eps_f = float(tau), float(temperature), float(eps)
        prm_const = (tau_f, 1.0 / tau_f, t_f, 1.0 / t_f, eps_f)
        # halo rows are exchanged 8-aligned so the extended pass-2 block
        # keeps sublane-aligned chunk geometry; the extra rows carry real
        # neighbour data (or the PAD fill at image edges) and only the
        # interior is returned
        halo_rows = -(-band // 8) * 8
        w_real = gray.shape[-1]

        # Two fused-kernel shardings:
        # - 'window' (default when the halo is small relative to the
        #   shard): exchange the GRAY halo up front and run the single
        #   custom-VJP fused pipeline on the extended block with a traced
        #   per-shard live-row window (prm[5:7] — beyond-image halo rows
        #   of edge shards read as sentinels inside F1). No split seams;
        #   costs 2*halo extra rows of compute per shard. Backward flows
        #   through the slice + the gray-halo AD transpose.
        # - 'split' (pass1_s1 / s1 halo / pass2_ext): exchanges the s1
        #   halo instead. Cheaper when 2*halo is a large fraction of the
        #   shard (tiny shards / huge bands); pays fixed seam costs
        #   (measured +42% at 4K 1-dev vs the window form's ~4%).
        if fused_impl is None:
            use_window = 2 * halo_rows <= max(h_local // 2, 1)
        else:
            use_window = fused_impl == "window"

        if use_window:
            def local_fused(gray_blk):
                hl = gray_blk.shape[0]
                gext = halo_fn(
                    gray_blk.astype(jnp.float32), halo_rows, y_axis, 0.0
                )  # (hl + 2*halo, W) — halo gray; masked rows don't read it
                i = jax.lax.axis_index(y_axis)
                n_sh = jax.lax.axis_size(y_axis)
                ylo = jnp.maximum(
                    jnp.float32(0.0),
                    jnp.float32(halo_rows) - i.astype(jnp.float32) * hl,
                )
                yhi = jnp.minimum(
                    jnp.float32(hl + 2 * halo_rows),
                    jnp.float32(halo_rows)
                    + (n_sh - i).astype(jnp.float32) * hl,
                )
                prm = PF._params(tau_f, t_f, eps_f, ylo, yhi)
                field = PF._fused_field_p(
                    gext, prm, band, test_above, interpret, prm_const
                )
                return jax.lax.slice_in_dim(field, halo_rows, halo_rows + hl, axis=0)

        else:
            def local_fused(gray_blk):
                prm = PF._params(
                    tau_f, t_f, eps_f, 0.0, float(gray_blk.shape[0])
                )
                s1 = PF.pass1_s1(
                    gray_blk, prm, band, test_above, interpret, prm_const
                )  # (h_local, 2*WL) natural layout
                s1ext = halo_fn(s1, halo_rows, y_axis, PF._PAD_H)
                field = PF.pass2_ext(
                    s1ext, prm, (band, halo_rows), interpret, prm_const
                )  # (h_local, WL)
                return field[:, :w_real]

        fn = local_fused
        if batch_axis is not None:
            fn = lambda blk: jax.vmap(local_fused)(blk)
        mapped = jax.shard_map(
            fn, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False
        )
        return mapped(gray)

    def local(gray_blk):
        logits = threshold.soft_logits(gray_blk, tau=tau, test_above=test_above)
        h_in = threshold.soft_log_indicator_from_logits(logits, temperature, True, big)
        h_out = threshold.soft_log_indicator_from_logits(logits, temperature, False, big)

        def field(hh):
            s1 = softsdf.band_softmin(hh, band, temperature, axis=-1)
            s1ext = halo_fn(s1, band, y_axis, softsdf._PAD_HEIGHT)
            return softsdf.band_softmin_ext(s1ext, band, temperature, axis=-2)

        d2_in = field(h_in)
        d2_out = field(h_out)
        e = jnp.float32(eps)
        d_in = jnp.sqrt(jnp.maximum(d2_in, 0) + e)
        d_out = jnp.sqrt(jnp.maximum(d2_out, 0) + e)
        return d_out - jnp.maximum(d_in - jnp.float32(1.0), jnp.float32(0.0))

    mapped = jax.shard_map(
        local, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=halo != "rdma",
    )
    return mapped(gray)
