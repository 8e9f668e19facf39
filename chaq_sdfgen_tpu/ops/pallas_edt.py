"""Pallas TPU kernels for the hot band-stencil passes.

Design (pallas_guide.md): the band contraction runs over VMEM-resident
column strips. Arrays are laid out so the stencil always slides along the
SUBLANE axis (static sublane slices are cheap; lane shifts are not) — the
row pass is handled by transposing, not by a lane-direction kernel.

  fused_sdf_bytes: full hard EXACT pipeline. Pass 1 (cummax scans) stays in
  XLA; one Pallas kernel then consumes both indicator fields' row-distance
  strips and emits final uint8 bytes: 2x(2B+1)-tap min-plus + refined sqrt
  + signed merge + clamped remap, all in VMEM — the byte image leaves HBM
  traffic at read 2 f32 fields / write 1 u8 (vs 5+ array round-trips for
  the XLA scan path).

Grid: one program per column tile; Mosaic's automatic pipelining
double-buffers the strip loads. Strips are (H + 2B, TN) so the whole
column fits in VMEM; TN adapts to the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chaq_sdfgen_tpu.ops import edt
from chaq_sdfgen_tpu.ops.threshold import hard_threshold


def _is_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _refined_sqrt_inline(n):
    """numerics.refined_sqrt, open-coded for kernel use (pure VPU ops)."""
    s0 = jnp.sqrt(n)
    c = s0 * jnp.float32(4097.0)
    hi = c - (c - s0)
    lo = s0 - hi
    e = ((n - hi * hi) - (jnp.float32(2.0) * hi) * lo) - lo * lo
    denom = jnp.float32(2.0) * s0
    corr = e / jnp.where(denom > 0, denom, jnp.float32(1.0))
    return jnp.where(n > 0, s0 + corr, jnp.float32(0.0))


_ROW_CHUNK = 256  # rows per inner pass-2 step. Re-swept on-chip for the
# round-5 looped-group + halo-operand kernel (interleaved slope timing,
# 4K spread 64): 256 beats 128 on dense noise (0.92 vs 0.99 ms pass 2)
# AND 0.1% sparse seeds (2.54 vs 2.70) and the synthetic stroke atlas
# (3.06 vs 3.39); 512 regresses both (1.45 dense — accumulator vregs
# spill), 64 regresses sparse badly (3.77 — per-chunk scalar bound
# overhead). The r2 sweep that chose 128 predates the dynamic trip
# count: back then every group paid its bound check, so small chunks
# (tighter smax) won; now skipped groups cost ~nothing and the larger
# chunk amortizes the center-tap loop's fixed overheads instead.


def _sweep_scratch(dscr, w_rows):
    """Two-sweep 1-D chamfer along sublanes over a (w_rows, L) i32 scratch
    seeded with 0/inf indicators (exact for L1): down then up, 8-row
    blocks via three intra-block log-jump shifts plus a carried last-row
    vector, as a fori_loop with 8-aligned dynamic starts.

    Why this shape (all observed on v5e): lane-direction rolls are ~50x
    slower than sublane ops, so the scan axis lives on sublanes; Mosaic
    miscompiles kernels containing more than one fully-unrolled roll
    chain, so the sweeps are fori_loops; dynamic sublane starts must be
    provably 8-aligned (pl.multiple_of)."""
    lanes = dscr.shape[1]
    inf = jnp.int32(1 << 20)
    nblk = w_rows // 8
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 0)

    def shift_down(blk, st):
        top = jnp.full((st, lanes), inf, jnp.int32)
        return jnp.concatenate([top, blk[: 8 - st, :]], axis=0)

    def shift_up(blk, st):
        bot = jnp.full((st, lanes), inf, jnp.int32)
        return jnp.concatenate([blk[st:, :], bot], axis=0)

    def down_body(i, carry):
        base = pl.multiple_of(i * 8, 8)
        blk = dscr[pl.ds(base, 8), :]
        for st in (1, 2, 4):
            blk = jnp.minimum(blk, shift_down(blk, st) + jnp.int32(st))
        blk = jnp.minimum(blk, carry + row8 + jnp.int32(1))
        dscr[pl.ds(base, 8), :] = blk
        return blk[7:8, :]

    carry0 = jnp.full((1, lanes), inf, jnp.int32)
    jax.lax.fori_loop(0, nblk, down_body, carry0)

    def up_body(i, carry):
        base = pl.multiple_of((nblk - 1 - i) * 8, 8)
        blk = dscr[pl.ds(base, 8), :]
        for st in (1, 2, 4):
            blk = jnp.minimum(blk, shift_up(blk, st) + jnp.int32(st))
        blk = jnp.minimum(blk, carry + (jnp.int32(8) - row8))
        dscr[pl.ds(base, 8), :] = blk
        return blk[0:1, :]

    jax.lax.fori_loop(0, nblk, up_body, carry0)


_P1CHUNK = 512  # pass-1 in-kernel transpose chunk width (cols per step).
# Swept on-chip r5 (interleaved slope, 4K): 512 optimal — 256 is +11%
# (0.79 vs 0.71 ms), 1024 +2% and noisier. Not the transposes' cost
# driver; pass 1 sits ~1.4x its op-count floor (NOTES round-5).


def _row_pass_body(b_ref, din_ref, dout_ref, dscr, *, wp, w_actual, band, h_mask=None,
                   out_dtype=jnp.uint8, sat=None):
    """Pass 1 with the transposes fused in: one program per TM-row block
    of the NATURAL-layout image. The block is transposed in VMEM (_P1CHUNK-col
    chunks), both polarity fields sweep along sublanes in one scratch, and
    the clipped u8 distances are transposed back on write — replacing the
    three XLA u8 transposes of the standalone path with in-kernel ones.

    h_mask: optional (dynamic) count of valid lanes (= image rows) in this
    block; lanes >= h_mask have their seeds suppressed so they read as
    saturated (no pixels exist there) — used by the extended-strip layout
    where no XLA slice runs between the passes."""
    tm = b_ref.shape[0]
    inf = jnp.int32(1 << 20)
    satv = (255 if out_dtype == jnp.uint8 else 65535) if sat is None else sat
    clipv = jnp.int32(min(band + 1, satv) if sat is None else sat)

    for c in range(0, wp, _P1CHUNK):
        cc = min(_P1CHUNK, wp - c)
        # transpose the u8 block FIRST, then widen: measured ~1 ms/4K
        # cheaper than widening to i32 before the transpose (packed u8
        # transposes shuffle 4x fewer vregs)
        blk = b_ref[:, c : c + cc].T.astype(jnp.int32)  # (cc, TM)
        if c + cc > w_actual:
            xs = jax.lax.broadcasted_iota(jnp.int32, (cc, tm), 0) + jnp.int32(c)
            valid = xs < jnp.int32(w_actual)
        else:
            valid = None
        if h_mask is not None:
            ys = jax.lax.broadcasted_iota(jnp.int32, (cc, tm), 1)
            yv = ys < h_mask
            valid = yv if valid is None else jnp.logical_and(valid, yv)
        # tri-state input: 1 = shape pixel, 0 = background, 2 = dead
        # (out-of-image — seeds NEITHER field; used by the 2-D mesh's
        # column-halo exchange where beyond-image halo cols must read as
        # saturated for both polarities). Plain bool inputs are {0, 1},
        # for which == 1 is exactly the old > 0.
        seed_in = blk == 1
        seed_out = blk == 0
        if valid is not None:
            seed_in = jnp.logical_and(seed_in, valid)
            seed_out = jnp.logical_and(seed_out, valid)
        dscr[c : c + cc, 0:tm] = jnp.where(seed_in, jnp.int32(0), inf)
        dscr[c : c + cc, tm : 2 * tm] = jnp.where(seed_out, jnp.int32(0), inf)

    _sweep_scratch(dscr, wp)

    for c in range(0, wp, _P1CHUNK):
        cc = min(_P1CHUNK, wp - c)
        d = jnp.minimum(dscr[c : c + cc, :], clipv)
        din_ref[:, c : c + cc] = d[:, 0:tm].T.astype(out_dtype)
        dout_ref[:, c : c + cc] = d[:, tm : 2 * tm].T.astype(out_dtype)


def _row_pass_block_kernel(
    b_ref, din_ref, dout_ref, dscr, *, wp, w_actual, h_real, band
):
    # h_mask: beyond-image pad rows must read saturated for BOTH fields
    # (the u8 zero-pad would otherwise seed the FALSE field there —
    # visible since out_rows exposes rows past H to the halo-operand
    # pass 2; harmless before because callers sliced [:h])
    i = pl.program_id(0)
    h_mask = jnp.int32(h_real) - i * jnp.int32(b_ref.shape[0])
    _row_pass_body(
        b_ref, din_ref, dout_ref, dscr, wp=wp, w_actual=w_actual, band=band,
        h_mask=h_mask,
    )


def _row_pass_block_kernel_ext(
    b_ref, din_ref, dout_ref, dscr, *, wp, w_actual, h_real, band, nb, npad,
    out_dtype=jnp.uint8, sat=None,
):
    """Extended-strip pass 1: grid (nb + 2*npad) row blocks. Blocks
    [0, npad) and [npad+nb, nb+2*npad) write saturated sentinel halos (the
    band's out-of-image boundary), so pass 2 can consume the outputs
    directly — no XLA pad/slice (2 fields x H x W u8 round trips) between
    the passes."""
    i = pl.program_id(0)
    tm = din_ref.shape[0]
    satv = (255 if out_dtype == jnp.uint8 else 65535) if sat is None else sat
    sentinel = jnp.logical_or(i < npad, i >= npad + nb)

    @pl.when(sentinel)
    def _():
        din_ref[:, :] = jnp.full(din_ref.shape, satv, out_dtype)
        dout_ref[:, :] = jnp.full(dout_ref.shape, satv, out_dtype)

    @pl.when(jnp.logical_not(sentinel))
    def _():
        h_mask = jnp.int32(h_real) - (i - npad) * jnp.int32(tm)
        _row_pass_body(
            b_ref, din_ref, dout_ref, dscr,
            wp=wp, w_actual=w_actual, band=band, h_mask=h_mask,
            out_dtype=out_dtype, sat=sat,
        )


def _fused_kernel(din_ref, dout_ref, smm_ref, out_ref, gin_ref, gout_ref, *, band, h, sq_dtype, off):
    """din/dout: (H + 2B, TN) uint8 row-distance strips (clipped at
    band+1); gin/gout: int16 VMEM scratch for the squared strips; out:
    (H, TN) uint8 final bytes.

    The strips stay VMEM-resident for the whole program; the u8 strips are
    squared once into i16 scratch, then compute walks the column in
    _ROW_CHUNK-row chunks so the ~8 live elementwise temporaries are
    (chunk, TN)-sized, not (H, TN)-sized (full-height temporaries blow the
    16 MB scoped-vmem budget at H = 4096).

    The band contraction folds the symmetric +-dy taps into one add:
    min(g[q-dy], g[q+dy]) + dy^2 — 3 VPU ops per 2 taps instead of 4.
    (int16 arithmetic would halve vreg traffic further, but v5e Mosaic
    cannot legalize vector arith.minsi on i16.)"""
    hext = din_ref.shape[0]
    clipv = jnp.int32(band + 1)
    for r in range(0, hext, _ROW_CHUNK):
        rc = min(_ROW_CHUNK, hext - r)
        # boundary pad rows carry 255; clip to band+1 (the saturation
        # sentinel) BEFORE squaring or 255^2 overflows the int16 scratch
        di = jnp.minimum(din_ref[r : r + rc, :].astype(jnp.int32), clipv)
        do = jnp.minimum(dout_ref[r : r + rc, :].astype(jnp.int32), clipv)
        gin_ref[r : r + rc, :] = (di * di).astype(sq_dtype)
        gout_ref[r : r + rc, :] = (do * do).astype(sq_dtype)

    def band_min(ref, r, rc):
        # Four independent accumulators: a single acc chain is
        # latency-bound on the VPU (measured ~0.27 T-op/s vs ~1 T-op/s
        # with ILP); round-robin breaks the dependency chain.
        nacc = 4
        accs = [None] * nacc
        accs[0] = ref[r + off : r + off + rc, :]  # center tap dy = 0
        for dy in range(1, band + 1):
            pair = jnp.minimum(
                ref[r + off - dy : r + off - dy + rc, :],
                ref[r + off + dy : r + off + dy + rc, :],
            )
            tap = pair + jnp.asarray(dy * dy, sq_dtype)
            j = dy % nacc
            accs[j] = tap if accs[j] is None else jnp.minimum(accs[j], tap)
        acc = accs[0]
        for j in range(1, nacc):
            if accs[j] is not None:
                acc = jnp.minimum(acc, accs[j])
        return acc.astype(jnp.float32)

    # remap range from SMEM (runtime scalars: one compiled kernel serves
    # every spread within the static band bucket — the band only needs to
    # be >= spread + 2 for byte parity, see ops/edt.py)
    s_min = smm_ref[0]
    s_max = smm_ref[1]
    for r in range(0, h, _ROW_CHUNK):
        rc = min(_ROW_CHUNK, h - r)
        d_in = _refined_sqrt_inline(band_min(gin_ref, r, rc))
        d_out = _refined_sqrt_inline(band_min(gout_ref, r, rc))
        # signed merge (openmp/sdfgen.c:98-106) + clamped remap (75-96),
        # exact float32 op order for byte parity
        biased = jnp.where(d_in > 0, d_in + jnp.float32(-1.0), d_in)
        vals = d_out - biased
        v = jnp.minimum(vals, s_max)
        v = jnp.maximum(v, s_min)
        remap = ((v - s_min) * jnp.float32(255.0)) / (s_max - s_min) + jnp.float32(0.0)
        # Mosaic has no direct f32->u8 convert; go via i32 (both truncate
        # toward zero, values are in [0, 255])
        out_ref[r : r + rc, :] = remap.astype(jnp.int32).astype(jnp.uint8)


_SEG_HARD = 64  # granularity of the pass-2 segment-min bound tables


def _looped_ok(band, row_off):
    """Use the looped-group pass-2 kernel: always for band > 512 (the
    unrolled program would blow the compile budget), and for any band
    when the strips carry the +8 headroom and CHAQ_HARD_LOOPED is not
    disabled — the dynamic trip count (~sqrt(chunk max)/8 groups)
    MEASURED faster than the unrolled 4-tap groups even at band 66
    (2.0 vs 2.45 ms on 4K dense noise)."""
    import os as _os

    if row_off < 8 * (band // 8) + 8:
        return band > 512  # will raise loudly in the caller
    if band > 512:
        return True
    return _os.environ.get("CHAQ_HARD_LOOPED", "1") != "0"



def _fill_squares(parts, gin_ref, gout_ref, clipv):
    """Square the u8/u16 row-distance strips into the f32 VMEM scratch.
    parts: list of (din_src, dout_src, dst_offset) — a single pre-extended
    strip, or local + explicit halo operands (the sharded seam-free form;
    dst offsets are 8-aligned by construction: halo rows and shard heights
    are 8-multiples)."""
    for din_src, dout_src, dst0 in parts:
        n = din_src.shape[0]
        for r in range(0, n, _ROW_CHUNK):
            rc = min(_ROW_CHUNK, n - r)
            di = jnp.minimum(din_src[r : r + rc, :].astype(jnp.int32), clipv)
            do = jnp.minimum(dout_src[r : r + rc, :].astype(jnp.int32), clipv)
            gin_ref[dst0 + r : dst0 + r + rc, :] = (di * di).astype(jnp.float32)
            gout_ref[dst0 + r : dst0 + r + rc, :] = (do * do).astype(jnp.float32)


def _fused_kernel_looped(
    din_ref, dout_ref, smm_ref, out_ref, gin_ref, gout_ref, acc_ref, dtmp_ref,
    smin_ref, seg_ref, *, band, h, off
):
    """Large-band variant of _fused_kernel_adaptive: the outer tap groups
    run as a fori_loop over 8-|dy| blocks (an unrolled band-1026 program
    exceeded the Mosaic compile budget; this one is band-independent in
    program size). Same adaptive segment-min skip bound, evaluated per
    group with clamped traced indices (clamping can only LOWER the bound
    — a group may run unnecessarily, never skip real work). Requires
    off >= 8*(band//8) + 8 (the caller requests strips with band + 8)."""
    hext = din_ref.shape[0]
    _fill_squares([(din_ref, dout_ref, 0)], gin_ref, gout_ref, jnp.int32(band + 1))
    _looped_core(
        smm_ref, out_ref, gin_ref, gout_ref, acc_ref, dtmp_ref, smin_ref,
        seg_ref, band=band, h=h, off=off, hext=hext,
    )


def _fused_kernel_looped_halo(
    dt_ref, din_ref, db_ref, ot_ref, dout_ref, ob_ref, smm_ref, out_ref,
    gin_ref, gout_ref, acc_ref, dtmp_ref, smin_ref, seg_ref, *, band, h, off
):
    """_fused_kernel_looped with the halo rows as EXPLICIT operands
    (dt/db = top/bottom din halo, ot/ob = dout halo, each (off, TN)):
    the sharded pipelines hand the ppermute-received edge rows straight to
    the kernel, which assembles local + halos in the VMEM scratch it fills
    anyway — no XLA concat copy of the whole extended strip (the design
    that removed the sharded soft-mm seams, ops/pallas_soft_mm.py)."""
    clipv = jnp.int32(band + 1)
    _fill_squares(
        [(dt_ref, ot_ref, 0), (din_ref, dout_ref, off), (db_ref, ob_ref, off + h)],
        gin_ref, gout_ref, clipv,
    )
    _looped_core(
        smm_ref, out_ref, gin_ref, gout_ref, acc_ref, dtmp_ref, smin_ref,
        seg_ref, band=band, h=h, off=off, hext=2 * off + h,
    )


def _looped_core(
    smm_ref, out_ref, gin_ref, gout_ref, acc_ref, dtmp_ref, smin_ref, seg_ref,
    *, band, h, off, hext
):
    # ceil: the tail hext % 64 rows (sharded locals' bottom halo when
    # hext isn't 64-divisible) must be covered by a segment, or the
    # clamped skip-bound indices overestimate and drop cross-seam seeds
    nseg = (hext + _SEG_HARD - 1) // _SEG_HARD
    for s in range(nseg):
        sl = slice(s * _SEG_HARD, min((s + 1) * _SEG_HARD, hext))
        seg_ref[s] = jnp.min(gin_ref[sl, :])
        seg_ref[nseg + s] = jnp.min(gout_ref[sl, :])

    ngroups = band // 8

    def band_min_chunk(ref, r, rc, field_idx):
        seg0 = field_idx * nseg
        acc = ref[r + off : r + off + rc, :]
        for dy in range(1, min(8, band) + 1):
            pair = jnp.minimum(
                ref[r + off - dy : r + off - dy + rc, :],
                ref[r + off + dy : r + off + dy + rc, :],
            )
            acc = jnp.minimum(acc, pair + jnp.float32(dy * dy))
        acc_ref[0:rc, :] = acc
        smin_ref[2] = jnp.max(acc)

        def group(gi, _):
            dylo = gi * 8  # taps dy = dylo+1 .. dylo+8
            base_up = r + off - dylo - 8
            base_dn = r + off + dylo
            span = rc // _SEG_HARD + 1
            lo_up = base_up // _SEG_HARD
            lo_dn = base_dn // _SEG_HARD
            wmin = seg_ref[seg0 + jnp.clip(lo_up, 0, nseg - 1)]
            for t in range(1, span + 1):
                wmin = jnp.minimum(
                    wmin, seg_ref[seg0 + jnp.clip(lo_up + t, 0, nseg - 1)]
                )
            for t in range(span + 1):
                wmin = jnp.minimum(
                    wmin, seg_ref[seg0 + jnp.clip(lo_dn + t, 0, nseg - 1)]
                )
            dylo1 = dylo + 1
            lo = (dylo1 * dylo1).astype(jnp.float32) + wmin

            @pl.when(lo < smin_ref[2])
            def _():
                up = ref[pl.ds(pl.multiple_of(base_up, 8), rc + 8), :]
                dn = ref[pl.ds(pl.multiple_of(base_dn, 8), rc + 8), :]
                a = acc_ref[0:rc, :]
                for j in range(1, 9):
                    dy = dylo + j
                    pair = jnp.minimum(up[8 - j : 8 - j + rc, :], dn[j : j + rc, :])
                    a = jnp.minimum(a, pair + (dy * dy).astype(jnp.float32))
                acc_ref[0:rc, :] = a
                smin_ref[2] = jnp.max(a)

            return 0

        # dynamic trip count: a tap at dy improves a pixel only if
        # dy^2 < acc[p] <= chunk max, so groups beyond sqrt(max) never
        # matter — dense images run ~1 group instead of paying the
        # scalar bound-check loop for all band//8 (measured 14 ms ->
        # the -s 64 cost at 4K -s 1024 on dense noise)
        dy_lim = jnp.sqrt(jnp.maximum(smin_ref[2], 0.0)).astype(jnp.int32) + 1
        gmax = jnp.minimum(jnp.int32(ngroups), (dy_lim + 8) // 8)
        jax.lax.fori_loop(1, gmax + 1, group, 0)
        return _refined_sqrt_inline(acc_ref[0:rc, :])

    s_min = smm_ref[0]
    s_max = smm_ref[1]
    for r in range(0, h, _ROW_CHUNK):
        rc = min(_ROW_CHUNK, h - r)
        dtmp_ref[0:rc, :] = band_min_chunk(gin_ref, r, rc, 0)
        d_out = band_min_chunk(gout_ref, r, rc, 1)
        d_in = dtmp_ref[0:rc, :]
        biased = jnp.where(d_in > 0, d_in + jnp.float32(-1.0), d_in)
        vals = d_out - biased
        v = jnp.minimum(vals, s_max)
        v = jnp.maximum(v, s_min)
        remap = ((v - s_min) * jnp.float32(255.0)) / (s_max - s_min) + jnp.float32(0.0)
        out_ref[r : r + rc, :] = remap.astype(jnp.int32).astype(jnp.uint8)


def _fused_kernel_adaptive(
    din_ref, dout_ref, smm_ref, out_ref, gin_ref, gout_ref, acc_ref, dtmp_ref,
    smin_ref, seg_ref, *, band, h, off, gsz=4
):
    """Adaptive variant of _fused_kernel: taps run in 4-|dy| groups from the
    center outward, and a group is skipped when its lower bound
    (min dy^2 in group + min of the strip rows the group actually reads,
    from a per-64-row segment-min table) provably cannot improve any pixel
    of the current chunk — the TPU-native form of the reference search's
    bound shrinking (opencl/sdf.cl:66-69, 100-103). Byte-exact: work is
    only skipped when it cannot change the minimum. The windowed bound
    (vs the strip-global min used before) is what makes sparse
    glyph-atlas images skip: a chunk far from any stroke sees saturated
    window minima and drops every outer group, where the global minimum
    (0 at some stroke) would force the full stencil.

    Extra scratch: acc_ref (chunk accumulator, predicated updates need a
    mutable ref), dtmp_ref (holds d_in while d_out is computed),
    smin_ref (SMEM: chunk max), seg_ref (SMEM: both fields' segment
    minima, gin at seg0=0, gout at seg0=nseg)."""
    hext = din_ref.shape[0]
    _fill_squares([(din_ref, dout_ref, 0)], gin_ref, gout_ref, jnp.int32(band + 1))
    _adaptive_core(
        smm_ref, out_ref, gin_ref, gout_ref, acc_ref, dtmp_ref, smin_ref,
        seg_ref, band=band, h=h, off=off, gsz=gsz, hext=hext,
    )


def _fused_kernel_adaptive_halo(
    dt_ref, din_ref, db_ref, ot_ref, dout_ref, ob_ref, smm_ref, out_ref,
    gin_ref, gout_ref, acc_ref, dtmp_ref, smin_ref, seg_ref,
    *, band, h, off, gsz=4
):
    """_fused_kernel_adaptive with explicit (off, TN) halo operands —
    see _fused_kernel_looped_halo."""
    clipv = jnp.int32(band + 1)
    _fill_squares(
        [(dt_ref, ot_ref, 0), (din_ref, dout_ref, off), (db_ref, ob_ref, off + h)],
        gin_ref, gout_ref, clipv,
    )
    _adaptive_core(
        smm_ref, out_ref, gin_ref, gout_ref, acc_ref, dtmp_ref, smin_ref,
        seg_ref, band=band, h=h, off=off, gsz=gsz, hext=2 * off + h,
    )


def _adaptive_core(
    smm_ref, out_ref, gin_ref, gout_ref, acc_ref, dtmp_ref, smin_ref, seg_ref,
    *, band, h, off, gsz, hext
):
    nseg = (hext + _SEG_HARD - 1) // _SEG_HARD
    for s in range(nseg):
        sl = slice(s * _SEG_HARD, min((s + 1) * _SEG_HARD, hext))
        seg_ref[s] = jnp.min(gin_ref[sl, :])
        seg_ref[nseg + s] = jnp.min(gout_ref[sl, :])

    # outer tap groups of ``gsz`` |dy|'s each (4 for the u8 band buckets —
    # the measured sweet spot; 16/32 for large-spread u16 bands, where
    # 4-tap groups would blow the unrolled Mosaic program size)
    n_groups = 1 + max(0, -(-(band - 4) // gsz))

    def band_min_chunk(ref, r, rc, field_idx):
        seg0 = field_idx * nseg

        def win_min(lo_row, hi_row):
            # min over seg table rows [lo_row, hi_row) clamped to strip
            lo_s = max(lo_row, 0) // _SEG_HARD
            hi_s = (min(hi_row, hext) + _SEG_HARD - 1) // _SEG_HARD
            m = seg_ref[seg0 + lo_s]
            for s in range(lo_s + 1, hi_s):
                m = jnp.minimum(m, seg_ref[seg0 + s])
            return m

        # center group: dy = 0..4 (unconditional; 4-tap groups measured
        # faster than 8 — the always-on central group is the floor cost)
        acc = ref[r + off : r + off + rc, :]
        for dy in range(1, min(4, band) + 1):
            pair = jnp.minimum(
                ref[r + off - dy : r + off - dy + rc, :],
                ref[r + off + dy : r + off + dy + rc, :],
            )
            acc = jnp.minimum(acc, pair + jnp.float32(dy * dy))
        acc_ref[0:rc, :] = acc
        smin_ref[2] = jnp.max(acc)

        for g in range(1, n_groups):
            dylo = 4 + (g - 1) * gsz + 1
            if dylo > band:
                break
            dyhi = min(4 + g * gsz, band)
            wmin = jnp.minimum(
                win_min(r + off - dyhi, r + off - dylo + rc),
                win_min(r + off + dylo, r + off + dyhi + rc),
            )
            lo = jnp.float32(dylo * dylo) + wmin

            @pl.when(lo < smin_ref[2])
            def _():
                a = acc_ref[0:rc, :]
                for dy in range(dylo, dyhi + 1):
                    pair = jnp.minimum(
                        ref[r + off - dy : r + off - dy + rc, :],
                        ref[r + off + dy : r + off + dy + rc, :],
                    )
                    a = jnp.minimum(a, pair + jnp.float32(dy * dy))
                acc_ref[0:rc, :] = a
                smin_ref[2] = jnp.max(a)

        return _refined_sqrt_inline(acc_ref[0:rc, :])

    # remap range from SMEM (runtime scalars — see _fused_kernel)
    s_min = smm_ref[0]
    s_max = smm_ref[1]
    for r in range(0, h, _ROW_CHUNK):
        rc = min(_ROW_CHUNK, h - r)
        dtmp_ref[0:rc, :] = band_min_chunk(gin_ref, r, rc, 0)
        d_out = band_min_chunk(gout_ref, r, rc, 1)
        d_in = dtmp_ref[0:rc, :]
        biased = jnp.where(d_in > 0, d_in + jnp.float32(-1.0), d_in)
        vals = d_out - biased
        v = jnp.minimum(vals, s_max)
        v = jnp.maximum(v, s_min)
        remap = ((v - s_min) * jnp.float32(255.0)) / (s_max - s_min) + jnp.float32(0.0)
        out_ref[r : r + rc, :] = remap.astype(jnp.int32).astype(jnp.uint8)


def _pick_tn(strip_rows: int, h: int, w: int) -> int:
    """Lane-tile width for pass 2. 128 wherever the strip is tall enough
    to amortize per-program overhead: narrow tiles localize the adaptive
    skip bound (a scalar per chunk), measured 3.58 vs 3.09 Gpix/s on the
    glyph atlas against 256 lanes. Short strips fall back to the VMEM
    budget rule (fewer, wider programs)."""
    if strip_rows >= 512:
        return min(128, max((w // 128) * 128, 128))
    budget = 12 * 1024 * 1024
    per_lane = strip_rows * 4 * 2 * 2 + h * 1 * 2  # 2 fields x 2 buffers + u8 out
    tn = budget // max(per_lane, 1)
    tn = min(tn, w, 2048)
    tn = (tn // 128) * 128
    return max(tn, 128)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def row_distances_u8(
    b: jnp.ndarray, band: int, interpret: bool | None = None,
    out_rows: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pass 1 only: (H, W) bool -> (din, dout) uint8 (H, W) per-row
    nearest-seed / nearest-non-seed distances, clipped at min(band+1, 255).

    Exposed separately so sharded pipelines can run pass 1 locally per
    shard (rows never cross shards, like the omp-for axis of
    openmp/df.c:113-117), exchange a band-row halo of the u8 strips over
    ICI, and feed fused_pass2_bytes the pre-extended strips.

    out_rows: return that many rows instead of H (out_rows <= the 128-
    aligned compute height; rows beyond H hold the saturation sentinel —
    the 8-aligned padding fused_pass2_bytes_halo consumes)."""
    if interpret is None:
        interpret = not _is_tpu()
    h, w = b.shape
    wp = _round_up(w, 128)
    tm = 128
    hpa = _round_up(h, tm)
    b_p = jnp.pad(b.astype(jnp.uint8), ((0, hpa - h), (0, wp - w)))
    kern_a = functools.partial(
        _row_pass_block_kernel, wp=wp, w_actual=w, h_real=h, band=band
    )
    din, dout = pl.pallas_call(
        kern_a,
        grid=(hpa // tm,),
        in_specs=[pl.BlockSpec((tm, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((tm, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hpa, wp), jnp.uint8),
            jax.ShapeDtypeStruct((hpa, wp), jnp.uint8),
        ],
        scratch_shapes=[pltpu.VMEM((wp, 2 * tm), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(b_p)
    hr = h if out_rows is None else out_rows
    if hr > hpa:
        raise ValueError(f"row_distances_u8: out_rows {hr} > padded height {hpa}")
    return din[:hr, :w], dout[:hr, :w]


def row_distances_u8_ext(
    b: jnp.ndarray, band: int, interpret: bool | None = None,
    dtype=jnp.uint8, sat: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, int]:
    """Pass 1 emitting sentinel-extended strips: (H, W) bool ->
    (din_full, dout_full, row_off) where the full arrays are
    ((nb + 2*npad)*TM, Wp) ``dtype``, image row y lives at strip row
    row_off + y, rows outside [row_off, row_off + H) read saturated, and
    columns beyond W read saturated too (no seeds there). Feeds
    fused_pass2_bytes(row_off=...) with zero XLA pad/slice between the
    passes.

    dtype=jnp.uint16 lifts the distance saturation to 65535 for
    large-spread runs (band > 253); the reference's EDT has no spread
    limit at all (openmp/df.c:29-136 — runtime independent of -s)."""
    if interpret is None:
        interpret = not _is_tpu()
    h, w = b.shape
    wp = _round_up(w, 128)
    tm = 128
    hpa = _round_up(h, tm)
    nb = hpa // tm
    npad = -(-band // tm)  # sentinel blocks per side (band may exceed TM)
    b_p = jnp.pad(b.astype(jnp.uint8), ((0, hpa - h), (0, wp - w)))
    kern = functools.partial(
        _row_pass_block_kernel_ext,
        wp=wp, w_actual=w, h_real=h, band=band, nb=nb, npad=npad,
        out_dtype=dtype, sat=sat,
    )
    din, dout = pl.pallas_call(
        kern,
        grid=(nb + 2 * npad,),
        in_specs=[
            pl.BlockSpec(
                (tm, wp),
                lambda i: (jnp.clip(i - npad, 0, nb - 1), 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[
            pl.BlockSpec((tm, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(((nb + 2 * npad) * tm, wp), dtype),
            jax.ShapeDtypeStruct(((nb + 2 * npad) * tm, wp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((wp, 2 * tm), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(b_p)
    return din, dout, npad * tm


def fused_pass2_bytes(
    din_ext: jnp.ndarray,
    dout_ext: jnp.ndarray,
    spread: int,
    asymmetric: bool,
    band: int,
    interpret: bool | None = None,
    adaptive: bool = True,
    row_off: int | None = None,
    out_rows: int | None = None,
) -> jnp.ndarray:
    """Kernel B on pre-extended strips -> (H, W) uint8 final bytes.

    Legacy layout (row_off=None): strips are (H + 2*band, W) with image
    row y at strip row y + band (boundary sentinel 255 or an exchanged
    shard halo).

    Extended layout (row_off given, from row_distances_u8_ext): image row
    y lives at strip row row_off + y; out_rows gives H (the strips carry
    their own sentinel halos and alignment padding). H must be a multiple
    of 8 (sublane alignment of the in-kernel chunking)."""
    if interpret is None:
        interpret = not _is_tpu()
    hext, w = din_ext.shape
    if row_off is None:
        row_off = band
        hp = hext - 2 * band
    else:
        if out_rows is None:
            raise ValueError("fused_pass2_bytes: out_rows required with row_off")
        hp = out_rows
    if hp % 8 != 0:
        raise ValueError(f"fused_pass2_bytes: H = {hp} must be a multiple of 8")
    sat = 255 if din_ext.dtype == jnp.uint8 else 65535
    wp = _round_up(w, 128)
    tn = _pick_tn(hext, hp, wp)
    if wp % tn != 0:
        # prefer a lane tile that divides the (128-aligned) width: padding
        # the strips costs a u8 round trip per field
        tn_div = tn
        while wp % tn_div != 0:
            tn_div -= 128
        if tn_div >= 128:
            tn = tn_div
        else:
            wp = _round_up(wp, tn)
    if wp != w:
        din_ext = jnp.pad(din_ext, ((0, 0), (0, wp - w)), constant_values=sat)
        dout_ext = jnp.pad(dout_ext, ((0, 0), (0, wp - w)), constant_values=sat)

    # remap range as a runtime SMEM input: spread may be a TRACED scalar
    # (fused_sdf_bytes_dynamic), in which case one compiled kernel serves
    # every spread within the static band bucket
    spread_f = jnp.asarray(spread, jnp.float32)
    s_min = jnp.float32(0.0) if asymmetric else -spread_f
    smm = jnp.stack([jnp.asarray(s_min, jnp.float32), spread_f])

    nseg = (hext + _SEG_HARD - 1) // _SEG_HARD
    # NOTE: a combined-field variant (both squared strips side by side in
    # one double-width scratch, bounds/reductions once per chunk) was
    # measured WORSE on-chip: 3.23 vs 2.42 ms on 4K noise — the shared
    # skip bound couples the fields (a group must run when EITHER field
    # needs it) and the double-width chunks spill; per-field scans win.
    adaptive_scratch = [
        pltpu.VMEM((_ROW_CHUNK, tn), jnp.float32),  # chunk accumulator
        pltpu.VMEM((_ROW_CHUNK, tn), jnp.float32),  # d_in hold
        pltpu.SMEM((4,), jnp.float32),              # chunk max
        pltpu.SMEM((2 * nseg,), jnp.float32),       # per-field segment minima
    ]
    if adaptive and _looped_ok(band, row_off):
        # large bands: the looped-group kernel (program size independent
        # of band; an unrolled band-1026 kernel exceeded the Mosaic
        # compile budget). Needs strip headroom for the last group.
        if row_off < 8 * (band // 8) + 8:
            raise ValueError(
                f"fused_pass2_bytes: looped kernel needs row_off >= band+8 "
                f"(got {row_off} for band {band}); request strips with band+8"
            )
        kern_b = functools.partial(
            _fused_kernel_looped, band=band, h=hp, off=row_off,
        )
        base_scratch = [
            pltpu.VMEM((hext, tn), jnp.float32),
            pltpu.VMEM((hext, tn), jnp.float32),
        ]
        extra_scratch = adaptive_scratch
    elif adaptive:
        gsz = 4 if band <= 160 else 16
        kern_b = functools.partial(
            _fused_kernel_adaptive, band=band, h=hp, off=row_off, gsz=gsz,
        )
        base_scratch = [
            pltpu.VMEM((hext, tn), jnp.float32),
            pltpu.VMEM((hext, tn), jnp.float32),
        ]
        extra_scratch = adaptive_scratch
    else:
        kern_b = functools.partial(
            _fused_kernel, band=band, h=hp, sq_dtype=jnp.float32, off=row_off,
        )
        base_scratch = [
            pltpu.VMEM((hext, tn), jnp.float32),
            pltpu.VMEM((hext, tn), jnp.float32),
        ]
        extra_scratch = []
    out = pl.pallas_call(
        kern_b,
        grid=(wp // tn,),
        in_specs=[
            pl.BlockSpec((hext, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((hext, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((hp, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.uint8),
        scratch_shapes=base_scratch + extra_scratch,
        # vmapped batch shapes push the compiler's scoped (stack) vmem
        # past the 16 MB default (seen at (8, 1024, 1024): 17.15 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(din_ext, dout_ext, smm)
    return out[:, :w]


def fused_pass2_bytes_halo(
    din: jnp.ndarray,
    dout: jnp.ndarray,
    up_in: jnp.ndarray,
    dn_in: jnp.ndarray,
    up_out: jnp.ndarray,
    dn_out: jnp.ndarray,
    spread,
    asymmetric: bool,
    band: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pass 2 with the halo rows as EXPLICIT kernel operands — the
    sharded seam-free form. din/dout: (H, W) local row-distance strips
    (H an 8-multiple); up/dn: (HR, W) neighbour halo strips from
    exchange_row_halo_parts (HR = roundup(band+8, 8), 255/sentinel fill
    at image edges). Byte-identical to fused_pass2_bytes on the
    concatenated strips: the kernel assembles exactly the same VMEM
    scratch, so the only difference is that the whole-strip XLA concat
    copy never happens (measured +8.9% 1-dev overhead in BENCH_r04).

    Reference bar: the OpenCL NDRange decomposition has zero
    per-tile assembly cost (opencl/main.cpp:798)."""
    if interpret is None:
        interpret = not _is_tpu()
    hp, w = din.shape
    hr = up_in.shape[0]
    if hp % 8 != 0 or hr % 8 != 0:
        raise ValueError(
            f"fused_pass2_bytes_halo: H = {hp} and HR = {hr} must be 8-multiples"
        )
    if hr < 8 * (band // 8) + 8:
        raise ValueError(
            f"fused_pass2_bytes_halo: HR = {hr} must be >= band + 8 (band {band})"
        )
    hext = hp + 2 * hr
    sat = 255 if din.dtype == jnp.uint8 else 65535
    wp = _round_up(w, 128)
    tn = _pick_tn(hext, hp, wp)
    if wp % tn != 0:
        tn_div = tn
        while wp % tn_div != 0:
            tn_div -= 128
        if tn_div >= 128:
            tn = tn_div
        else:
            wp = _round_up(wp, tn)
    strips = [din, dout, up_in, dn_in, up_out, dn_out]
    if wp != w:
        strips = [
            jnp.pad(s, ((0, 0), (0, wp - s.shape[1])), constant_values=sat)
            for s in strips
        ]
    din_p, dout_p, up_in_p, dn_in_p, up_out_p, dn_out_p = strips

    spread_f = jnp.asarray(spread, jnp.float32)
    s_min = jnp.float32(0.0) if asymmetric else -spread_f
    smm = jnp.stack([jnp.asarray(s_min, jnp.float32), spread_f])

    nseg = (hext + _SEG_HARD - 1) // _SEG_HARD
    scratch = [
        pltpu.VMEM((hext, tn), jnp.float32),
        pltpu.VMEM((hext, tn), jnp.float32),
        pltpu.VMEM((_ROW_CHUNK, tn), jnp.float32),
        pltpu.VMEM((_ROW_CHUNK, tn), jnp.float32),
        pltpu.SMEM((4,), jnp.float32),
        pltpu.SMEM((2 * nseg,), jnp.float32),
    ]
    if _looped_ok(band, hr):
        kern = functools.partial(
            _fused_kernel_looped_halo, band=band, h=hp, off=hr,
        )
    else:
        gsz = 4 if band <= 160 else 16
        kern = functools.partial(
            _fused_kernel_adaptive_halo, band=band, h=hp, off=hr, gsz=gsz,
        )

    def spec(rows):
        return pl.BlockSpec((rows, tn), lambda j: (0, j), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(wp // tn,),
        in_specs=[
            spec(hr), spec(hp), spec(hr),
            spec(hr), spec(hp), spec(hr),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((hp, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.uint8),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(up_in_p, din_p, dn_in_p, up_out_p, dout_p, dn_out_p, smm)
    return out[:, :w]


@functools.partial(
    jax.jit, static_argnames=("spread", "asymmetric", "band", "interpret", "adaptive")
)
def fused_sdf_bytes(
    b: jnp.ndarray,
    spread: int,
    asymmetric: bool = False,
    band: int | None = None,
    interpret: bool | None = None,
    adaptive: bool = True,
) -> jnp.ndarray:
    """Hard EXACT pipeline, Pallas-fused pass 2. b: (..., H, W) bool ->
    (..., H, W) uint8, byte-identical to the OpenMP reference (see
    ops/edt.py for the banding argument)."""
    band = band if band is not None else spread + 2
    if interpret is None:
        interpret = not _is_tpu()

    if b.ndim > 2:
        fn = functools.partial(
            fused_sdf_bytes, spread=spread, asymmetric=asymmetric, band=band,
            interpret=interpret, adaptive=adaptive,
        )
        for _ in range(b.ndim - 2):
            fn = jax.vmap(fn)
        return fn(b)

    h, w = b.shape
    if h <= 1 or band + 1 > 65535:
        # single-row reference quirk (no pass-2 sqrt), or distances beyond
        # even the u16 intermediate's range: take the XLA path
        from chaq_sdfgen_tpu.ops import merge

        d_in, d_out = edt.dual_edt_banded(b, band)
        return merge.remap_to_byte(merge.signed_merge(d_out, d_in), spread, asymmetric)

    # large-spread regime: u16 row-distance strips lift the u8 saturation
    # ceiling (the reference EDT is spread-independent, openmp/df.c:29-136);
    # the adaptive pass-2 skip bounds keep the cost near the content's
    # actual distance scale rather than O(band)
    dtype = jnp.uint8 if band + 1 <= 255 else jnp.uint16
    hp = _round_up(h, 8)
    if adaptive and band + 1 <= 255:
        # halo-operand form with constant sentinel halos: the pass-2
        # kernel reads roundup(band+8, 8) sentinel rows per side instead
        # of the ext strips' ceil(band/128)*128, and pass 1 skips writing
        # the sentinel blocks entirely. Byte-identical (same assembled
        # scratch semantics); measured 1.94 -> 1.87 ms at 4K -s 64 via
        # the sharded 1-dev bench row that first used this layout.
        hr = -(-(band + 8) // 8) * 8
        din, dout = row_distances_u8(b, band, interpret=interpret, out_rows=hp)
        sent_halo = jnp.full((hr, din.shape[1]), 255, jnp.uint8)
        out = fused_pass2_bytes_halo(
            din, dout, sent_halo, sent_halo, sent_halo, sent_halo,
            spread, asymmetric, band, interpret=interpret,
        )
        return out[:h, :w]
    # +8 headroom (mirrors fused_sdf_bytes_dynamic): when band is a
    # multiple of 128, row_off == band and the looped kernel's last-group
    # reads would fall outside the strip; pass 2 re-clips to band+1 so
    # the output stays byte-identical
    band_req = band + 8 if adaptive else band
    din_f, dout_f, row_off = row_distances_u8_ext(
        b, band_req, interpret=interpret, dtype=dtype
    )
    out = fused_pass2_bytes(
        din_f, dout_f, spread, asymmetric, band, interpret=interpret,
        adaptive=adaptive, row_off=row_off, out_rows=hp,
    )
    return out[:h, :w]


@functools.partial(
    jax.jit, static_argnames=("band", "asymmetric", "interpret", "adaptive")
)
def fused_sdf_bytes_dynamic(
    b: jnp.ndarray,
    spread: jnp.ndarray,
    band: int,
    asymmetric: bool = False,
    interpret: bool | None = None,
    adaptive: bool = True,
) -> jnp.ndarray:
    """Hard EXACT pipeline with a RUNTIME spread: one compiled program
    serves every spread <= band - 2 (spread sweeps — atlas generation,
    training curricula — pay one ~minutes-scale Mosaic compile per band
    bucket instead of one per spread value; a novel 4K kernel compiles in
    ~7 min through this harness's remote-compile tunnel).

    Byte-identical to fused_sdf_bytes(b, int(spread), band=band): taps
    beyond spread + 2 only contribute distances > spread + 1, which the
    byte remap clamps identically (the banding argument, ops/edt.py),
    and the remap range enters the kernel as an SMEM scalar. Pick e.g.
    band = roundup(max_spread + 2, 16).

    b: (..., H, W) bool; spread: () int/float scalar array."""
    if band + 1 > 65535:
        raise ValueError(f"fused_sdf_bytes_dynamic needs band <= 65534, got {band}")
    if interpret is None:
        interpret = not _is_tpu()
    if b.ndim > 2:
        fn = functools.partial(
            fused_sdf_bytes_dynamic, band=band, asymmetric=asymmetric,
            interpret=interpret, adaptive=adaptive,
        )
        for _ in range(b.ndim - 2):
            fn = jax.vmap(fn, in_axes=(0, None))
        return fn(b, spread)
    h, w = b.shape
    if h <= 1:
        raise ValueError(
            "fused_sdf_bytes_dynamic: single-row images take the reference's "
            "no-sqrt quirk path — use fused_sdf_bytes (static spread)"
        )
    hp = _round_up(h, 8)
    dtype = jnp.uint8 if band + 1 <= 255 else jnp.uint16
    if adaptive and band + 1 <= 255:
        # constant-sentinel halo-operand form (see fused_sdf_bytes)
        hr = -(-(band + 8) // 8) * 8
        din, dout = row_distances_u8(b, band, interpret=interpret, out_rows=hp)
        sent_halo = jnp.full((hr, din.shape[1]), 255, jnp.uint8)
        out = fused_pass2_bytes_halo(
            din, dout, sent_halo, sent_halo, sent_halo, sent_halo,
            spread, asymmetric, band, interpret=interpret,
        )
        return out[:h, :w]
    band_req = band + 8 if adaptive else band
    din_f, dout_f, row_off = row_distances_u8_ext(
        b, band_req, interpret=interpret, dtype=dtype
    )
    out = fused_pass2_bytes(
        din_f, dout_f, spread, asymmetric, band, interpret=interpret,
        adaptive=adaptive, row_off=row_off, out_rows=hp,
    )
    return out[:h, :w]


# ---------------------------------------------------------------------------
# Full-range EXACT distance field (f32) — the exact counterpart of
# ops/jfa.jfa_distance (and ~4.6x faster at 4K dense): distance from every
# pixel to its nearest TRUE pixel with NO spread clamp. Same two-pass
# structure as the hard pipeline, but the band is the full image height,
# so the pass-2 tap loop is a fori_loop over 8-|dy| groups (an unrolled
# band-4095 program would be ~65k statements) with the adaptive
# segment-min skip bound evaluated per group — dense images run a few
# groups per chunk; the worst case (one far seed) degrades to O(H) taps
# per column, the price of exactness (JFA stays the approximate
# alternative and the scale-out tier).
#
# Exactness: row distances are exact integers clipped at _DSAT = 8191 >
# max real distance for images up to 4K x 4K (so a no-seed row's
# sentinel can never beat a real candidate: 8191^2 > 4095^2 + 4095^2);
# d^2 accumulates in i32 (values up to ~84M exceed f32's exact-integer
# range). Pixels with no seed anywhere read 32768.0, matching
# jfa_distance's no-seed value.
# ---------------------------------------------------------------------------

_DSAT = 8191  # row-distance saturation: > sqrt(2) * 4095, squares fit i32
_DCHUNK = 256  # output rows per chunk (coarser than the banded kernel:
# the looped groups amortize better over taller chunks)


def _dist_sat(n: int) -> int | None:
    """Smallest saturation tier for an image whose longest side is n.

    Requirements (the exactness argument): (a) sat > sqrt(2)*(n-1) so a
    no-seed row's sentinel can never beat a real candidate, (b)
    sat^2 + (n-1)^2 < 2^31 so d^2 accumulates exactly in i32, (c)
    sat <= 65535 (u16 strips). 8191 keeps the <=4096 cache keys stable;
    16383 serves <=8192; 23170 serves <=16384 (23170^2 + 16383^2 =
    8.05e8 < 2^31, and 23170^2 > 2*16383^2 by a 43k margin). Beyond
    16384 px per side i32 overflows -> None (JFA fallback)."""
    if n <= 4096:
        return _DSAT
    if n <= 8192:
        return 16383
    if n <= 16384:
        return 23170
    return None


def _dist_kernel(d_ref, out_ref, g_ref, acc_ref, smin_ref, seg_ref, *,
                 hext, h, off, band, sat=_DSAT):
    """d_ref: (hext, TN) u16 row-distance strip (one polarity, sentinel-
    extended, clipped at ``sat`` — see _dist_sat); out: (h, TN) f32 exact
    distances."""
    satsq = jnp.int32(sat * sat)
    # ceil + clamped fill slice: keeps the skip bound conservative even
    # if strip geometry stops being a 64-row multiple (see
    # _fused_kernel_looped's seam note)
    nseg = (hext + _SEG_HARD - 1) // _SEG_HARD
    # squares fill stays at 128-row chunks: the r5 _ROW_CHUNK=256 re-sweep
    # showed a small consistent regression here (1.67 vs 1.63 ms e2e) —
    # the i32 widen+mul carries more live temporaries than the f32 fill
    for r in range(0, hext, 128):
        rc = min(128, hext - r)
        di = d_ref[r : r + rc, :].astype(jnp.int32)
        g_ref[r : r + rc, :] = di * di
    for s in range(nseg):
        sl = slice(s * _SEG_HARD, min((s + 1) * _SEG_HARD, hext))
        seg_ref[s] = jnp.min(g_ref[sl, :])

    ngroups = band // 8  # groups of 8 |dy| taps beyond the center group

    for r in range(0, h, _DCHUNK):
        rc = min(_DCHUNK, h - r)
        # center group: dy in [0, 8] (static slices)
        acc = g_ref[r + off : r + off + rc, :]
        for dy in range(1, min(8, band) + 1):
            pair = jnp.minimum(
                g_ref[r + off - dy : r + off - dy + rc, :],
                g_ref[r + off + dy : r + off + dy + rc, :],
            )
            acc = jnp.minimum(acc, pair + jnp.int32(dy * dy))
        acc_ref[0:rc, :] = acc
        smin_ref[0] = jnp.max(acc)

        def group(gi, _):
            dylo = gi * 8  # taps dy = dylo+1 .. dylo+8
            # window bound from the segment-min table: the rows the
            # group's 16 taps read, both directions (a clamped index may
            # pull an adjacent segment into the min — it only LOWERS the
            # bound, i.e. runs a group unnecessarily, never skips work
            # that could matter)
            base_up = r + off - dylo - 8
            base_dn = r + off + dylo
            span = rc // _SEG_HARD + 1
            lo_up = base_up // _SEG_HARD
            lo_dn = base_dn // _SEG_HARD
            wmin = seg_ref[jnp.clip(lo_up, 0, nseg - 1)]
            for t in range(1, span + 1):
                wmin = jnp.minimum(
                    wmin, seg_ref[jnp.clip(lo_up + t, 0, nseg - 1)]
                )
            for t in range(span + 1):
                wmin = jnp.minimum(
                    wmin, seg_ref[jnp.clip(lo_dn + t, 0, nseg - 1)]
                )
            dylo1 = dylo + 1
            bound = dylo1 * dylo1 + wmin

            @pl.when(bound < smin_ref[0])
            def _():
                up = g_ref[pl.ds(pl.multiple_of(base_up, 8), rc + 8), :]
                dn = g_ref[pl.ds(pl.multiple_of(base_dn, 8), rc + 8), :]
                a = acc_ref[0:rc, :]
                for j in range(1, 9):
                    dy = dylo + j
                    pair = jnp.minimum(up[8 - j : 8 - j + rc, :], dn[j : j + rc, :])
                    a = jnp.minimum(a, pair + (dy * dy))
                acc_ref[0:rc, :] = a
                smin_ref[0] = jnp.max(a)

            return 0

        # dynamic trip count (see _fused_kernel_looped): groups beyond
        # sqrt(chunk max d^2) cannot improve any pixel
        dy_lim = jnp.sqrt(
            jnp.maximum(smin_ref[0].astype(jnp.float32), 0.0)
        ).astype(jnp.int32) + 1
        gmax = jnp.minimum(jnp.int32(ngroups), (dy_lim + 8) // 8)
        jax.lax.fori_loop(1, gmax + 1, group, 0)

        d2 = acc_ref[0:rc, :]
        dist = _refined_sqrt_inline(d2.astype(jnp.float32))
        out_ref[r : r + rc, :] = jnp.where(
            d2 >= satsq, jnp.float32(32768.0), dist
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def exact_distance_field(
    seeds: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """(H, W) bool -> (H, W) f32 EXACT full-range distance to the nearest
    True pixel (32768.0 where none exists) — jfa_distance's semantics
    without its rare misses, measured 4.6x faster at 4K dense. Images up
    to 16384 px per side run exactly (saturation tier per _dist_sat);
    larger inputs dispatch to jfa_distance automatically (i32 d^2 would
    overflow)."""
    if interpret is None:
        interpret = not _is_tpu()
    if seeds.ndim > 2:
        fn = functools.partial(exact_distance_field, interpret=interpret)
        for _ in range(seeds.ndim - 2):
            fn = jax.vmap(fn)
        return fn(seeds)
    h, w = seeds.shape
    sat = _dist_sat(max(h, w))
    if sat is None:
        from chaq_sdfgen_tpu.ops import jfa as jfa_ops

        return jfa_ops.jfa_distance(seeds)
    band = max(h - 1, 1)
    # the strips are requested with band + 8 so the last 8-tap group's
    # reads stay inside the sentinel halo; the opposite-polarity output
    # is simply discarded (pass 1 computes both in one sweep scratch)
    din_f, _, row_off = row_distances_u8_ext(
        seeds, band + 8, interpret=interpret, dtype=jnp.uint16, sat=sat
    )
    hext = din_f.shape[0]
    hp = _round_up(h, 8)
    wp = din_f.shape[1]
    tn = 128
    nseg = (hext + _SEG_HARD - 1) // _SEG_HARD
    kern = functools.partial(
        _dist_kernel, hext=hext, h=hp, off=row_off, band=band, sat=sat
    )
    out = pl.pallas_call(
        kern,
        grid=(wp // tn,),
        in_specs=[
            pl.BlockSpec((hext, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hp, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hext, tn), jnp.int32),
            pltpu.VMEM((_DCHUNK, tn), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((nseg,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(din_f)
    return out[:h, :w]
