"""Pallas TPU kernels for the soft (differentiable) band soft-min.

Same strip layout as the hard kernel (pallas_edt.py): the stencil slides
along sublanes over a VMEM-resident column strip; the row-direction pass is
expressed by transposing outside. Two kernels:

  fwd:  S(q) = M(q) - T*log sum_k exp((M(q) - t_k(q))/T),
        t_k = (k-B)^2 + gext(q+k), M = min_k t_k
        — the hard band-min (2 ops/tap) provides the max-normalization, so
        the exp-sum phase is overflow-free with acc >= 1 (flash-attention's
        two-phase softmax, min-plus flavoured).

  bwd:  dL/dgext[p] = sum_k exp((S[p-k+..] - t)/T) * ct[p-k..]
        — softmax weights recomputed from the saved output (O(n^2) memory,
        no per-tap residuals), same banded stencil transposed.

Mosaic constraints shape the loops (all observed on v5e):
- statically re-slicing the same strip rows in two phases lets the
  compiler CSE phase A's taps and keep all 2B+1 alive (scoped-vmem OOM),
  so the exp phases run as fori_loops;
- dynamic sublane starts must be provably 8-aligned, so the fori_loops
  advance in 8-row groups (one aligned load, eight static sub-slices) —
  which also amortizes loads 8x;
- surplus taps from rounding the band up to a multiple of 8 carry a huge
  dy^2 penalty and contribute exp(-huge) = 0.

Used by ops.softsdf.band_softmin_ext when running on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_CHUNK = 256
_SEG = 64  # granularity of the windowed skip-bound tables
_PAD_H = 1e30  # sentinel height (matches softsdf._PAD_HEIGHT)
_NEG_HUGE = -3.0e38
# Tap-truncation bound shared by fwd thresh and bwd weight skip: dropped
# tap groups contribute < exp(-_CUT) ~ 2e-12 RELATIVE (the min tap always
# contributes 1 to the exp-sum) — far below f32 rounding of the sum and
# ~9 orders below the 4e-3 bf16 noise the fused path accepts between
# passes. 104.0 would make the skip provably bit-exact at ~2x the taps.
_CUT = 27.0


def _softmin_fwd_kernel(gext_ref, out_ref, acc_ref, seg_ref, sm_ref, *, band, h, temperature):
    """gext: (H+2B+8, TN) f32 (8 extra sentinel rows at the bottom);
    out: (H, TN) f32; acc_ref: (_ROW_CHUNK, TN) VMEM scratch; seg_ref:
    SMEM per-segment strip minima; sm_ref: SMEM running chunk max.

    Both phases are adaptive (the TPU-native form of the reference search's
    bound shrinking, opencl/sdf.cl:66-69): a +-dy tap group is skipped when
    a provable lower bound over the rows it actually reads says it cannot
    change the result. Bounds come from a per-64-row segment-minimum table
    (a global strip min is useless when the strip mixes strong seeds with
    empty space — e.g. glyph atlases). Phase A (hard band-min, the
    softmax normalizer) skips when the bound cannot lower the chunk's
    current min (bit-exact); phase B (exp-sum) skips tap groups whose
    every term is below exp(-_CUT) relative to the sum (see _CUT: rel
    error < 2e-12, ~9 orders below the path's bf16 storage noise)."""
    inv_t = jnp.float32(1.0 / temperature)
    t = jnp.float32(temperature)
    n_groups = (2 * band + 1 + 7) // 8
    n_groups_a = (band + 3) // 4
    tn = out_ref.shape[1]
    hrows = gext_ref.shape[0]
    nseg = (hrows + _SEG - 1) // _SEG
    for s in range(nseg):
        seg_ref[s] = jnp.min(gext_ref[s * _SEG : min((s + 1) * _SEG, hrows), :])
    strip_min = jax.lax.fori_loop(
        0, nseg, lambda s, mv: jnp.minimum(mv, seg_ref[s]), jnp.float32(3e38)
    )

    def win_min(lo_row: int, hi_row: int):
        """Min of the strip over static row range [lo_row, hi_row)."""
        lo_s = max(lo_row, 0) // _SEG
        hi_s = (min(hi_row, hrows) + _SEG - 1) // _SEG
        m = seg_ref[lo_s]
        for s in range(lo_s + 1, hi_s):
            m = jnp.minimum(m, seg_ref[s])
        return m

    for r in range(0, h, _ROW_CHUNK):
        rc = min(_ROW_CHUNK, h - r)
        # phase A: adaptive hard band-min, |dy| groups from the center
        # out in 4-tap groups (the always-on central group is the floor
        # cost; bounds pay for everything further out)
        acc = gext_ref[r + band : r + band + rc, :]
        for dy in range(1, min(4, band) + 1):
            pair = jnp.minimum(
                gext_ref[r + band - dy : r + band - dy + rc, :],
                gext_ref[r + band + dy : r + band + dy + rc, :],
            )
            acc = jnp.minimum(acc, pair + jnp.float32(dy * dy))
        acc_ref[0:rc, :] = acc
        sm_ref[0] = jnp.max(acc)
        for k in range(1, n_groups_a):
            dylo = 4 * k + 1
            dyhi = min(4 * (k + 1), band)
            if dylo > band:
                break
            wmin = jnp.minimum(
                win_min(r + band - dyhi, r + band - dylo + rc),
                win_min(r + band + dylo, r + band + dyhi + rc),
            )
            lb = jnp.float32(dylo * dylo) + wmin

            @pl.when(lb < sm_ref[0])
            def _():
                a = acc_ref[0:rc, :]
                for dy in range(dylo, dyhi + 1):
                    pair = jnp.minimum(
                        gext_ref[r + band - dy : r + band - dy + rc, :],
                        gext_ref[r + band + dy : r + band + dy + rc, :],
                    )
                    a = jnp.minimum(a, pair + jnp.float32(dy * dy))
                acc_ref[0:rc, :] = a
                sm_ref[0] = jnp.max(a)

        m = acc_ref[0:rc, :]
        thresh = sm_ref[0] + jnp.float32(_CUT) * t

        # phase B: exp-sum over 8-aligned slabs, each slab's two 4-tap
        # halves independently bound-checked
        def half_dymin(klo, khi):
            lo1 = jnp.abs(klo - jnp.float32(band))
            lo2 = jnp.abs(khi - jnp.float32(band))
            straddles = jnp.logical_and(klo <= jnp.float32(band), jnp.float32(band) <= khi)
            return jnp.where(straddles, jnp.float32(0.0), jnp.minimum(lo1, lo2))

        def group(j, acc):
            kf = jnp.float32(8.0) * j.astype(jnp.float32)
            d1 = half_dymin(kf, kf + 3.0)
            d2 = half_dymin(kf + 4.0, kf + 7.0)
            # group j reads strip rows [r + 8j, r + 8j + 8 + rc)
            lo_s = (r + 8 * j) // jnp.int32(_SEG)
            hi_s = (r + 8 * j + 8 + rc + _SEG - 1) // jnp.int32(_SEG)
            hi_s = jnp.minimum(hi_s, nseg)
            wmin = jax.lax.fori_loop(
                lo_s, hi_s, lambda s, mv: jnp.minimum(mv, seg_ref[s]), jnp.float32(3e38)
            )
            run1 = d1 * d1 + wmin <= thresh
            run2 = d2 * d2 + wmin <= thresh

            def with_blk(acc):
                base = pl.multiple_of(r + 8 * j, 8)
                blk = gext_ref[pl.ds(base, rc + 8), :]

                def taps_half(i0, acc):
                    for i in range(i0, i0 + 4):
                        k = jnp.float32(8.0) * j.astype(jnp.float32) + jnp.float32(i)
                        dy = k - jnp.float32(band)
                        # surplus taps from 8-group rounding: +huge penalty
                        pen = jnp.where(k <= jnp.float32(2 * band), dy * dy, jnp.float32(3e38))
                        acc = acc + jnp.exp((m - blk[i : i + rc, :] - pen) * inv_t)
                    return acc

                acc = jax.lax.cond(run1, lambda a: taps_half(0, a), lambda a: a, acc)
                return jax.lax.cond(run2, lambda a: taps_half(4, a), lambda a: a, acc)

            return jax.lax.cond(jnp.logical_or(run1, run2), with_blk, lambda a: a, acc)

        # group loop only over the contiguous range that can pass the
        # bound (any active tap needs dy^2 <= thresh - strip_min); dmax
        # clamped before the int conversion — huge values wrap int32
        dmax = jnp.minimum(
            jnp.sqrt(jnp.maximum(thresh - strip_min, jnp.float32(0.0))),
            jnp.float32(band + 8),
        )
        j_lo = jnp.clip(((jnp.float32(band) - dmax) / 8.0).astype(jnp.int32), 0, n_groups)
        j_hi = jnp.clip(((jnp.float32(band) + dmax) / 8.0).astype(jnp.int32) + 1, 0, n_groups)
        acc = jax.lax.fori_loop(j_lo, j_hi, group, jnp.zeros((rc, tn), jnp.float32))
        out_ref[r : r + rc, :] = m - t * jnp.log(acc)


def _softmin_bwd_kernel(gext_hbm, spad_hbm, ctpad_hbm, dg_ref, gv, sv, cv, sem, *, band, hext, f, temperature):
    """Manual-DMA variant (three big strips exceed the auto-pipelined VMEM
    budget). gext: (H+2B, TN); spad/ctpad: (F + H + 2B + 8, TN) where
    F = 8-aligned front pad >= 2B+8; dg out: (H+2B, TN).

    dg[p] = sum_{k=0..2B} exp((S[p-k] - (k-B)^2 - g[p])/T) * ct[p-k], with
    S/ct padded so S[q] lives at row q + F."""
    j = pl.program_id(0)
    tn = dg_ref.shape[1]
    c1 = pltpu.make_async_copy(gext_hbm.at[:, pl.ds(j * tn, tn)], gv, sem.at[0])
    c2 = pltpu.make_async_copy(spad_hbm.at[:, pl.ds(j * tn, tn)], sv, sem.at[1])
    c3 = pltpu.make_async_copy(ctpad_hbm.at[:, pl.ds(j * tn, tn)], cv, sem.at[2])
    c1.start(); c2.start(); c3.start()
    c1.wait(); c2.wait(); c3.wait()
    inv_t = jnp.float32(1.0 / temperature)
    t = jnp.float32(temperature)
    n_groups = (2 * band + 1 + 7) // 8
    # w = exp((S - pen - g)/T) is exactly 0 once (pen + g - S)/T > ~104;
    # bound per chunk with the max over the S rows this chunk can read
    # and the chunk's g min.
    hpad_rows = sv.shape[0]
    for r in range(0, hext, _ROW_CHUNK):
        rc = min(_ROW_CHUNK, hext - r)
        g = gv[r : r + rc, :]
        g_min = jnp.min(g)
        lo_row = max(r + f - (8 * n_groups - 1), 0)
        hi_row = min(r + f + rc, hpad_rows)
        s_max = jnp.max(sv[lo_row:hi_row, :])
        thresh = s_max - g_min + jnp.float32(_CUT) * t

        def half_dymin(klo, khi):
            lo1 = jnp.abs(klo - jnp.float32(band))
            lo2 = jnp.abs(khi - jnp.float32(band))
            straddles = jnp.logical_and(klo <= jnp.float32(band), jnp.float32(band) <= khi)
            return jnp.where(straddles, jnp.float32(0.0), jnp.minimum(lo1, lo2))

        def group(jj, acc):
            kf = jnp.float32(8.0) * jj.astype(jnp.float32)
            d1 = half_dymin(kf, kf + 3.0)
            d2 = half_dymin(kf + 4.0, kf + 7.0)
            run1 = d1 * d1 <= thresh
            run2 = d2 * d2 <= thresh

            def with_blk(acc):
                # taps k = 8jj .. 8jj+7 read source rows p - k, i.e.
                # padded rows (r+F) - 8jj - i; aligned base, static slices
                base = pl.multiple_of(r + f - 8 * jj - 8, 8)
                sblk = sv[pl.ds(base, rc + 8), :]
                cblk = cv[pl.ds(base, rc + 8), :]

                def taps_half(i0, acc):
                    for i in range(i0, i0 + 4):
                        k_off = jnp.float32(8.0) * jj.astype(jnp.float32) + jnp.float32(i)
                        dy = k_off - jnp.float32(band)
                        # surplus taps from 8-group rounding: +huge penalty
                        pen = jnp.where(
                            k_off <= jnp.float32(2 * band), dy * dy, jnp.float32(3e38)
                        )
                        # row offset inside blk for tap k: (r+F-k) - base = 8 - i
                        st = sblk[8 - i : 8 - i + rc, :]
                        ct = cblk[8 - i : 8 - i + rc, :]
                        w = jnp.exp((st - pen - g) * inv_t)
                        acc = acc + w * ct
                    return acc

                acc = jax.lax.cond(run1, lambda a: taps_half(0, a), lambda a: a, acc)
                return jax.lax.cond(run2, lambda a: taps_half(4, a), lambda a: a, acc)

            return jax.lax.cond(jnp.logical_or(run1, run2), with_blk, lambda a: a, acc)

        dmax = jnp.minimum(
            jnp.sqrt(jnp.maximum(thresh, jnp.float32(0.0))), jnp.float32(band + 8)
        )
        j_lo = jnp.clip(((jnp.float32(band) - dmax) / 8.0).astype(jnp.int32), 0, n_groups)
        j_hi = jnp.clip(((jnp.float32(band) + dmax) / 8.0).astype(jnp.int32) + 1, 0, n_groups)
        dg_ref[r : r + rc, :] = jax.lax.fori_loop(
            j_lo, j_hi, group, jnp.zeros((rc, tn), jnp.float32)
        )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def softmin_col_fwd(gext: jnp.ndarray, band: int, temperature: float, interpret: bool) -> jnp.ndarray:
    """(H+2B, W) f32 -> (H, W) f32 soft band-min along axis 0."""
    hext, w = gext.shape
    h = hext - 2 * band
    wp = _round_up(w, 128)
    tn = _pick_tn_fwd(h, band, wp)
    wp2 = _round_up(wp, tn)
    # 8 extra bottom sentinel rows for the rounded-up tap groups
    gext = jnp.pad(
        gext, ((0, 8), (0, wp2 - w)), constant_values=jnp.float32(_PAD_H)
    )
    kern = functools.partial(_softmin_fwd_kernel, band=band, h=h, temperature=temperature)
    nseg = (hext + 8 + _SEG - 1) // _SEG
    out = pl.pallas_call(
        kern,
        grid=(wp2 // tn,),
        in_specs=[pl.BlockSpec((hext + 8, tn), lambda j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((h, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, wp2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((min(_ROW_CHUNK, h), tn), jnp.float32),
            pltpu.SMEM((nseg,), jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gext)
    return out[:, :w]


def softmin_col_bwd(
    gext: jnp.ndarray, s: jnp.ndarray, ct: jnp.ndarray, band: int, temperature: float, interpret: bool
) -> jnp.ndarray:
    """Gradient wrt gext. gext: (H+2B, W); s, ct: (H, W)."""
    hext, w = gext.shape
    wp = _round_up(w, 128)
    tn = 128
    wp2 = _round_up(wp, tn)
    # HBM->VMEM DMA slices must be 8-row aligned: round every row dim up
    hext8 = _round_up(hext, 8)
    f = _round_up(2 * band + 8, 8)
    back = _round_up(2 * band + 16 + (hext8 - hext) + (f + s.shape[0]) % 8 + 8, 8)
    spad = jnp.pad(s, ((f, back), (0, wp2 - w)), constant_values=jnp.float32(_NEG_HUGE))
    ctpad = jnp.pad(ct, ((f, back), (0, wp2 - w)), constant_values=jnp.float32(0.0))
    hpad = _round_up(spad.shape[0], 8)
    if hpad != spad.shape[0]:
        spad = jnp.pad(spad, ((0, hpad - spad.shape[0]), (0, 0)), constant_values=jnp.float32(_NEG_HUGE))
        ctpad = jnp.pad(ctpad, ((0, hpad - ctpad.shape[0]), (0, 0)))
    gext = jnp.pad(
        gext, ((0, hext8 - hext), (0, wp2 - w)), constant_values=jnp.float32(_PAD_H)
    )
    kern = functools.partial(
        _softmin_bwd_kernel, band=band, hext=hext8, f=f, temperature=temperature
    )
    out = pl.pallas_call(
        kern,
        grid=(wp2 // tn,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((hext8, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hext8, wp2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hext8, tn), jnp.float32),
            pltpu.VMEM((hpad, tn), jnp.float32),
            pltpu.VMEM((hpad, tn), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gext, spad, ctpad)
    return out[:hext, :w]


def _pick_tn_fwd(h: int, band: int, w: int) -> int:
    budget = 11 * 1024 * 1024
    per_lane = (h + 2 * band + 8) * 4 * 2 + h * 4 * 2  # in + out, double-buffered
    tn = budget // max(per_lane, 1)
    tn = min(tn, w, 1024)
    tn = (tn // 128) * 128
    return max(tn, 128)
