"""Fully-fused Pallas TPU pipeline for the soft (differentiable) SDF.

Round-2 redesign of the soft path (the reference has no soft analogue;
BASELINE config 4 defines it). The composed path (ops/softsdf.py +
ops/pallas_soft.py) spends more time in XLA glue — height elementwise
passes, layout transposes, concats, the sqrt/merge tail — than in the
band kernels themselves. Here the whole fwd+bwd runs as FOUR Pallas
kernels with every transpose fused into a kernel (in-VMEM transposes
cost ~a copy on v5e; a round-tripped XLA transpose costs ~4 ms at 4K):

  F1  gray (H,W) --> S1cat (both fields' pass-1 soft-min, natural
      layout, bf16, sentinel halo blocks built in) + logitsT (bf16,
      transposed threshold logits, the bwd's compact residual).
      Reads gray row-blocks, transposes in VMEM, computes heights
      h = T*softplus(-+l) on the fly, runs the adaptive banded soft-min
      along x, transposes the result back per chunk.

  F2  S1cat --> field (H,W) f32. Column strips; adaptive soft-min along
      y for both fields plus the fused tail d = sqrt(relu(d2)+eps),
      field = d_out - relu(d_in - 1). No residual output: the backward
      recomputes d2 windows (cheaper than a 2x134 MB f32 round trip).

  B2  (S1cat, ct) --> dS1T (transposed, bf16, zero halo slabs).
      Per column strip: recompute d2 over chunk+-band windows (bit-equal
      to F2's values: the adaptive skips only elide exact no-ops), apply
      the tail's chain rule inline, then the banded softmax-weight pass;
      the output slab is transposed in VMEM so B1 never transposes reads.

  B1  (logitsT, dS1T) --> dgray (H,W) f32. Recomputes heights and the
      pass-1 soft-min (f32, bit-equal to F1) for exactly-normalized
      weights, runs the weight pass against dS1T, applies the
      heights/threshold chain rule, accumulates both fields, and
      transposes the final gradient back to natural layout.

Numerics: all band math is f32 in VMEM. S1, logits and the memoized
residuals (S1T, d2) cross HBM as exact f32: bf16 S1 storage was measured
to reroute near-tied soft-min weights (exp((S - g)/T) amplifies the
0.4% rounding), flipping isolated pixel gradients by O(1) vs f32 math.
Only the dS1 cotangent crosses as bf16 — pure relative rounding of a
linear quantity, no exp amplification.

Both adaptive phases use per-64-row segment min/max tables for their
skip bounds (see pallas_soft._softmin_fwd_kernel): work is skipped only
when it provably cannot change the f32 result (the TPU-native analogue
of the reference search's bound shrinking, opencl/sdf.cl:66-69).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 128  # row-block height (F1/B1 grid) == lane count of transposed compute
_TN = 128  # column-strip width (F2/B2 grid)
_CHUNK = 256  # rows per inner step (512 was measured WORSE: the skip
# bounds compare against the chunk's max, and a 512-row chunk admits
# more tap groups than the per-chunk overhead saved)
_SEG = 64  # granularity of segment min/max bound tables
_PAD_H = 1e30  # sentinel height (matches softsdf._PAD_HEIGHT)
_NEG_HUGE = -3.0e38
# Tap-truncation bound: a tap with (tap - m)/T > _CUT contributes
# exp(-_CUT) < 2e-12 RELATIVE to the soft-min's exp-sum (the m-tap always
# contributes exp(0) = 1), perturbing the f32 result by far less than one
# ulp in practice and by ~9 orders of magnitude less than the bf16
# inter-pass storage already accepted (rel ~4e-3). 104 (true f32
# underflow) would make the skips provably exact but roughly doubles the
# live tap count; 27 keeps fwd/bwd mutually consistent (both passes use
# the same bound) at half the work.
_UNDERFLOW = 27.0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _round_down(x: int, m: int) -> int:
    return (x // m) * m if x >= 0 else -(((-x) + m - 1) // m) * m


def _read_f32(ref, sl):
    v = ref[sl, :]
    return v.astype(jnp.float32) if v.dtype != jnp.float32 else v


def _softplus(x):
    # open-coded (jax.nn.softplus lowers via log1p, which Mosaic may not
    # legalize); the log(1+tiny)->0 rounding only underflows heights that
    # are ~1e-10 anyway, and gradients use the exact sigmoid form below
    return jnp.maximum(x, jnp.float32(0.0)) + jnp.log(jnp.float32(1.0) + jnp.exp(-jnp.abs(x)))


def _sigmoid(x):
    return jnp.float32(1.0) / (jnp.float32(1.0) + jnp.exp(-x))


# --------------------------------------------------------------------------
# shared in-kernel helpers.  Geometry convention: extended-g tap row k for
# output row q lives at ref row  off + q + k,  k in [0, 2*band];
# `off` static, `q` chunk starts 8-aligned.
# --------------------------------------------------------------------------


def _build_seg_min(ref, seg_ref, nrows, *, seg0=0):
    nseg = (nrows + _SEG - 1) // _SEG
    for s in range(nseg):
        v = _read_f32(ref, slice(s * _SEG, min((s + 1) * _SEG, nrows)))
        seg_ref[seg0 + s] = jnp.min(v)
    return nseg


def _seg_global(seg_ref, nseg, *, seg0=0, op=jnp.minimum, init=3e38):
    return jax.lax.fori_loop(
        0, nseg, lambda s, mv: op(mv, seg_ref[seg0 + s]), jnp.float32(init)
    )


def _win_min(seg_ref, lo_row: int, hi_row: int, nrows: int, *, seg0=0):
    lo_s = max(lo_row, 0) // _SEG
    hi_s = (min(hi_row, nrows) + _SEG - 1) // _SEG
    m = seg_ref[seg0 + lo_s]
    for s in range(lo_s + 1, hi_s):
        m = jnp.minimum(m, seg_ref[seg0 + s])
    return m


def _chunk_softmin(ref, off, r, rc, band, tf, inv_t, seg_ref, nrows, sm_ref, acc_ref, *, seg0=0, live_mask=None):
    """Adaptive banded soft-min for output rows [r, r+rc) (r 8-aligned):
    returns the (rc, lanes) f32 chunk of
      m - T log sum_k exp((m - (k-band)^2 - g_ext[q+k]) / T).
    ref must be valid on rows [off + r, off + r + rc + 2*band + 16).
    tf / inv_t: f32 scalars (may be traced — see _params).

    live_mask: optional bool array broadcastable to (rc, lanes) marking
    the outputs whose values matter. DEAD outputs (sentinel-dominated —
    beyond-image pad rows, edge-shard halo fill) are excluded from the
    chunk-max that drives both skip bounds: a single 1e30-acc row
    otherwise saturates thresh and forces the FULL band stencil for the
    whole chunk (and, via the memoized d2, for every chunk of B2 —
    measured +27% e2e whenever H isn't a 128-multiple). Exactness for
    live rows is unchanged: phase A skips only when the group's best tap
    cannot beat the live max (a hard-min no-op), phase B drops only taps
    whose relative weight < exp(-_UNDERFLOW) for every live row (an
    exact f32 add no-op). Dead rows' outputs become garbage — callers
    must mask them (F2 stores 0.0 into d2cat)."""
    n_groups_a = (band + 3) // 4

    def _smax(a):
        if live_mask is None:
            return jnp.max(a)
        return jnp.max(jnp.where(live_mask, a, jnp.float32(_NEG_HUGE)))

    # ---- phase A: adaptive hard band-min, |dy| groups center-out in
    # 4-tap groups (the always-on central group is the floor cost of the
    # whole pass — keep it small and let the bounds pay for the rest).
    # NOTE: no multi-accumulator ILP here — a (rc, 128) chunk is already
    # 32 independent vreg chains, and extra accumulators of this size
    # spill (measured 2x slower with 4 carried partial sums) ----
    acc = _read_f32(ref, slice(off + r + band, off + r + band + rc))
    for dy in range(1, min(4, band) + 1):
        pair = jnp.minimum(
            _read_f32(ref, slice(off + r + band - dy, off + r + band - dy + rc)),
            _read_f32(ref, slice(off + r + band + dy, off + r + band + dy + rc)),
        )
        acc = jnp.minimum(acc, pair + jnp.float32(dy * dy))
    acc_ref[0:rc, :] = acc
    sm_ref[0] = _smax(acc)
    for k in range(1, n_groups_a):
        dylo = 4 * k + 1
        dyhi = min(4 * (k + 1), band)
        if dylo > band:
            break
        wmin = jnp.minimum(
            _win_min(seg_ref, off + r + band - dyhi, off + r + band - dylo + rc, nrows, seg0=seg0),
            _win_min(seg_ref, off + r + band + dylo, off + r + band + dyhi + rc, nrows, seg0=seg0),
        )
        lb = jnp.float32(dylo * dylo) + wmin

        @pl.when(lb < sm_ref[0])
        def _():
            a = acc_ref[0:rc, :]
            for dy in range(dylo, dyhi + 1):
                pair = jnp.minimum(
                    _read_f32(ref, slice(off + r + band - dy, off + r + band - dy + rc)),
                    _read_f32(ref, slice(off + r + band + dy, off + r + band + dy + rc)),
                )
                a = jnp.minimum(a, pair + jnp.float32(dy * dy))
            acc_ref[0:rc, :] = a
            sm_ref[0] = _smax(a)

    m = acc_ref[0:rc, :]
    thresh = sm_ref[0] + jnp.float32(_UNDERFLOW) * tf

    # ---- phase B: adaptive exp-sum over 8-aligned slabs, each slab's
    # two 4-tap halves independently bound-checked. The group loop runs
    # only over the contiguous range that can possibly pass the bound
    # (any active tap needs dy^2 <= thresh - strip_min, strip_min =
    # sm_ref[1] set by the caller): for dense-seed images that is ~2-3
    # groups instead of all ceil((2B+1)/8) — the per-group bound checks
    # themselves (SMEM scans + branches) were a measurable cost ----
    n_groups = (2 * band + 1 + 7) // 8
    delta = off % 8
    al = off - delta
    lanes = m.shape[1]
    nseg = (nrows + _SEG - 1) // _SEG
    # clamp BEFORE the int conversion: a sentinel-dominated strip yields
    # dmax ~ 1e15 and float->int32 wraps, which would empty the range
    dmax = jnp.minimum(
        jnp.sqrt(jnp.maximum(thresh - sm_ref[1], jnp.float32(0.0))),
        jnp.float32(band + 8),
    )
    j_lo = jnp.clip(
        ((jnp.float32(band) - dmax) / 8.0).astype(jnp.int32), 0, n_groups
    )
    j_hi = jnp.clip(
        ((jnp.float32(band) + dmax) / 8.0).astype(jnp.int32) + 1, 0, n_groups
    )

    def half_dymin(klo, khi):
        # min |k - band| over k in [klo, khi] (f32 scalars)
        lo1 = jnp.abs(klo - jnp.float32(band))
        lo2 = jnp.abs(khi - jnp.float32(band))
        straddles = jnp.logical_and(klo <= jnp.float32(band), jnp.float32(band) <= khi)
        return jnp.where(straddles, jnp.float32(0.0), jnp.minimum(lo1, lo2))

    def group(j, s):
        kf = jnp.float32(8.0) * j.astype(jnp.float32)
        d1 = half_dymin(kf, kf + 3.0)
        d2 = half_dymin(kf + 4.0, kf + 7.0)
        lo_s = jnp.maximum(off + r + 8 * j, 0) // jnp.int32(_SEG)
        hi_s = jnp.minimum((off + r + 8 * j + 8 + rc + _SEG - 1) // jnp.int32(_SEG), nseg)
        wmin = jax.lax.fori_loop(
            lo_s, hi_s, lambda ss, mv: jnp.minimum(mv, seg_ref[seg0 + ss]), jnp.float32(3e38)
        )
        run1 = d1 * d1 + wmin <= thresh
        run2 = d2 * d2 + wmin <= thresh

        def with_blk(s):
            base = pl.multiple_of(al + r + 8 * j, 8)
            blk = ref[pl.ds(base, rc + 16), :]
            if blk.dtype != jnp.float32:
                blk = blk.astype(jnp.float32)

            def taps_half(i0, s):
                for i in range(i0, i0 + 4):
                    k = jnp.float32(8.0) * j.astype(jnp.float32) + jnp.float32(i)
                    dy = k - jnp.float32(band)
                    pen = jnp.where(k <= jnp.float32(2 * band), dy * dy, jnp.float32(3e38))
                    s = s + jnp.exp((m - blk[delta + i : delta + i + rc, :] - pen) * inv_t)
                return s

            s = jax.lax.cond(run1, lambda a: taps_half(0, a), lambda a: a, s)
            return jax.lax.cond(run2, lambda a: taps_half(4, a), lambda a: a, s)

        return jax.lax.cond(jnp.logical_or(run1, run2), with_blk, lambda a: a, s)

    ssum = jax.lax.fori_loop(j_lo, j_hi, group, jnp.zeros((rc, lanes), jnp.float32))
    return m - tf * jnp.log(ssum)


def _chunk_weight_sum(s_ref, v_ref, off, r, rc, band, tf, inv_t, g_chunk, segmax_ref, nrows, smax_glob, *, seg0=0):
    """Banded softmax-weight pass for output rows [r, r+rc) (r 8-aligned):
      out[p] = sum_k exp((S[row] - (k-band)^2 - g[p]) / T) * V[row],
      row = off + p + k,  k in [0, 2*band].
    segmax_ref: per-_SEG maxima of s_ref rows (underflow skip bound);
    smax_glob: their global max (bounds the group loop's range).
    tf / inv_t: f32 scalars (may be traced)."""
    n_groups = (2 * band + 1 + 7) // 8
    delta = off % 8
    al = off - delta
    lanes = g_chunk.shape[1]
    g_min = jnp.min(g_chunk)
    nseg = (nrows + _SEG - 1) // _SEG
    # any live weight needs dy^2 <= max S - min g + _CUT*T; the active
    # groups form a contiguous range around the band center (dmax clamped
    # before the int conversion — huge values wrap int32)
    dmax = jnp.minimum(
        jnp.sqrt(
            jnp.maximum(smax_glob - g_min + jnp.float32(_UNDERFLOW) * tf, jnp.float32(0.0))
        ),
        jnp.float32(band + 8),
    )
    j_lo = jnp.clip(((jnp.float32(band) - dmax) / 8.0).astype(jnp.int32), 0, n_groups)
    j_hi = jnp.clip(((jnp.float32(band) + dmax) / 8.0).astype(jnp.int32) + 1, 0, n_groups)

    def half_dymin(klo, khi):
        lo1 = jnp.abs(klo - jnp.float32(band))
        lo2 = jnp.abs(khi - jnp.float32(band))
        straddles = jnp.logical_and(klo <= jnp.float32(band), jnp.float32(band) <= khi)
        return jnp.where(straddles, jnp.float32(0.0), jnp.minimum(lo1, lo2))

    def group(j, s):
        kf = jnp.float32(8.0) * j.astype(jnp.float32)
        d1 = half_dymin(kf, kf + 3.0)
        d2 = half_dymin(kf + 4.0, kf + 7.0)
        lo_s = jnp.maximum(off + r + 8 * j, 0) // jnp.int32(_SEG)
        hi_s = jnp.minimum((off + r + 8 * j + 8 + rc + _SEG - 1) // jnp.int32(_SEG), nseg)
        wmax = jax.lax.fori_loop(
            lo_s, hi_s, lambda ss, mv: jnp.maximum(mv, segmax_ref[seg0 + ss]), jnp.float32(_NEG_HUGE)
        )
        # any w > 0 in a half requires pen <= max S - min g + _CUT*T
        bound = wmax - g_min + jnp.float32(_UNDERFLOW) * tf
        run1 = d1 * d1 <= bound
        run2 = d2 * d2 <= bound

        def with_blk(s):
            base = pl.multiple_of(al + r + 8 * j, 8)
            sblk = s_ref[pl.ds(base, rc + 16), :]
            vblk = v_ref[pl.ds(base, rc + 16), :]
            if sblk.dtype != jnp.float32:
                sblk = sblk.astype(jnp.float32)
            if vblk.dtype != jnp.float32:
                vblk = vblk.astype(jnp.float32)

            def taps_half(i0, s):
                for i in range(i0, i0 + 4):
                    k = jnp.float32(8.0) * j.astype(jnp.float32) + jnp.float32(i)
                    dy = k - jnp.float32(band)
                    pen = jnp.where(k <= jnp.float32(2 * band), dy * dy, jnp.float32(3e38))
                    st = sblk[delta + i : delta + i + rc, :]
                    vt = vblk[delta + i : delta + i + rc, :]
                    w = jnp.exp((st - pen - g_chunk) * inv_t)
                    s = s + w * vt
                return s

            s = jax.lax.cond(run1, lambda a: taps_half(0, a), lambda a: a, s)
            return jax.lax.cond(run2, lambda a: taps_half(4, a), lambda a: a, s)

        return jax.lax.cond(jnp.logical_or(run1, run2), with_blk, lambda a: a, s)

    return jax.lax.fori_loop(j_lo, j_hi, group, jnp.zeros((rc, lanes), jnp.float32))


_TCHUNK = 128  # columns per in-VMEM transpose chunk (128 measured
# marginally faster than 512 end-to-end; large f32 chunk transposes do
# not show the u8 packed-transpose cliff)


def _transpose_into(dst_ref, src, col0):
    """dst[:, col0:col0+rows(src)] = src.T, in _TCHUNK-row chunks."""
    rows = src.shape[0]
    for c in range(0, rows, _TCHUNK):
        cc = min(_TCHUNK, rows - c)
        dst_ref[:, col0 + c : col0 + c + cc] = src[c : c + cc, :].T.astype(dst_ref.dtype)


# --------------------------------------------------------------------------
# F1: gray -> S1cat (+ logitsT)
# --------------------------------------------------------------------------


def _prm_scalars(prm_ref, prm_const):
    """(tau, inv_tau, tf, inv_t, eps) as f32 scalars: trace-time CONSTANTS
    when prm_const (a static float tuple) is given — XLA then folds
    T=1 multiplies etc. exactly as when these were baked statics — or
    SMEM reads for the dynamic-schedule path."""
    if prm_const is not None:
        return tuple(jnp.float32(v) for v in prm_const)
    return prm_ref[0], prm_ref[1], prm_ref[2], prm_ref[3], prm_ref[4]


def _f1_kernel(
    gray_ref, prm_ref, s1cat_ref, logitsT_ref, s1t_ref, xt_ref, hs_ref, acc_ref, seg_ref, sm_ref,
    *, band, w, wl, nb, ph, test_above, prm_const,
):
    i = pl.program_id(0)
    f = pl.program_id(1)
    sentinel = jnp.logical_or(i == 0, i == nb + 1)

    @pl.when(sentinel)
    def _():
        s1cat_ref[:, :] = jnp.full(s1cat_ref.shape, _PAD_H, s1cat_ref.dtype)
        # junk column-blocks of the memoized S1T (B1 never reads them)
        s1t_ref[:, :] = jnp.full(s1t_ref.shape, _NEG_HUGE, jnp.float32)

    @pl.when(jnp.logical_not(sentinel))
    def _():
        sgn0 = 1.0 if test_above else -1.0
        _, inv_tau, tf, inv_t, _ = _prm_scalars(prm_ref, prm_const)
        # scale = sgn0/tau: multiply the f32 inverse by +-1.0 (exact), so
        # static floats keep the double-divide-then-round value
        scale0 = jnp.float32(sgn0) * inv_tau

        @pl.when(f == 0)
        def _():
            # transpose gray into xt as sign-folded logits; store bf16 copy
            for c in range(0, wl, _TCHUNK):
                cc = min(_TCHUNK, wl - c)
                blk = gray_ref[:, c : c + cc].T  # (cc, TM)
                xt_ref[c : c + cc, :] = (blk - jnp.float32(127.5)) * scale0
            logitsT_ref[:, :] = xt_ref[:, :].astype(logitsT_ref.dtype)

        # heights strip for field f (f=0: seeds on): h0 = T*softplus(-l).
        # Field 1 reuses field 0's strip (grid scratch persists across the
        # f iterations of the same i): softplus(l) = softplus(-l) + l
        # exactly, so h1 = h0 + T*l — a mul-add instead of a softplus.
        e1 = hs_ref.shape[0]

        @pl.when(f == 0)
        def _():
            hs_ref[:, :] = jnp.full(hs_ref.shape, _PAD_H, jnp.float32)
            for c in range(0, w, 512):
                cc = min(512, w - c)
                l = xt_ref[c : c + cc, :]
                h = tf * _softplus(-l)
                hs_ref[band + c : band + c + cc, :] = jnp.minimum(h, jnp.float32(_PAD_H))

        @pl.when(f == 1)
        def _():
            for c in range(0, w, 512):
                cc = min(512, w - c)
                l = xt_ref[c : c + cc, :]
                hs_ref[band + c : band + c + cc, :] = (
                    hs_ref[band + c : band + c + cc, :] + tf * l
                )

        nseg = _build_seg_min(hs_ref, seg_ref, e1)
        sm_ref[1] = _seg_global(seg_ref, nseg)  # strip min: bounds phase B's group range
        # memoized-S1T pad slabs (the weight-pass geometry B1 shares with
        # ds1t): rows [0, ph) and [ph+wl, 2ph+wl) read as -huge
        s1t_ref[0:ph, :] = jnp.full((ph, _TM), _NEG_HUGE, jnp.float32)
        s1t_ref[ph + wl : 2 * ph + wl, :] = jnp.full((ph, _TM), _NEG_HUGE, jnp.float32)
        # lanes are image rows y = (i-1)*TM + lane; rows outside the LIVE
        # window [prm[5], prm[6]) must leave sentinel S1. The window
        # defaults to [0, h_real) (pad rows carry no pixels); the sharded
        # tier narrows it per shard (traced, axis_index-dependent) so
        # beyond-image halo rows of an edge shard read as sentinels too.
        y0 = (i - 1) * jnp.int32(_TM)
        ylo = prm_ref[5]
        yhi = prm_ref[6]
        for r in range(0, wl, _CHUNK):
            rc = min(_CHUNK, wl - r)
            s1 = _chunk_softmin(
                hs_ref, 0, r, rc, band, tf, inv_t, seg_ref, e1, sm_ref, acc_ref
            )
            # memoize the UNMASKED f32 S1 (exactly what B1's weight pass
            # must normalize against); the PAD_H lane mask below only
            # belongs to the y-direction pass's input
            s1t_ref[ph + r : ph + r + rc, :] = s1
            lane_y = (
                jax.lax.broadcasted_iota(jnp.int32, s1.shape, 1) + y0
            ).astype(jnp.float32)
            live = jnp.logical_and(lane_y >= ylo, lane_y < yhi)
            s1 = jnp.where(live, s1, jnp.float32(_PAD_H))
            _transpose_into(s1cat_ref, s1, r)


def f1_pass(gray_p, prm, w_real, band, test_above, s1_dtype, interpret, prm_const=None):
    """gray_p: (Hp, WL) f32 padded.  Returns (s1cat ((nb+2)*TM, 2*WL)
    s1_dtype with TM-row sentinel halo blocks top+bottom, logitsT
    (WL, Hp) bf16, s1t_cat (2*(WL+2*ph), (nb+2)*TM) f32 — the exact-f32
    pass-1 soft-min in transposed layout, memoized for B1). The live-row
    window rides in prm[5:7] (see _params)."""
    hp, wl = gray_p.shape
    nb = hp // _TM
    e1 = _round_up(2 * band + wl + 24, 8)
    nseg = (e1 + _SEG - 1) // _SEG
    ph = _round_up(2 * band + 24, _TN)
    prows = wl + 2 * ph
    kern = functools.partial(
        _f1_kernel, band=band, w=w_real, wl=wl, nb=nb, ph=ph,
        test_above=test_above, prm_const=prm_const,
    )
    s1cat, logitsT, s1t_cat = pl.pallas_call(
        kern,
        grid=(nb + 2, 2),
        in_specs=[
            pl.BlockSpec(
                (_TM, wl),
                lambda i, f: (jnp.clip(i - 1, 0, nb - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TM, wl), lambda i, f: (i, f), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (wl, _TM),
                lambda i, f: (0, jnp.clip(i - 1, 0, nb - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((prows, _TM), lambda i, f: (f, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(((nb + 2) * _TM, 2 * wl), s1_dtype),
            jax.ShapeDtypeStruct((wl, hp), jnp.float32),
            jax.ShapeDtypeStruct((2 * prows, (nb + 2) * _TM), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((wl, _TM), jnp.float32),
            pltpu.VMEM((e1, _TM), jnp.float32),
            pltpu.VMEM((_CHUNK, _TM), jnp.float32),
            pltpu.SMEM((nseg,), jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(gray_p, prm)
    return s1cat, logitsT, s1t_cat


# --------------------------------------------------------------------------
# F2: S1cat -> field
# --------------------------------------------------------------------------


def _f2_kernel(sin_ref, sout_ref, prm_ref, field_ref, d2cat_ref, wide_ref, acc_ref, seg_ref, sm_ref, *, band, hp, prm_const):
    rrows = sin_ref.shape[0]
    off = _TM - band
    _, _, tf, inv_t, e = _prm_scalars(prm_ref, prm_const)
    # per field: if the strip is bf16, widen ONCE into f32 scratch (the
    # band stencil slices it ~25x per chunk — per-slice converts
    # dominate); f32 strips are used in place. The field combine reads
    # d2_in back from the already-written output block.
    for fi, src in ((0, sin_ref), (1, sout_ref)):
        if src.dtype != jnp.float32:
            for rr in range(0, rrows, 512):
                rcw = min(512, rrows - rr)
                wide_ref[rr : rr + rcw, :] = src[rr : rr + rcw, :].astype(jnp.float32)
            src = wide_ref
        nsegf = _build_seg_min(src, seg_ref, rrows, seg0=0)
        sm_ref[1] = _seg_global(seg_ref, nsegf)
        # live OUTPUT-row window [prm[5], prm[6]) (same coords as F1's —
        # gray/field rows): beyond-image pad rows and edge-shard halo
        # fill have sentinel-dominated acc; excluding them from the
        # chunk-max keeps the skip bounds live-tight (see _chunk_softmin)
        # and zeroing their stored d2 keeps B2's segment MAXIMA benign
        # (a 1e30 d2 row saturates smax_glob -> full group range for
        # every B2 chunk). Live rows' cotangent math never reads dead
        # rows' d2 with a nonzero weight x ct product.
        ylo = prm_ref[5]
        yhi = prm_ref[6]
        for r in range(0, hp, _CHUNK):
            rc = min(_CHUNK, hp - r)
            rowy = (
                jax.lax.broadcasted_iota(jnp.int32, (rc, _TN), 0) + jnp.int32(r)
            ).astype(jnp.float32)
            live = jnp.logical_and(rowy >= ylo, rowy < yhi)
            d2 = _chunk_softmin(
                src, off, r, rc, band, tf, inv_t, seg_ref, rrows, sm_ref,
                acc_ref, seg0=0, live_mask=live,
            )
            d2 = jnp.where(live, d2, jnp.float32(0.0))
            d2cat_ref[fi * hp + r : fi * hp + r + rc, :] = d2
            if fi == 1:
                d2i = d2cat_ref[r : r + rc, :]
                d_in = jnp.sqrt(jnp.maximum(d2i, 0) + e)
                d_out = jnp.sqrt(jnp.maximum(d2, 0) + e)
                field_ref[r : r + rc, :] = d_out - jnp.maximum(
                    d_in - jnp.float32(1.0), jnp.float32(0.0)
                )


def f2_pass(s1cat, prm, hp, band, interpret, prm_const=None):
    """Returns (field (hp, wl) f32, d2cat (2*hp, wl) f32 — in-field rows
    [0, hp), out-field rows [hp, 2hp), memoized for B2)."""
    rrows, twl = s1cat.shape
    wl = twl // 2
    nw = wl // _TN
    nseg = (rrows + _SEG - 1) // _SEG
    kern = functools.partial(_f2_kernel, band=band, hp=hp, prm_const=prm_const)
    return pl.pallas_call(
        kern,
        grid=(nw,),
        in_specs=[
            pl.BlockSpec((rrows, _TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rrows, _TN), lambda j: (0, j + nw), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((hp, _TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hp, _TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp, wl), jnp.float32),
            jax.ShapeDtypeStruct((2 * hp, wl), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rrows, _TN), jnp.float32),
            pltpu.VMEM((_CHUNK, _TN), jnp.float32),
            pltpu.SMEM((nseg,), jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(s1cat, s1cat, prm)


# --------------------------------------------------------------------------
# B2: (S1cat, ct) -> dS1T (transposed, zero halo slabs)
# --------------------------------------------------------------------------


def _b2_kernel(
    s1_ref, ct_ref, d2_ref, prm_ref, ds1t_ref, d2w_ref, ct2w_ref, segw_ref,
    *, band, hp, npad, nw, prm_const,
):
    jj = pl.program_id(0)
    f = pl.program_id(1)
    edge = jnp.logical_or(jj < npad, jj >= npad + nw)

    @pl.when(edge)
    def _():
        ds1t_ref[:, :] = jnp.zeros(ds1t_ref.shape, ds1t_ref.dtype)

    @pl.when(jnp.logical_not(edge))
    def _():
        _, _, tf, inv_t, e = _prm_scalars(prm_ref, prm_const)
        wrows = d2w_ref.shape[0]
        pad0 = _round_up(band, 8)
        # ---- stage the memoized f32 d2 (F2 output — no soft-min
        # recompute) and apply the tail chain rule inline ----
        d2w_ref[:, :] = jnp.full(d2w_ref.shape, _NEG_HUGE, jnp.float32)
        ct2w_ref[:, :] = jnp.zeros(ct2w_ref.shape, jnp.float32)
        for r in range(0, hp, _CHUNK):
            rc = min(_CHUNK, hp - r)
            d2 = d2_ref[r : r + rc, :]
            d2w_ref[pad0 + r : pad0 + r + rc, :] = d2
            d = jnp.sqrt(jnp.maximum(d2, 0) + e)
            ct = ct_ref[r : r + rc, :]
            # tail chain rule through d = sqrt(max(d2,0)+eps):
            # the max clips the gradient to 0 where d2 <= 0 (soft-min
            # dips below 0 at seeds: -T log(#near-equal taps));
            # f=0 (inside): -ct * 1{d>1} * 0.5/d;  f=1: ct * 0.5/d
            half = jnp.where(d2 > jnp.float32(0.0), jnp.float32(0.5) / d, jnp.float32(0.0))
            g_in = -ct * jnp.where(d > jnp.float32(1.0), half, jnp.float32(0.0))
            g_out = ct * half
            ct2w_ref[pad0 + r : pad0 + r + rc, :] = jnp.where(f == 0, g_in, g_out)
        # segment maxima of the strip's d2 (for the skip bound)
        nsw = (wrows + _SEG - 1) // _SEG
        for s in range(nsw):
            segw_ref[s] = jnp.max(d2w_ref[s * _SEG : min((s + 1) * _SEG, wrows), :])
        smax_glob = _seg_global(segw_ref, nsw, op=jnp.maximum, init=_NEG_HUGE)
        # ---- weight pass: scratch row of (p, k) = pad0 + p + (k - band) ----
        for r in range(0, hp, _CHUNK):
            rc = min(_CHUNK, hp - r)
            g_chunk = _read_f32(s1_ref, slice(_TM + r, _TM + r + rc))
            ds1 = _chunk_weight_sum(
                d2w_ref, ct2w_ref, pad0 - band, r, rc, band, tf, inv_t,
                g_chunk, segw_ref, wrows, smax_glob,
            )
            _transpose_into(ds1t_ref, ds1, r)


def b2_pass(s1cat, ct_p, d2cat, prm, band, interpret, prm_const=None):
    rrows, twl = s1cat.shape
    wl = twl // 2
    hp = ct_p.shape[0]
    nw = wl // _TN
    ph = _round_up(2 * band + 24, _TN)
    npad = ph // _TN
    nj = nw + 2 * npad
    wrows = _round_up(_round_up(band, 8) + hp + band + 24, 8)
    nsw = (wrows + _SEG - 1) // _SEG
    kern = functools.partial(
        _b2_kernel, band=band, hp=hp, npad=npad, nw=nw, prm_const=prm_const
    )
    ds1t = pl.pallas_call(
        kern,
        grid=(nj, 2),
        in_specs=[
            pl.BlockSpec(
                (rrows, _TN),
                lambda jj, f: (0, f * nw + jnp.clip(jj - npad, 0, nw - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hp, _TN),
                lambda jj, f: (0, jnp.clip(jj - npad, 0, nw - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hp, _TN),
                lambda jj, f: (f, jnp.clip(jj - npad, 0, nw - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TN, hp), lambda jj, f: (f * nj + jj, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * nj * _TN, hp), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((wrows, _TN), jnp.float32),
            pltpu.VMEM((wrows, _TN), jnp.float32),
            pltpu.SMEM((nsw,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(s1cat, ct_p, d2cat, prm)
    return ds1t, ph


# --------------------------------------------------------------------------
# B1: (logitsT, dS1T) -> dgray
# --------------------------------------------------------------------------


def _b1_kernel(
    logitsT_ref, ds1t_ref, s1t_ref, prm_ref, dgray_ref, hs_ref, dsw_ref, dlacc_ref, segx_ref,
    *, band, w, wl, ph, test_above, prm_const,
):
    f = pl.program_id(1)
    _, inv_tau, tf, inv_t, _ = _prm_scalars(prm_ref, prm_const)
    sgn0 = 1.0 if test_above else -1.0
    # sgn0/tau as +-1.0 times the f32 inverse (exact; matches F1's scale)
    scale0 = jnp.float32(sgn0) * inv_tau
    sgn = jnp.where(f == 0, jnp.float32(1.0), jnp.float32(-1.0))
    e1 = hs_ref.shape[0]
    prows = s1t_ref.shape[0]

    # heights strip (extended, sentinel-padded) from stored logits —
    # still needed as the weight-pass target g and for the chain rule.
    # Same two-step construction as F1 (f1 strip = f0 strip + T*l, exact
    # identity softplus(l) = softplus(-l) + l) so g matches F1's S1
    # normalization bit-for-bit.
    @pl.when(f == 0)
    def _():
        hs_ref[:, :] = jnp.full(hs_ref.shape, _PAD_H, jnp.float32)
        for c in range(0, w, 512):
            cc = min(512, w - c)
            l = logitsT_ref[c : c + cc, :].astype(jnp.float32)
            h = tf * _softplus(-l)
            hs_ref[band + c : band + c + cc, :] = jnp.minimum(h, jnp.float32(_PAD_H))

    @pl.when(f == 1)
    def _():
        for c in range(0, w, 512):
            cc = min(512, w - c)
            l = logitsT_ref[c : c + cc, :].astype(jnp.float32)
            hs_ref[band + c : band + c + cc, :] = (
                hs_ref[band + c : band + c + cc, :] + tf * l
            )

    # widen the bf16 cotangent strip once (the weight pass slices it per
    # tap — per-slice converts dominate otherwise)
    for rr in range(0, prows, 512):
        rcw = min(512, prows - rr)
        dsw_ref[rr : rr + rcw, :] = ds1t_ref[rr : rr + rcw, :].astype(jnp.float32)

    # S1 comes memoized from F1 (exact f32 — weights stay exactly
    # normalized); segment maxima feed the weight-pass skip bounds
    nsx = (prows + _SEG - 1) // _SEG
    for s in range(nsx):
        segx_ref[s] = jnp.max(s1t_ref[s * _SEG : min((s + 1) * _SEG, prows), :])
    smax_glob = _seg_global(segx_ref, nsx, op=jnp.maximum, init=_NEG_HUGE)

    # weight pass + heights/threshold chain rule, accumulated over fields
    for r in range(0, wl, _CHUNK):
        rc = min(_CHUNK, wl - r)
        g_chunk = hs_ref[band + r : band + r + rc, :]
        dh = _chunk_weight_sum(
            s1t_ref, dsw_ref, ph - band, r, rc, band, tf, inv_t,
            g_chunk, segx_ref, prows, smax_glob,
        )
        l = logitsT_ref[r : r + rc, :].astype(jnp.float32) * sgn
        sig = _sigmoid(-l)
        # h = min(T*softplus(-l), PAD_H); dh/dl = -T*sigmoid(-l) if not clipped
        live = g_chunk < jnp.float32(_PAD_H)
        dl = jnp.where(live, dh * (-tf) * sig, jnp.float32(0.0))
        # l = sgn * sgn0 * (v - 127.5)/tau  ->  dv = dl * sgn * sgn0 / tau
        dv = dl * (sgn * scale0)
        prev = jnp.where(f == 0, jnp.zeros_like(dv), dlacc_ref[r : r + rc, :])
        dlacc_ref[r : r + rc, :] = prev + dv

    @pl.when(f == 1)
    def _():
        _transpose_into(dgray_ref, dlacc_ref[:, :], 0)


def b1_pass(logitsT, ds1t, s1t_cat, prm, hp, w_real, band, ph, test_above, interpret, prm_const=None):
    wl = logitsT.shape[0]
    nb = hp // _TM
    e1 = _round_up(2 * band + wl + 24, 8)
    prows = ph + wl + ph
    nsx = (prows + _SEG - 1) // _SEG
    kern = functools.partial(
        _b1_kernel, band=band, w=w_real, wl=wl, ph=ph, test_above=test_above,
        prm_const=prm_const,
    )
    return pl.pallas_call(
        kern,
        grid=(nb, 2),
        in_specs=[
            pl.BlockSpec((wl, _TM), lambda i, f: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((prows, _TM), lambda i, f: (f, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((prows, _TM), lambda i, f: (f, i + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TM, wl), lambda i, f: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wl), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((e1, _TM), jnp.float32),
            pltpu.VMEM((prows, _TM), jnp.float32),
            pltpu.VMEM((wl, _TM), jnp.float32),
            pltpu.SMEM((nsx,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(logitsT, ds1t, s1t_cat, prm)


# --------------------------------------------------------------------------
# public entry: custom-VJP fused soft field
# --------------------------------------------------------------------------


def fused_geometry_ok(gray: jnp.ndarray, band: int) -> bool:
    """Shape/band gate alone (backend-independent — interpret-mode callers
    use this): 2-D, band within the halo-block geometry."""
    return gray.ndim == 2 and band <= _TM - 16 and gray.shape[0] >= 2


def fused_ok(gray: jnp.ndarray, band: int) -> bool:
    """Gate for the fused pipeline: 2-D, band within the halo-block
    geometry, running on real TPU."""
    return fused_geometry_ok(gray, band) and jax.default_backend() in ("tpu", "axon")


def _params(tau, temperature, eps, ylo=0.0, yhi=3.0e38):
    """(7,) f32 kernel params [tau, 1/tau, T, 1/T, eps, ylo, yhi]. For
    static Python floats the inverses are double-divided then rounded
    once — exactly the value jnp.float32(1.0 / t) produced when these
    were compile-time constants, so the static path stays bit-identical.
    Traced scalars divide in f32 (internally consistent: fwd and bwd read
    the same SMEM values).

    (ylo, yhi): F1's live-row window in padded-block coordinates — rows
    outside it emit the PAD sentinel into s1cat. Single-chip callers pass
    (0, h); the sharded windowed tier passes per-shard traced bounds so
    beyond-image halo rows of edge shards read as sentinels. Always read
    from SMEM (never folded), so traced bounds cost nothing extra."""
    if (
        isinstance(tau, (int, float))
        and isinstance(temperature, (int, float))
        and isinstance(ylo, (int, float))
        and isinstance(yhi, (int, float))
    ):
        return jnp.asarray(
            [tau, 1.0 / tau, temperature, 1.0 / temperature, eps, ylo, yhi],
            jnp.float32,
        )
    tauf = jnp.asarray(tau, jnp.float32)
    tf = jnp.asarray(temperature, jnp.float32)
    one = jnp.float32(1.0)
    return jnp.stack(
        [
            tauf,
            one / tauf,
            tf,
            one / tf,
            jnp.full((), eps, jnp.float32),
            jnp.asarray(ylo, jnp.float32),
            jnp.asarray(yhi, jnp.float32),
        ]
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_field_p(gray, prm, band, test_above, interpret, prm_const):
    out, _ = _fused_fwd(gray, prm, band, test_above, interpret, prm_const)
    return out


def _fused_fwd(gray, prm, band, test_above, interpret, prm_const):
    h, w = gray.shape
    hp = _round_up(max(h, _TM), _TM)
    wl = _round_up(max(w, 128), 128)
    gray_p = jnp.pad(gray.astype(jnp.float32), ((0, hp - h), (0, wl - w)))
    s1cat, logitsT, s1t_cat = f1_pass(
        gray_p, prm, w, band, test_above, jnp.float32, interpret,
        prm_const=prm_const,
    )
    field, d2cat = f2_pass(s1cat, prm, hp, band, interpret, prm_const=prm_const)
    return field[:h, :w], (prm, s1cat, logitsT, s1t_cat, d2cat, h, w, hp, wl)


def _fused_bwd(band, test_above, interpret, prm_const, res, ct):
    prm, s1cat, logitsT, s1t_cat, d2cat, h, w, hp, wl = res
    ct_p = jnp.pad(ct.astype(jnp.float32), ((0, hp - h), (0, wl - w)))
    ds1t, ph = b2_pass(s1cat, ct_p, d2cat, prm, band, interpret, prm_const=prm_const)
    dgray = b1_pass(
        logitsT, ds1t, s1t_cat, prm, hp, w, band, ph, test_above, interpret,
        prm_const=prm_const,
    )
    # tau/temperature/eps are schedule constants here: their cotangent is
    # reported as zero (differentiate the composed softsdf path if you
    # need parameter gradients)
    return (dgray[:h, :w], jnp.zeros((7,), jnp.float32))


def _fused_fwd_vjp(gray, prm, band, test_above, interpret, prm_const):
    return _fused_fwd(gray, prm, band, test_above, interpret, prm_const)


_fused_field_p.defvjp(_fused_fwd_vjp, _fused_bwd)


def soft_sdf_field_fused(gray, band, tau, temperature, eps, test_above, interpret=False):
    """Fused Pallas soft SDF field: (H, W) gray -> (H, W) f32 signed
    field. Same math as ops.softsdf.soft_sdf_field (see module
    docstring). tau/temperature/eps are static floats here (baked into
    the kernels as constants so XLA folds e.g. T = 1 multiplies); see
    soft_sdf_field_fused_dynamic for traced schedules."""
    tau = float(tau)
    temperature = float(temperature)
    eps = float(eps)
    prm_const = (tau, 1.0 / tau, temperature, 1.0 / temperature, eps)
    return _fused_field_p(
        gray,
        _params(tau, temperature, eps, 0.0, float(gray.shape[0])),
        band, test_above, interpret, prm_const,
    )


# --------------------------------------------------------------------------
# split pipeline (sharded tier): F1-local -> halo(s1) -> F2-extended
#
# The sharded soft path (parallel/sharded.py) runs pass 1 shard-locally
# (rows never cross shards — the omp-for row axis, openmp/df.c:113-117),
# exchanges a band-row halo of the natural-layout S1 over ICI, and runs
# pass 2 on the halo-extended block. These two custom-VJP ops expose that
# seam over the SAME kernels as the single-chip fused pipeline:
#   pass1_s1:  gray block -> natural-layout s1 (h, 2*WL); backward = B1.
#   pass2_ext: halo-extended s1ext -> interior field rows; backward = B2
#     run over the EXTENDED row range, so the halo rows' cotangents come
#     back too and the halo exchange's AD transpose (ppermute) routes
#     them to the owning shards.
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def pass1_s1(gray, prm, band, test_above, interpret, prm_const):
    s1, _ = _p1_fwd(gray, prm, band, test_above, interpret, prm_const)
    return s1


def _p1_fwd(gray, prm, band, test_above, interpret, prm_const):
    h, w = gray.shape
    hp = _round_up(max(h, _TM), _TM)
    wl = _round_up(max(w, 128), 128)
    gray_p = jnp.pad(gray.astype(jnp.float32), ((0, hp - h), (0, wl - w)))
    s1cat, logitsT, s1t_cat = f1_pass(
        gray_p, prm, w, band, test_above, jnp.float32, interpret,
        prm_const=prm_const,
    )
    # natural-layout local rows (the TM sentinel blocks and >=h pad rows
    # are reconstructed by the consumer from halo/fill)
    s1 = jax.lax.slice_in_dim(s1cat, _TM, _TM + h, axis=0)
    return s1, (logitsT, s1t_cat, prm, h, w, hp, wl)


def _p1_bwd(band, test_above, interpret, prm_const, res, ds1):
    logitsT, s1t_cat, prm, h, w, hp, wl = res
    ph = _round_up(2 * band + 24, _TN)
    ds1_p = jnp.pad(ds1.astype(jnp.float32), ((0, hp - h), (0, 0)))
    z = jnp.zeros((ph, hp), jnp.float32)
    slabs = []
    for fidx in range(2):
        slabs += [z, ds1_p[:, fidx * wl : (fidx + 1) * wl].T, z]
    ds1t = jnp.concatenate(slabs, axis=0)  # (2*(ph+wl+ph), hp) — B2's layout
    dgray = b1_pass(
        logitsT, ds1t, s1t_cat, prm, hp, w, band, ph, test_above, interpret,
        prm_const=prm_const,
    )
    return (dgray[:h, :w], jnp.zeros((7,), jnp.float32))


pass1_s1.defvjp(_p1_fwd, _p1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def pass2_ext(s1ext, prm, bands, interpret, prm_const):
    field, _ = _p2e_fwd(s1ext, prm, bands, interpret, prm_const)
    return field


def _p2e_fwd(s1ext, prm, bands, interpret, prm_const):
    band, halo = bands  # halo >= band rows attached on each side (8-aligned)
    hb, twl = s1ext.shape
    pad = jnp.full((_TM, twl), jnp.float32(_PAD_H))
    s1cat_b = jnp.concatenate([pad, s1ext, pad], axis=0)
    # F2 over the extended row range: rows within `halo` of either end
    # read fill/partial data and are discarded (their cotangent is zero
    # in backward, so their memoized d2 never contributes either).
    # Override F2's live window to the interior range: prm[5:7] carries
    # F1's per-shard window in LOCAL gray coords, which is misaligned
    # here (and halo-row outputs are discarded anyway — masking them
    # keeps edge-shard fill rows out of the skip bounds; see
    # _chunk_softmin's live_mask).
    prm2 = prm.at[5].set(jnp.float32(halo)).at[6].set(jnp.float32(hb - halo))
    field, d2cat = f2_pass(s1cat_b, prm2, hb, band, interpret, prm_const=prm_const)
    return (
        jax.lax.slice_in_dim(field, halo, hb - halo, axis=0),
        (s1cat_b, d2cat, prm, hb),
    )


def _p2e_bwd(bands, interpret, prm_const, res, ct):
    band, halo = bands
    s1cat_b, d2cat, prm, hb = res
    ct_b = jnp.pad(ct.astype(jnp.float32), ((halo, halo), (0, 0)))
    ds1t, ph = b2_pass(s1cat_b, ct_b, d2cat, prm, band, interpret, prm_const=prm_const)
    twl = s1cat_b.shape[1]
    wl = twl // 2
    slab = ph + wl + ph
    din = ds1t[ph : ph + wl, :].astype(jnp.float32).T  # (hb, wl)
    dout = ds1t[slab + ph : slab + ph + wl, :].astype(jnp.float32).T
    return (jnp.concatenate([din, dout], axis=1), jnp.zeros((7,), jnp.float32))


pass2_ext.defvjp(_p2e_fwd, _p2e_bwd)


def soft_sdf_field_fused_dynamic(
    gray, tau, temperature, band, eps=1e-6, test_above=True, interpret=False
):
    """Fused soft field with RUNTIME tau/temperature (traced scalars):
    one compiled program serves a whole annealing schedule — per-value
    recompiles cost ~minutes per novel 4K kernel through the
    remote-compile tunnel. Gradients flow to `gray` only;
    tau/temperature are treated as schedule constants (zero cotangent)."""
    return _fused_field_p(
        gray,
        _params(tau, temperature, eps, 0.0, float(gray.shape[0])),
        band, test_above, interpret, None,
    )
