"""MXU (matmul) formulation of the soft pass 1 + fused Pallas pass 2.

The fused pipeline's F1/B1 kernels (ops/pallas_soft_fused.py) spend
their time slicing the banded stencil on the VPU. For inputs with a
DECLARED value range (the CLI/atlas u8 path — NOT trained images),
heights are bounded: h <= h_max = T*softplus(max|logit|), so every
pass-1 tap that can contribute more than exp(-_CUT) relative lies
within K = ceil(sqrt(_CUT*T + h_max)) columns, and the exp-sum needs no
per-pixel max shift: with a single GLOBAL shift c = max(0, h_max-60T),

    S1(q) = c - T log sum_k w(k) * exp((c - h(q+k))/T),  w(k)=exp(-k^2/T)

every product stays inside f32 normal range (max term <= e^{c/T},
flushed taps < exp(-_CUT) relative — the same truncation the adaptive
kernels already apply). That sum is a short convolution; phrased as
overlapping 128-column windows contracted with a constant
(128+2K, 128) band matrix it runs on the MXU (measured 1.6 ms for both
fields at 4K vs 3.2 ms for the F1 kernel; lax.conv does NOT reach the
MXU for short 1-D windows — scripts/prof_conv_p1.py, prof_conv_p1b.py).

Pass 2 admits the SAME global shift (round-3 insight): the k=0 tap gives
S1(q) <= h(q) <= h_max (a soft-min sits below every term), and the
undershoot is bounded by the Gaussian tap sum (S1 >= -T log(2K+1) >
-6T), so S1 is range-bounded whenever the input is — "S1 spans
[0, band^2]" only holds for unbounded trained-image heights. The default
path (pass2='mm') therefore runs BOTH passes as einsums against the
constant band matrix, with forward AND backward entirely in XLA (the VJP
of a matmul against a constant is one matmul); no Pallas kernel, no
custom VJP, no band-geometry limit. pass2='kernel' keeps the round-2
formulation (tuned F2/B2 Pallas kernels behind a custom VJP) for
comparison — measured SLOWER e2e (11.2 vs 9.5 ms adaptive at 4K fwd+bwd)
because the s1cat layout assembly and cotangent transposes eat the F1
win.

No reference analogue (the soft path is BASELINE config 4); the pass-2
kernels and layouts are shared with ops/pallas_soft_fused.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from chaq_sdfgen_tpu.ops import pallas_soft_fused as PF
from chaq_sdfgen_tpu.ops import threshold
from chaq_sdfgen_tpu.ops.edt import big_sentinel

_BLK = 128
_CUT = 30.0  # tap-truncation exponent (margin over the kernels' 27)
# einsum precision: f32 operands decomposed into bf16 passes on the MXU.
# Default 6-pass (HIGHEST). MEASURED on-chip (1K, band 66): 3-pass HIGH
# keeps the field within 1.6e-3 absolute but shifts analytic GRADIENTS by
# up to 16% of scale at sigmoid-knee pixels — the loss curvature there
# (~100x the gradient) amplifies HIGH's ~2e-4 forward perturbation.
# CHAQ_SOFT_MXU_PREC=high opts into the faster decomposition when only
# field values (or FD-level gradient fidelity) matter.
import os as _os
_PRECISION = (
    jax.lax.Precision.HIGH
    if _os.environ.get("CHAQ_SOFT_MXU_PREC", "highest") == "high"
    else jax.lax.Precision.HIGHEST
)
# beyond this h_max/T the global shift cannot keep the max term
# representable in f32 (e^{c/T} <= e^85) — fall back to the fused kernels
_HMAX_OVER_T_LIMIT = 140.0


def _range_stats(band, tau, temperature, gray_range, margin=0.0):
    """(K, shift c) for a declared input range; None when out of gamut.

    ``margin`` widens the value bound (in units of the raw height): pass 2
    consumes S1, which can dip below 0 by up to T*log(#taps) (the soft-min
    of nonnegative heights against a Gaussian tap sum), so its tap cutoff
    needs the extra slack."""
    lo, hi = float(gray_range[0]), float(gray_range[1])
    t = float(temperature)
    labs = max(abs(lo - 127.5), abs(hi - 127.5)) / float(tau)
    # stable softplus(labs)
    h_max = t * (max(labs, 0.0) + math.log1p(math.exp(-abs(labs))))
    if h_max / t > _HMAX_OVER_T_LIMIT:
        return None
    k = min(int(math.ceil(math.sqrt(_CUT * t + h_max + margin))), int(band))
    if k > _BLK:
        # the window construction in _softmin_rows_mm slices k columns out
        # of a BLK-wide block; wider taps would mis-slice at trace time
        return None
    c = max(0.0, h_max - 60.0 * t)
    return max(k, 1), c


# pass-2 value-bound margin: S1 >= -T log(2K+1) >= -T log 257 > -6T for
# any K <= _BLK (see _range_stats docstring); 6T keeps every pass-2
# exponent (c2 - S1)/T <= h_max/T - 54 <= 86 inside f32 range
_P2_MARGIN_T = 6.0


def mxu_ok(gray, band, tau, temperature, gray_range) -> bool:
    """Gate for the default (pass2='mm') MXU path: 2-D, on TPU, static
    params, declared bounded range within the pass-2 gamut (the stricter
    of the two passes' bounds). No band-geometry limit — the einsum
    formulation has no halo-block constraint."""
    if gray_range is None or gray.ndim != 2 or gray.shape[0] < 1:
        return False
    if not (isinstance(tau, (int, float)) and isinstance(temperature, (int, float))):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    t = float(temperature)
    return (
        _range_stats(band, tau, temperature, gray_range, margin=_P2_MARGIN_T * t)
        is not None
    )


def _conv_blk(k):
    """Window block width for tap radius k. The einsum contraction is
    blk+2k, which the MXU pads to a multiple of 128: a 64-wide block
    with k <= 16 needs ONE 128-deep pass where 128-wide needs two —
    MEASURED (scripts/prof_blkwidth.py, 4K, K=10): rows 0.23 vs 0.39 ms,
    cols 0.25 vs 0.30. At K=22 the cols cell regressed (0.46 vs 0.35),
    so the narrow block is gated at k <= 16 (covers the u8 gamut up to
    T ~ 2.7; default tau=2, T=1 has K=K2=10)."""
    return 64 if k <= 16 else _BLK


def _band_matrix(k, temperature, blk=None):
    """(blk+2K, blk) constant: W[j, q] = exp(-(j-q-K)^2 / T), 0 beyond K."""
    if blk is None:
        blk = _conv_blk(k)
    j = jnp.arange(blk + 2 * k, dtype=jnp.float32)[:, None]
    q = jnp.arange(blk, dtype=jnp.float32)[None, :]
    d = j - q - jnp.float32(k)
    w = jnp.exp(-(d * d) / jnp.float32(temperature))
    return jnp.where(jnp.abs(d) <= k, w, jnp.float32(0.0))


def _corner_matrices(k, temperature):
    """(Wl, Wm, Wr) 128x128 block-Toeplitz factors of the band matrix.

    The banded conv out[:, 128b+q] = sum_{|d|<=K} w(d) e[:, 128b+q+d]
    touches at most the two adjacent 128-blocks, so it is exactly three
    lane-ALIGNED block matmuls: center Wm[j,q] = w(j-q), left-neighbour
    Wl[j,q] = w(j-q-128) (only the bottom-left KxK corner is nonzero),
    right-neighbour Wr[j,q] = w(j-q+128) (top-right corner). Unlike the
    window form (concatenate into (hgt, nb, 128+2K) slabs), nothing wider
    than the input is ever materialized.

    MEASURED SLOWER than the window form (scripts/prof_conv3.py, 4K,
    slope-timed): rows 0.88 vs 0.61 ms, cols 0.93 vs 0.67, at BOTH K=10
    and K=36 — the 3x128-deep contractions (384 MACs/output vs 128+2K)
    cost more than the window slab's extra HBM traffic saves. Kept as a
    cross-validated negative result; _conv_rows/_conv_cols stay the
    production path."""
    j = jnp.arange(_BLK, dtype=jnp.float32)[:, None]
    q = jnp.arange(_BLK, dtype=jnp.float32)[None, :]

    def band(dshift):
        d = j - q + jnp.float32(dshift)
        w = jnp.exp(-(d * d) / jnp.float32(temperature))
        return jnp.where(jnp.abs(d) <= k, w, jnp.float32(0.0))

    return band(-_BLK), band(0), band(_BLK)


def _shift_blocks(eb, direction):
    """Shift the block axis (axis -2 of (..., nb, BLK)) by one block,
    filling the vacated block with zeros (the conv's zero boundary)."""
    z = jnp.zeros_like(eb[..., :1, :])
    if direction > 0:  # eb[b-1] arrives at position b
        return jnp.concatenate([z, eb[..., :-1, :]], axis=-2)
    return jnp.concatenate([eb[..., 1:, :], z], axis=-2)


def _conv_rows3(e, corners):
    """Banded conv along axis 1 as three lane-aligned block einsums (see
    _corner_matrices); avoids the (hgt, nb, BLK+2K) window slab."""
    wl, wm, wr = corners
    hgt, wid = e.shape
    eb = e.reshape(hgt, wid // _BLK, _BLK)
    s = jnp.einsum("hbj,jq->hbq", eb, wm, precision=_PRECISION)
    s += jnp.einsum("hbj,jq->hbq", _shift_blocks(eb, 1), wl, precision=_PRECISION)
    s += jnp.einsum("hbj,jq->hbq", _shift_blocks(eb, -1), wr, precision=_PRECISION)
    return s.reshape(hgt, wid)


def _conv_cols3(e, corners):
    """Banded conv along axis 0 as three block einsums on the row-block
    axis — the pass-2 twin of _conv_rows3."""
    wl, wm, wr = corners
    hgt, wid = e.shape
    eb = e.reshape(hgt // _BLK, _BLK, wid)
    z = jnp.zeros_like(eb[:1])
    up = jnp.concatenate([z, eb[:-1]], axis=0)  # block b-1
    dn = jnp.concatenate([eb[1:], z], axis=0)  # block b+1
    s = jnp.einsum("bjw,jq->bqw", eb, wm, precision=_PRECISION)
    s += jnp.einsum("bjw,jq->bqw", up, wl, precision=_PRECISION)
    s += jnp.einsum("bjw,jq->bqw", dn, wr, precision=_PRECISION)
    return s.reshape(hgt, wid)


def _conv_rows(e, wmat, k):
    """W (*) e along axis 1 (the x stencil): windows built by block
    reshape + neighbour pad-of-slice, contracted on the MXU.
    Differentiated by plain XLA AD — a custom VJP with a decoupled
    backward precision was MEASURED SLOWER (10.05 vs 8.58 ms e2e at 4K):
    the custom_vjp boundary blocks XLA from fusing the window
    build/unbuild across fwd/bwd, costing ~1.5 ms, while 3-pass backward
    matmuls save only ~0.3 ms. The neighbour blocks are pads of slices
    (fuse into the einsum operand pipeline), not roll + at[].set
    (materializes a copy per edge write — the sharded-JFA lesson).
    Block width comes from wmat (see _conv_blk)."""
    hgt, wid = e.shape
    blk = wmat.shape[1]
    nb = wid // blk
    eb = e.reshape(hgt, nb, blk)
    # block b-1's last k columns, zeros at b=0 (border: exp(-PAD) = 0)
    left = jnp.pad(eb[:, :-1, blk - k :], ((0, 0), (1, 0), (0, 0)))
    # block b+1's first k columns, zeros at b=nb-1
    right = jnp.pad(eb[:, 1:, :k], ((0, 0), (0, 1), (0, 0)))
    win = jnp.concatenate([left, eb, right], axis=2)  # (hgt, nb, blk+2K)
    s = jnp.einsum("hbj,jq->hbq", win, wmat, precision=_PRECISION)
    return s.reshape(hgt, wid)


def _conv_cols(e, wmat, k):
    """W (*) e along axis 0 (the y stencil) — the pass-2 twin, windows on
    the row-block axis ('bjw,jq->bqw'). Block height comes from wmat
    (see _conv_blk); callers' padded heights are 128-aligned, which
    both widths divide."""
    hgt, wid = e.shape
    blk = wmat.shape[1]
    nb = hgt // blk
    eb = e.reshape(nb, blk, wid)
    up = jnp.pad(eb[:-1, blk - k :, :], ((1, 0), (0, 0), (0, 0)))
    dn = jnp.pad(eb[1:, :k, :], ((0, 1), (0, 0), (0, 0)))
    win = jnp.concatenate([up, eb, dn], axis=1)  # (nb, blk+2K, wid)
    s = jnp.einsum("bjw,jq->bqw", win, wmat, precision=_PRECISION)
    return s.reshape(hgt, wid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def conv_rows_sym(e, k, temperature):
    """Banded Gaussian conv along axis 1 with a self-adjoint VJP.

    w(d) = exp(-d^2/T) is symmetric and the boundary is zero fill, so
    the adjoint of the conv IS the conv — the backward runs the same
    window einsum on the cotangent instead of XLA's mechanical
    transpose of the window build (a blk-deep contraction plus a
    window-overlap scatter-add, MEASURED 0.8+ ms at 4K/blk64 where
    this form costs the forward's ~0.25). No residuals are saved:
    the conv is linear. wmat is rebuilt from (k, T) inside each pass
    and constant-folds under jit."""
    return _conv_rows(e, _band_matrix(k, temperature), k)


def _conv_rows_sym_fwd(e, k, temperature):
    return conv_rows_sym(e, k, temperature), None


def _conv_rows_sym_bwd(k, temperature, _res, ct):
    return (_conv_rows(ct, _band_matrix(k, temperature), k),)


conv_rows_sym.defvjp(_conv_rows_sym_fwd, _conv_rows_sym_bwd)


def _cols_conv_any(e, k, temperature, vma):
    """Cols conv by the fastest available engine: the Pallas MXU kernel
    (window build in VMEM, one 128-deep dot per 64-row block — measured
    0.22 vs 0.26 ms for the einsum at 4K, scripts/prof_pallas_conv.py)
    when the geometry fits and we are on TPU, else the window einsum.
    ``vma``: mesh axis names the block varies over when called inside
    shard_map (required on the pallas out_shape by check_vma)."""
    from chaq_sdfgen_tpu.ops import pallas_band_conv as PC

    if PC.cols_conv_ok(e, k) and jax.default_backend() in ("tpu", "axon"):
        return PC.cols_conv(e, k, temperature, vma=vma)
    return _conv_cols(e, _band_matrix(k, temperature), k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def conv_cols_sym(e, k, temperature, vma=None):
    """Axis-0 twin of conv_rows_sym (see there)."""
    return _cols_conv_any(e, k, temperature, vma)


def _conv_cols_sym_fwd(e, k, temperature, vma):
    return conv_cols_sym(e, k, temperature, vma), None


def _conv_cols_sym_bwd(k, temperature, vma, _res, ct):
    return (_cols_conv_any(ct, k, temperature, vma),)


conv_cols_sym.defvjp(_conv_cols_sym_fwd, _conv_cols_sym_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def pass2_fused_sym(a_in, a_out, k2, temperature, shift, eps, vma=None, interpret=False):
    """Fused pass-2: cols-conv both fields + the soft-SDF tails in ONE
    Pallas kernel (ops/pallas_band_conv.p2_fused_fwd), with a matching
    single-kernel backward (tails' VJP + self-adjoint cols-conv of the
    ds cotangents). Removes the s/ds HBM round-trips and the custom-op
    glue between four separate bwd stages."""
    from chaq_sdfgen_tpu.ops import pallas_band_conv as PC

    field, _, _ = PC.p2_fused_fwd(
        a_in, a_out, k2, temperature, shift, eps, interpret=interpret, vma=vma
    )
    return field


def _pass2_fused_sym_fwd(a_in, a_out, k2, temperature, shift, eps, vma, interpret):
    from chaq_sdfgen_tpu.ops import pallas_band_conv as PC

    field, d2i, d2o = PC.p2_fused_fwd(
        a_in, a_out, k2, temperature, shift, eps, interpret=interpret, vma=vma
    )
    return field, (d2i, d2o)


def _pass2_fused_sym_bwd(k2, temperature, shift, eps, vma, interpret, res, ct):
    from chaq_sdfgen_tpu.ops import pallas_band_conv as PC

    d2i, d2o = res
    return PC.p2_fused_bwd(
        ct.astype(jnp.float32), d2i, d2o, k2, temperature, shift, eps,
        interpret=interpret, vma=vma,
    )


pass2_fused_sym.defvjp(_pass2_fused_sym_fwd, _pass2_fused_sym_bwd)


def _safe_neglog(s, temperature, shift, dead_value):
    """shift - T log(s), with fully-dead windows (s sums to exactly 0 —
    padded rows/columns beyond the image) routed to ``dead_value``.
    A subnormal floor (1e-38) would flush back to 0 and log(0) = -inf
    puts +inf into the output; downstream VJPs then turn that into
    inf*0 NaN that contaminates live pixels. Double-where with a
    NORMAL-range floor: the log never sees a non-positive argument on
    either pass of AD. Live windows are safe: the center tap alone
    contributes >= e^-60 ~ 9e-27 >> 1e-30 by the global-shift bound."""
    flo = jnp.float32(1e-30)
    live = s > flo
    s_safe = jnp.where(live, s, jnp.float32(1.0))
    out = jnp.float32(shift) - jnp.float32(temperature) * jnp.log(s_safe)
    return jnp.where(live, out, jnp.float32(dead_value))


def _softmin_rows_mm(e, wmat, k, temperature, shift):
    """soft-min along axis 1 of shifted exp-heights e (rows, wl):
    c - T log(W (*) e)."""
    return _safe_neglog(_conv_rows(e, wmat, k), temperature, shift, PF._PAD_H)


def _pass1_fields(gray_p, h, w, band, tau, temperature, test_above, k, shift):
    """gray_p (hp, wl) f32 -> (s1_in, s1_out) natural-layout pass-1
    soft-min fields, rows >= h and columns >= w at the PAD sentinel."""
    hp, wl = gray_p.shape
    t = jnp.float32(temperature)
    big = big_sentinel(band)
    logits = threshold.soft_logits(gray_p, tau=tau, test_above=test_above)
    h_in = threshold.soft_log_indicator_from_logits(logits, temperature, True, big)
    h_out = threshold.soft_log_indicator_from_logits(logits, temperature, False, big)
    live_c = jnp.arange(wl)[None, :] < w
    c = jnp.float32(shift)
    e_in = jnp.where(live_c, jnp.exp((c - h_in) / t), jnp.float32(0.0))
    e_out = jnp.where(live_c, jnp.exp((c - h_out) / t), jnp.float32(0.0))
    wmat = _band_matrix(k, temperature)
    s1_in = _softmin_rows_mm(e_in, wmat, k, temperature, shift)
    s1_out = _softmin_rows_mm(e_out, wmat, k, temperature, shift)
    # Dead columns within K of the image edge still see live taps in
    # their window and would carry finite values; the fused F1 layout
    # (which f2_pass's skip bounds assume) puts the PAD sentinel there.
    live_r = jnp.arange(hp)[:, None] < h
    live = jnp.logical_and(live_c, live_r)
    s1_in = jnp.where(live, s1_in, jnp.float32(PF._PAD_H))
    s1_out = jnp.where(live, s1_out, jnp.float32(PF._PAD_H))
    return s1_in, s1_out


def _pass1_s1cat(gray_p, h, w, band, tau, temperature, test_above, k, shift):
    """gray_p (hp, wl) f32 -> s1cat ((hp/TM+2)*TM, 2*wl) f32 in the exact
    layout f2_pass expects: natural-layout pass-1 soft-min, in-field
    columns [0, wl), out-field [wl, 2wl), one TM-row sentinel block above
    and below, rows >= h and columns >= w at the PAD sentinel."""
    hp, wl = gray_p.shape
    s1_in, s1_out = _pass1_fields(
        gray_p, h, w, band, tau, temperature, test_above, k, shift
    )
    s1 = jnp.concatenate([s1_in, s1_out], axis=1)  # (hp, 2wl)
    pad = jnp.full((PF._TM, 2 * wl), jnp.float32(PF._PAD_H))
    return jnp.concatenate([pad, s1, pad], axis=0)


# ---- pass 2: the tuned F2/B2 Pallas kernels behind a custom VJP ----


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _pass2_p(s1cat, prm, hp, band, interpret, prm_const):
    field, _ = PF.f2_pass(s1cat, prm, hp, band, interpret, prm_const=prm_const)
    return field


def _pass2_fwd(s1cat, prm, hp, band, interpret, prm_const):
    field, d2cat = PF.f2_pass(s1cat, prm, hp, band, interpret, prm_const=prm_const)
    return field, (s1cat, d2cat, prm)


def _pass2_bwd(hp, band, interpret, prm_const, res, ct):
    s1cat, d2cat, prm = res
    ds1t, ph = PF.b2_pass(
        s1cat, ct.astype(jnp.float32), d2cat, prm, band, interpret,
        prm_const=prm_const,
    )
    # ds1t: per field f, a (ph + wl + ph, hp) transposed slab (rows = x
    # columns, cols = y rows; the ph edge slabs are written zero)
    twl = s1cat.shape[1]
    wl = twl // 2
    slab = ph + wl + ph
    din = ds1t[ph : ph + wl, :].astype(jnp.float32).T
    dout = ds1t[slab + ph : slab + ph + wl, :].astype(jnp.float32).T
    dmid = jnp.concatenate([din, dout], axis=1)  # (hp, 2wl)
    z = jnp.zeros((PF._TM, twl), jnp.float32)
    return jnp.concatenate([z, dmid, z], axis=0), jnp.zeros((7,), jnp.float32)


_pass2_p.defvjp(_pass2_fwd, _pass2_bwd)


def soft_sdf_field_mxu(
    gray,
    band,
    tau,
    temperature,
    eps,
    test_above=True,
    gray_range=(0.0, 255.0),
    interpret=False,
    pass2="mm",
):
    """Soft SDF field with MXU matmul passes. Same math as
    ops.softsdf.soft_sdf_field; requires static tau/temperature and a
    declared input range (callers must guarantee gray stays inside it —
    mild overshoot degrades gracefully, see module docstring).

    pass2='mm' (default): pass 2 is a second einsum against the constant
    band matrix. This works because the pass-1 bound PROPAGATES: the k=0
    tap gives S1(q) <= h(q) <= h_max (a soft-min sits below every term),
    and the undershoot is bounded by the Gaussian tap sum
    (S1 >= -T log(2K+1) > -6T), so S1 is range-bounded whenever the input
    is — NOTES.md's "S1 spans [0, band^2]" only holds for unbounded
    (trained-image) heights. Fully differentiable by XLA AD (a matmul VJP
    against a constant is one matmul).

    pass2='kernel': the tuned F2/B2 Pallas kernels behind a custom VJP
    (the round-2 formulation — kept for on-chip comparison; `interpret`
    only applies here).
    """
    stats = _range_stats(band, tau, temperature, gray_range)
    if stats is None:
        raise ValueError(
            f"input range {gray_range} out of MXU-path gamut for "
            f"tau={tau}, T={temperature}; use the fused/composed path"
        )
    k, shift = stats
    on_tpu_ = jax.default_backend() in ("tpu", "axon")
    if (
        pass2 == "mm"
        and (on_tpu_ or interpret)
        and _os.environ.get("CHAQ_SOFT_MMF", "1") != "0"
    ):
        # fully-fused kernel pair (ops/pallas_soft_mm.py): the whole
        # collapsed cascade in ONE Pallas kernel each way — measured
        # 2.73 vs 3.94 ms at 4K fwd+bwd (scripts/prof_mm_fused.py)
        from chaq_sdfgen_tpu.ops import pallas_soft_mm as PM

        if PM.soft_field_mm_ok(gray, band, tau, temperature, gray_range):
            return PM.soft_field_mm_fused(
                gray, band, tau, temperature, eps, test_above, gray_range,
                interpret=not on_tpu_,
            )
    tau_f, t_f, eps_f = float(tau), float(temperature), float(eps)
    h, w = gray.shape
    hp = PF._round_up(max(h, _BLK), _BLK)
    wl = PF._round_up(max(w, 128), 128)
    gray_p = jnp.pad(gray.astype(jnp.float32), ((0, hp - h), (0, wl - w)))

    if pass2 == "kernel":
        if not PF.fused_geometry_ok(gray, band):
            raise ValueError(
                f"shape {gray.shape} / band {band} outside the fused pass-2 "
                f"kernel geometry; use the fused/composed path (mxu_ok gates this)"
            )
        s1cat = _pass1_s1cat(
            gray_p, h, w, band, tau_f, t_f, test_above, k, shift
        )
        prm_const = (tau_f, 1.0 / tau_f, t_f, 1.0 / t_f, eps_f)
        field = _pass2_p(
            s1cat, PF._params(tau_f, t_f, eps_f), hp, band, interpret, prm_const
        )
        return field[:h, :w]

    stats2 = _range_stats(band, tau, temperature, gray_range, margin=_P2_MARGIN_T * t_f)
    if stats2 is None:
        raise ValueError(
            f"input range {gray_range} out of MXU pass-2 gamut for "
            f"tau={tau}, T={temperature}; use the fused/composed path"
        )
    k2, _ = stats2
    # Collapsed two-conv form: pass 1's log and pass 2's exp CANCEL.
    # With h_in = -T log sigmoid(l) exactly, e_in = exp((c1 - h_in)/T)
    # = exp(c1/T + log_sigmoid(l)) — no separate heights pass — and
    #   d2 = c1 - T log( W2 (*) W1 (*) e ),
    # i.e. the bounded soft EDT is two cascaded band-matrix convolutions
    # of the (shifted) occupancy with ONE log at the end. Range: live
    # terms of the cascade stay in [e^-60, e^(c1/T + 2.6)] with
    # c1/T <= 80 (the Gaussian tap sums add <= 1.3 per pass in the
    # exponent), all inside f32.
    t = jnp.float32(t_f)
    logits = threshold.soft_logits(gray_p, tau=tau, test_above=test_above)
    ls_in = jax.nn.log_sigmoid(logits)
    ls_out = ls_in - logits  # log sigmoid(-l) = log sigmoid(l) - l, exact
    ct1 = jnp.float32(shift / t_f)
    live = jnp.logical_and(
        jnp.arange(wl)[None, :] < w, jnp.arange(hp)[:, None] < h
    )
    e_in = jnp.where(live, jnp.exp(ct1 + ls_in), jnp.float32(0.0))
    e_out = jnp.where(live, jnp.exp(ct1 + ls_out), jnp.float32(0.0))
    # dead input rows/cols are zero; pass-2 windows over them contribute
    # nothing, and dead columns never contaminate live ones (pass 2 is
    # columnwise) — no intermediate masking needed
    a_in = conv_rows_sym(e_in, k, t_f)
    a_out = conv_rows_sym(e_out, k, t_f)
    from chaq_sdfgen_tpu.ops import pallas_band_conv as PC

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if PC.cols_conv_ok(a_in, k2) and (on_tpu or interpret):
        # fused pass 2: cols-conv + tails in one kernel each way
        field = pass2_fused_sym(
            a_in, a_out, k2, t_f, shift, eps_f, interpret=not on_tpu
        )
        return field[:h, :w]
    s_in = conv_cols_sym(a_in, k2, t_f)
    s_out = conv_cols_sym(a_out, k2, t_f)
    d2_in = _safe_neglog(s_in, t_f, shift, PF._PAD_H)
    d2_out = _safe_neglog(s_out, t_f, shift, PF._PAD_H)
    e = jnp.float32(eps_f)
    d_in = jnp.sqrt(jnp.maximum(d2_in, 0) + e)
    d_out = jnp.sqrt(jnp.maximum(d2_out, 0) + e)
    field = d_out - jnp.maximum(d_in - jnp.float32(1.0), jnp.float32(0.0))
    return field[:h, :w]
