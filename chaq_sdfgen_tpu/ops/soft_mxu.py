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

Pass 2 cannot use a global shift (S1 spans [0, band^2] — see NOTES.md),
so it stays on the tuned F2/B2 Pallas kernels via a custom VJP that
returns the natural-layout s1cat cotangent; pass-1's backward is then
plain XLA AD of the einsum (another MXU matmul) — the B1 kernel is not
needed on this path.

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
# beyond this h_max/T the global shift cannot keep the max term
# representable in f32 (e^{c/T} <= e^85) — fall back to the fused kernels
_HMAX_OVER_T_LIMIT = 140.0


def _range_stats(band, tau, temperature, gray_range):
    """(K, shift c) for a declared input range; None when out of gamut."""
    lo, hi = float(gray_range[0]), float(gray_range[1])
    t = float(temperature)
    labs = max(abs(lo - 127.5), abs(hi - 127.5)) / float(tau)
    # stable softplus(labs)
    h_max = t * (max(labs, 0.0) + math.log1p(math.exp(-abs(labs))))
    if h_max / t > _HMAX_OVER_T_LIMIT:
        return None
    k = min(int(math.ceil(math.sqrt(_CUT * t + h_max))), int(band))
    if k > _BLK:
        # the window construction in _softmin_rows_mm slices k columns out
        # of a BLK-wide block; wider taps would mis-slice at trace time
        return None
    c = max(0.0, h_max - 60.0 * t)
    return max(k, 1), c


def mxu_ok(gray, band, tau, temperature, gray_range) -> bool:
    """Gate: 2-D, static params, declared bounded range within gamut, and
    the pass-2 fused-kernel geometry holds."""
    if gray_range is None or gray.ndim != 2:
        return False
    if not (isinstance(tau, (int, float)) and isinstance(temperature, (int, float))):
        return False
    if not PF.fused_ok(gray, band):
        return False
    return _range_stats(band, tau, temperature, gray_range) is not None


def _band_matrix(k, temperature):
    """(BLK+2K, BLK) constant: W[j, q] = exp(-(j-q-K)^2 / T), 0 beyond K."""
    j = jnp.arange(_BLK + 2 * k, dtype=jnp.float32)[:, None]
    q = jnp.arange(_BLK, dtype=jnp.float32)[None, :]
    d = j - q - jnp.float32(k)
    w = jnp.exp(-(d * d) / jnp.float32(temperature))
    return jnp.where(jnp.abs(d) <= k, w, jnp.float32(0.0))


def _softmin_rows_mm(e, wmat, k, temperature, shift):
    """soft-min along axis 1 of shifted exp-heights e (rows, wl):
    c - T log(W (*) e), windows built by block reshape + roll."""
    hgt, wid = e.shape
    nb = wid // _BLK
    eb = e.reshape(hgt, nb, _BLK)
    left = jnp.roll(eb, 1, axis=1)[:, :, _BLK - k :]
    left = left.at[:, 0, :].set(jnp.float32(0.0))  # border: exp(-PAD) = 0
    right = jnp.roll(eb, -1, axis=1)[:, :, :k]
    right = right.at[:, -1, :].set(jnp.float32(0.0))
    win = jnp.concatenate([left, eb, right], axis=2)  # (hgt, nb, BLK+2K)
    s = jnp.einsum("hbj,jq->hbq", win, wmat, precision=jax.lax.Precision.HIGHEST)
    s = s.reshape(hgt, wid)
    # Fully-dead windows (padded columns beyond the image) sum to exactly
    # 0. A subnormal floor (1e-38) flushes back to 0 and log(0) = -inf
    # puts +inf into s1cat; the einsum VJP then turns that into inf*0 NaN
    # that contaminates live pixels. Double-where with a NORMAL-range
    # floor: dead windows go straight to the PAD sentinel and the log
    # never sees a non-positive argument on either pass of AD. Live
    # windows are safe: the k=0 tap alone contributes
    # exp((c - h)/T) >= e^-60 ~ 9e-27 >> 1e-30 by the global-shift bound.
    flo = jnp.float32(1e-30)
    live = s > flo
    s_safe = jnp.where(live, s, jnp.float32(1.0))
    s1 = jnp.float32(shift) - jnp.float32(temperature) * jnp.log(s_safe)
    return jnp.where(live, s1, jnp.float32(PF._PAD_H))


def _pass1_s1cat(gray_p, h, w, band, tau, temperature, test_above, k, shift):
    """gray_p (hp, wl) f32 -> s1cat ((hp/TM+2)*TM, 2*wl) f32 in the exact
    layout f2_pass expects: natural-layout pass-1 soft-min, in-field
    columns [0, wl), out-field [wl, 2wl), one TM-row sentinel block above
    and below, rows >= h and columns >= w at the PAD sentinel."""
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
    s1_in = jnp.where(live_c, s1_in, jnp.float32(PF._PAD_H))
    s1_out = jnp.where(live_c, s1_out, jnp.float32(PF._PAD_H))
    s1 = jnp.concatenate([s1_in, s1_out], axis=1)  # (hp, 2wl)
    live_r = jnp.arange(hp)[:, None] < h
    s1 = jnp.where(live_r, s1, jnp.float32(PF._PAD_H))
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
    return jnp.concatenate([z, dmid, z], axis=0), jnp.zeros((5,), jnp.float32)


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
):
    """Soft SDF field, MXU pass 1 + fused Pallas pass 2. Same math as
    ops.softsdf.soft_sdf_field; requires static tau/temperature and a
    declared input range (callers must guarantee gray stays inside it —
    mild overshoot degrades gracefully, see module docstring).
    Differentiable wrt gray (pass 1 by XLA AD, pass 2 via the B2 kernel).
    """
    if not PF.fused_geometry_ok(gray, band):
        raise ValueError(
            f"shape {gray.shape} / band {band} outside the fused pass-2 "
            f"kernel geometry; use the fused/composed path (mxu_ok gates this)"
        )
    stats = _range_stats(band, tau, temperature, gray_range)
    if stats is None:
        raise ValueError(
            f"input range {gray_range} out of MXU-path gamut for "
            f"tau={tau}, T={temperature}; use the fused/composed path"
        )
    k, shift = stats
    h, w = gray.shape
    hp = PF._round_up(max(h, PF._TM), PF._TM)
    wl = PF._round_up(max(w, 128), 128)
    gray_p = jnp.pad(gray.astype(jnp.float32), ((0, hp - h), (0, wl - w)))
    s1cat = _pass1_s1cat(
        gray_p, h, w, band, float(tau), float(temperature), test_above, k, shift
    )
    tau_f, t_f, eps_f = float(tau), float(temperature), float(eps)
    prm_const = (tau_f, 1.0 / tau_f, t_f, 1.0 / t_f, eps_f)
    field = _pass2_p(
        s1cat, PF._params(tau_f, t_f, eps_f), hp, band, interpret, prm_const
    )
    return field[:h, :w]
