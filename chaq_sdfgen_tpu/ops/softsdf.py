"""Differentiable (soft) SDF path — no reference analogue (BASELINE
config 4): pixel gradients flow from the output SDF back to input
intensities.

Construction (mirrors the hard pipeline structurally):
  occupancy   o = sigmoid((v - 127.5)/tau)          (soft threshold)
  heights     h_in = -T log o,  h_out = -T log(1-o) (soft indicator)
  soft-min    D = -T log sum exp(-(dx^2+dy^2+h)/T)  (soft parabola envelope)
  distance    d = sqrt(relu(D) + eps)
  merge       s = d_out - relu(d_in - 1)            (the -1 bias, soft)

The 2-D soft-min separates exactly into two 1-D banded passes because
logsumexp distributes over the additive decomposition dx^2 + dy^2 + h —
the same two-pass structure as the hard EDT (and as blockwise softmax in
flash attention, which is also how it shards: the streaming (max, sumexp)
state merges associatively across tiles).

band_softmin carries a custom VJP: the backward pass recomputes the
softmax weights from the saved output instead of storing per-tap
residuals, keeping memory O(n^2) instead of O(n^2 * band).
As (tau, T) -> 0 the whole pipeline converges to the hard EXACT path.
"""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
from jax import lax

from chaq_sdfgen_tpu.ops import threshold
from chaq_sdfgen_tpu.ops.edt import big_sentinel

log = logging.getLogger(__name__)


_PAD_HEIGHT = 1e30  # sentinel height: exp(-(d^2+1e30)/T) underflows to 0


def band_softmin(g: jnp.ndarray, band: int, temperature: float, axis: int = -2) -> jnp.ndarray:
    """S(p) = -T log sum_{|d| <= band} exp(-(d^2 + g(p+d))/T) along ``axis``.

    Streaming (max, sumexp) accumulation over taps — numerically stable for
    any T. Out-of-range taps contribute exp(-inf) = 0.
    """
    axis = axis % g.ndim
    pad = [(0, 0)] * g.ndim
    pad[axis] = (band, band)
    gp = jnp.pad(g, pad, constant_values=jnp.float32(_PAD_HEIGHT))
    return band_softmin_ext(gp, band, temperature, axis)


def _pallas_ok(gext: jnp.ndarray, band: int, axis: int) -> bool:
    """Use the Pallas strip kernels when on TPU, 2-D, column-direction, and
    the strip fits the VMEM budget (pallas_soft.py)."""
    if gext.ndim != 2 or (axis % gext.ndim) != 0:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    hext = gext.shape[0]
    # fwd kernel VMEM at TN=128: (in + out) double-buffered f32 strips
    return (hext + (hext - 2 * band)) * 8 * 128 <= 11 * 1024 * 1024


def band_softmin_ext(gext: jnp.ndarray, band: int, temperature, axis: int = -2) -> jnp.ndarray:
    """band_softmin on a pre-extended input (``band`` extra entries on each
    side of ``axis`` — boundary sentinels or an exchanged shard halo).
    Output is 2*band shorter along ``axis`` than the input.

    temperature may be a Python float (static — eligible for the Pallas
    strip kernels) or a traced scalar (annealing schedules: one compile
    serves every value; the scan cores are used and the schedule gets a
    zero cotangent, matching the float API where it was non-diff)."""
    if isinstance(temperature, (int, float)):
        return _band_softmin_ext_p(
            gext, jnp.float32(temperature), band, axis, float(temperature)
        )
    return _band_softmin_ext_p(
        gext, jnp.asarray(temperature, jnp.float32), band, axis, None
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _band_softmin_ext_p(gext, t_arr, band, axis, t_static):
    if t_static is not None and _pallas_ok(gext, band, axis):
        from chaq_sdfgen_tpu.ops import pallas_soft

        return pallas_soft.softmin_col_fwd(gext, band, t_static, interpret=False)
    return _band_softmin_fwd_impl(gext, band, t_arr, axis)


def _band_softmin_fwd_impl(gext, band, temperature, axis):
    axis = axis % gext.ndim
    h = gext.shape[axis] - 2 * band
    t = jnp.asarray(temperature, jnp.float32)
    neg_huge = jnp.float32(-3e38)

    def step(carry, k):
        m, s = carry
        dy = (k - band).astype(jnp.float32)
        tap = lax.dynamic_slice_in_dim(gext, k, h, axis=axis)
        z = -(dy * dy + tap) / t
        m2 = jnp.maximum(m, z)
        # rescale previous sum; exp(neg_huge - m2) == 0 handles the init
        s2 = s * jnp.exp(m - m2) + jnp.exp(z - m2)
        return (m2, s2), None

    # derive carries from a slice so their sharding/varying type matches
    # under shard_map (jnp.full would be replicated)
    zeros = lax.slice_in_dim(gext, band, band + h, axis=axis) * jnp.float32(0.0)
    m0 = zeros + neg_huge
    s0 = zeros
    (m, s), _ = lax.scan(step, (m0, s0), jnp.arange(2 * band + 1, dtype=jnp.int32))
    return -t * (m + jnp.log(jnp.maximum(s, jnp.float32(1e-38))))


def _band_softmin_ext_fwd(gext, t_arr, band, axis, t_static):
    out = _band_softmin_ext_p(gext, t_arr, band, axis, t_static)
    return out, (gext, t_arr, out)


def _band_softmin_ext_bwd(band, axis, t_static, res, ct):
    gext, t_arr, out = res
    dt = jnp.zeros((), jnp.float32)  # schedule constant (see band_softmin_ext)
    if t_static is not None and _pallas_ok(gext, band, axis):
        from chaq_sdfgen_tpu.ops import pallas_soft

        return (
            pallas_soft.softmin_col_bwd(gext, out, ct, band, t_static, interpret=False),
            dt,
        )
    axis = axis % gext.ndim
    hext = gext.shape[axis]
    t = jnp.asarray(t_arr, jnp.float32)
    # dL/dgext[p] = sum_{j=0..2B} w(p-j+B... ) — out index q = p - j with
    # weight exp((S[q] - (p-q-B... ) : out[q] consumed gext[q+k], k = p-q.
    # Pad out/ct by 2B on both sides so q = p - k is always in range.
    pad = [(0, 0)] * gext.ndim
    pad[axis] = (2 * band, 2 * band)
    outp = jnp.pad(out, pad, constant_values=jnp.float32(-3e38))
    ctp = jnp.pad(ct, pad, constant_values=jnp.float32(0.0))

    def step(acc, k):
        # out[q] with q = p - k  ->  slice of padded arrays starting at 2B - k
        dy = (k - band).astype(jnp.float32)
        start = jnp.int32(2 * band) - k
        s_tap = lax.dynamic_slice_in_dim(outp, start, hext, axis=axis)
        c_tap = lax.dynamic_slice_in_dim(ctp, start, hext, axis=axis)
        w = jnp.exp((s_tap - dy * dy - gext) / t)
        return acc + w * c_tap, None

    acc0 = gext * jnp.float32(0.0)
    acc, _ = lax.scan(step, acc0, jnp.arange(2 * band + 1, dtype=jnp.int32))
    return (acc, dt)


_band_softmin_ext_p.defvjp(_band_softmin_ext_fwd, _band_softmin_ext_bwd)


def soft_edt_sq(heights: jnp.ndarray, band: int, temperature: float) -> jnp.ndarray:
    """Two-pass separable soft squared-EDT of a height field (..., H, W).

    For 2-D inputs the row pass runs as a column pass on the transpose so
    that, on TPU, both passes hit the Pallas strip kernel (the stencil must
    slide along sublanes; lane-direction shifts are expensive)."""
    if heights.ndim == 2:
        s1 = band_softmin(heights.T, band, temperature, axis=-2).T
    else:
        s1 = band_softmin(heights, band, temperature, axis=-1)
    return band_softmin(s1, band, temperature, axis=-2)


def _warn_large_band(band: int) -> None:
    """Large-spread soft calls (band > the fused kernels' halo-block
    geometry, reference accepts any -s: openmp/sdfgen.c:174-180) fall back
    to the composed scan cores — same math, several times slower at 4K.
    Say so loudly on TPU instead of a silent path change."""
    from chaq_sdfgen_tpu.ops import pallas_soft_fused

    limit = pallas_soft_fused._TM - 16
    if band > limit and jax.default_backend() in ("tpu", "axon"):
        log.warning(
            "soft_sdf_field: band %d exceeds the fused-kernel geometry "
            "(max %d); using the composed scan path (same math, slower). "
            "Reduce spread or split the field if throughput matters.",
            band, limit,
        )


def soft_sdf_field(
    gray: jnp.ndarray,
    spread: int,
    tau: float = 1.0,
    temperature: float = 0.5,
    eps: float = 1e-6,
    test_above: bool = True,
    band: int | None = None,
    gray_range: tuple | None = None,
) -> jnp.ndarray:
    """Signed soft distance field (float32) from raw gray values (..., H, W).

    Converges to the hard EXACT pipeline's pre-remap signed values as
    (tau, temperature) -> 0.

    ``gray_range``: optional DECLARED (lo, hi) bound on the input values
    (the CLI/atlas u8 path passes (0, 255)). A declared bound lets pass 1
    run as an MXU matmul (ops/soft_mxu.py) — the caller guarantees the
    bound; mild overshoot (e.g. SGD pixel updates) degrades gracefully,
    but unbounded trained images must pass None to keep the adaptive
    kernels.
    """
    band = band if band is not None else spread + 2
    big = big_sentinel(band)
    _warn_large_band(band)
    # fused-pipeline dispatch — the default TPU path (4-kernel fwd+bwd,
    # measured 17.9 ms vs 24.3 ms composed at 4K fwd+bwd); opt out with
    # CHAQ_SOFT_FUSED=0 to force the composed kernels
    if os.environ.get("CHAQ_SOFT_FUSED", "1") != "0":
        from chaq_sdfgen_tpu.ops import pallas_soft_fused

        g2d = gray if gray.ndim == 2 else gray.reshape(-1, *gray.shape[-2:])[0]
        # MXU pass-1 dispatch: declared-range inputs with static params
        # run pass 1 as an einsum against the constant band matrix
        # (ops/soft_mxu.py — measured 1.6 ms vs the F1 kernel's 3.2 ms at
        # 4K); opt out with CHAQ_SOFT_MXU=0
        if os.environ.get("CHAQ_SOFT_MXU", "1") != "0":
            from chaq_sdfgen_tpu.ops import soft_mxu

            if soft_mxu.mxu_ok(g2d, band, tau, temperature, gray_range):
                def mfn(g):
                    return soft_mxu.soft_sdf_field_mxu(
                        g, band, tau, float(temperature), float(eps),
                        test_above, gray_range,
                    )
                if gray.ndim == 2:
                    log.debug("soft_sdf_field: MXU pass-1 pipeline (2-D)")
                    return mfn(gray)
                log.debug(
                    "soft_sdf_field: MXU pass-1 pipeline (vmapped %s)", gray.shape
                )
                vmfn = mfn
                for _ in range(gray.ndim - 2):
                    vmfn = jax.vmap(vmfn)
                return vmfn(gray)
        if pallas_soft_fused.fused_ok(g2d, band):
            # traced tau/temperature (annealing schedules) dispatch to the
            # dynamic-params kernels: one compile per band instead of one
            # per schedule value. NOTE: no gradients wrt the schedule
            # params on that path (zero cotangent, documented there).
            dynamic = not (
                isinstance(tau, (int, float))
                and isinstance(temperature, (int, float))
            )
            # Runtime range gate (no DECLARED range): if the input's
            # ACTUAL height range fits the f32 global-shift gamut with
            # k <= 16 taps — true for any image within ~3.6x the u8 range
            # at default tau/T — take the fused-mm kernels with a
            # runtime SMEM shift; a lax.cond falls back to the adaptive
            # kernels otherwise. The gate is exact: the kernel result is
            # the same banded soft-min within the documented truncation.
            # CHAQ_SOFT_RT=0 forces the adaptive kernels (A/B timing).
            if (
                not dynamic
                and os.environ.get("CHAQ_SOFT_RT", "1") != "0"
                and jax.default_backend() in ("tpu", "axon")
            ):
                from chaq_sdfgen_tpu.ops import pallas_soft_mm as PM

                t_f, tau_f, eps_f = float(temperature), float(tau), float(eps)
                kk = min(16, band)
                # k^2 >= CUT*T + h_max + 6T (pass-2 margin) AND the
                # global-shift f32 bound h_max <= 140 T
                limit = min(140.0 * t_f, kk * kk - 36.0 * t_f)
                if limit > 0 and PM.soft_field_mm_rt_ok(g2d.shape, band):
                    labs = (
                        jnp.max(jnp.abs(gray.astype(jnp.float32) - 127.5))
                        / jnp.float32(tau_f)
                    )
                    h_max_rt = jnp.float32(t_f) * jax.nn.softplus(labs)
                    pred = h_max_rt <= jnp.float32(limit)
                    shift = jax.lax.stop_gradient(
                        jnp.maximum(h_max_rt - jnp.float32(60.0 * t_f), 0.0)
                    )

                    def rt2d(g):
                        return PM.soft_field_mm_rt(
                            g, shift, band, tau_f, t_f, eps_f, test_above,
                            interpret=jax.default_backend()
                            not in ("tpu", "axon"),
                        )

                    def ad2d(g):
                        return pallas_soft_fused.soft_sdf_field_fused(
                            g, band, tau_f, t_f, eps_f, test_above
                        )

                    # Remat the fallback branch: lax.cond's AD emits the
                    # UNION of both branches' residuals as cond outputs
                    # (~18x the input here — the adaptive kernels memoize
                    # s1cat/logitsT), so the common in-gamut iteration
                    # was zero-filling ~10x-input of untaken residual
                    # buffers every step: measured 3.55 -> 2.92 ms at 4K
                    # fwd+bwd with the checkpoint (grads bitwise equal).
                    # Out-of-gamut inputs through THIS undeclared-range
                    # API now recompute their forward in the backward
                    # (10.0 -> 15.0 ms); callers that KNOW they are
                    # beyond the gamut keep the memoized path via
                    # CHAQ_SOFT_RT=0 or soft_sdf_field_fused directly.
                    # CHAQ_SOFT_RT_REMAT=0 restores the old union cond.
                    if os.environ.get("CHAQ_SOFT_RT_REMAT", "1") != "0":
                        ad2d = jax.checkpoint(ad2d)

                    rt_fn, ad_fn = rt2d, ad2d
                    for _ in range(gray.ndim - 2):
                        rt_fn = jax.vmap(rt_fn)
                        ad_fn = jax.vmap(ad_fn)
                    log.debug(
                        "soft_sdf_field: runtime-range-gated mm dispatch (%s)",
                        gray.shape,
                    )
                    return jax.lax.cond(pred, rt_fn, ad_fn, gray)
            if dynamic:
                def fn(g):
                    return pallas_soft_fused.soft_sdf_field_fused_dynamic(
                        g, tau, temperature, band, float(eps), test_above
                    )
            else:
                # custom_vjp nondiff args must stay positional
                def fn(g):
                    return pallas_soft_fused.soft_sdf_field_fused(
                        g, band, tau, float(temperature), float(eps), test_above
                    )
            if gray.ndim == 2:
                log.debug("soft_sdf_field: fused Pallas pipeline (2-D)")
                return fn(gray)
            # batched: vmap the fused custom-VJP over leading axes
            log.debug("soft_sdf_field: fused Pallas pipeline (vmapped %s)", gray.shape)
            vfn = fn
            for _ in range(gray.ndim - 2):
                vfn = jax.vmap(vfn)
            return vfn(gray)
    log.debug("soft_sdf_field: composed XLA/Pallas path (%s)", gray.shape)
    if gray.ndim == 2:
        # 2-D fast path. One input transpose, heights computed in the
        # transposed layout; pass 1 runs per field (a stacked (2W+B, H)
        # strip would exceed the Pallas VMEM gate and silently fall back
        # to the O(band) XLA scan); pass 2 stacks the two fields along
        # LANES (columns are independent, no gap needed) so one kernel
        # call serves both.
        h_, w_ = gray.shape
        logits_t = threshold.soft_logits(gray.T, tau=tau, test_above=test_above)
        h_in_t = threshold.soft_log_indicator_from_logits(logits_t, temperature, True, big)
        h_out_t = threshold.soft_log_indicator_from_logits(logits_t, temperature, False, big)
        s1_in_t = band_softmin(h_in_t, band, temperature, axis=-2)  # (W, H)
        s1_out_t = band_softmin(h_out_t, band, temperature, axis=-2)
        s1 = jnp.concatenate([s1_in_t.T, s1_out_t.T], axis=1)  # (H, 2W)
        d2s = band_softmin(s1, band, temperature, axis=-2)
        d2_in = d2s[:, :w_]
        d2_out = d2s[:, w_:]
    else:
        logits = threshold.soft_logits(gray, tau=tau, test_above=test_above)
        h_in = threshold.soft_log_indicator_from_logits(logits, temperature, True, big)
        h_out = threshold.soft_log_indicator_from_logits(logits, temperature, False, big)
        d2_in = soft_edt_sq(h_in, band, temperature)
        d2_out = soft_edt_sq(h_out, band, temperature)
    e = jnp.float32(eps)
    d_in = jnp.sqrt(jnp.maximum(d2_in, 0) + e)
    d_out = jnp.sqrt(jnp.maximum(d2_out, 0) + e)
    return d_out - jnp.maximum(d_in - jnp.float32(1.0), jnp.float32(0.0))


def soft_sdf_bytes(
    gray: jnp.ndarray,
    spread: int,
    asymmetric: bool = False,
    clamp: str = "tanh",
    **kw,
) -> jnp.ndarray:
    """Differentiable remapped output in [0, 255] float32 (the soft analogue
    of the reference's byte image)."""
    from chaq_sdfgen_tpu.ops.merge import soft_remap

    s = soft_sdf_field(gray, spread, **kw)
    return soft_remap(s, spread, asymmetric, clamp=clamp)
