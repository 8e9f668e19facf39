"""Fully-fused Pallas pipeline for the collapsed-mm soft SDF path.

ops/soft_mxu.py established that for DECLARED-range inputs the whole
soft EDT collapses to two cascaded banded Gaussian convolutions of the
(globally shifted) occupancy with one log at the end:

    d2 = c - T log( Wcols (*) Wrows (*) exp(c/T) * sigmoid(l) )

Round 3 ran that cascade as XLA window einsums plus a fused pass-2
kernel; the remaining cost was inter-stage HBM materialization (the
occupancy fields, the rows-conv outputs, and the einsum window slabs
each round-trip HBM — NOTES.md round-4 plan). This module fuses the
ENTIRE forward into ONE Pallas kernel per row strip, and the entire
backward into one mirrored kernel:

  forward  : gray strip (+16-row halo blocks) -> occupancy (both fields
             stacked on sublanes) -> rows-conv (MXU window dots, three
             corner-weight matrices so no lane padding is needed) ->
             cols-conv + soft-SDF tails (MXU dots + VPU) -> field and
             the two d2 memos the backward needs.
  backward : ct/d2 strips (+halos) -> tails' VJP -> self-adjoint
             cols-conv -> self-adjoint rows-conv -> occupancy VJP ->
             dgray. Both banded convs are exactly self-adjoint
             (symmetric taps, zero boundary), so the backward reuses
             the same weight matrices in natural layout — none of the
             round-2 transposed-cotangent seams.

Sharding: the kernels take EXPLICIT edge-halo operands (the 16 rows
just above/below the array). Unsharded they are constants; under
shard_map they are `lax.ppermute`d neighbour rows, and the backward
pulls the neighbour ct/d2 edges the same way — so the sharded pipeline
has ZERO reassembly copies (no concat/pad/slice of the shard block,
the round-3 seam cost). Gradients for the halo rows are computed by
their OWNER's kernel from the exchanged cotangent edges; the halo
inputs get zero cotangents (returning nonzero would double-count
through the ppermute transpose).

Liveness rides IN the data: dead pixels (beyond the image, or beyond-
edge halo fills) carry the gray sentinel _DEAD; the kernel maps them to
zero occupancy, which the zero-boundary convs then treat exactly like
the reference's out-of-image region.

No reference analogue (the soft path is BASELINE config 4); semantics
match ops/soft_mxu.soft_sdf_field_mxu (tested against the composed
scan path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HK = 16  # halo rows/cols = padded tap radius (real k <= 16)
_WIN = 64 + 2 * _HK  # window depth: 96 (one padded 128-deep MXU pass)
_DEAD = -1e6  # gray sentinel for dead pixels (image pads, edge halos)
_DEAD_CUT = -1e5
_PAD_H = 1e30  # d2 sentinel for dead windows (matches pallas_soft_fused)
_FLO = 1e-30  # live-window floor (see soft_mxu._safe_neglog)


def _wrow(k, temperature, shift):
    """(96, 64) rows-conv weights: W[j, q] = w(j - q - shift),
    w(d) = exp(-d^2/T), zero beyond |d| > k. shift = _HK for interior
    column blocks (window starts 16 cols left of the block), 0 for the
    first block (window pinned to col 0), 2*_HK for the last (window
    pinned to end at the array edge) — three matrices instead of lane-
    padding the operand."""
    j = jnp.arange(_WIN, dtype=jnp.float32)[:, None]
    q = jnp.arange(64, dtype=jnp.float32)[None, :]
    d = j - q - jnp.float32(shift)
    w = jnp.exp(-(d * d) / jnp.float32(temperature))
    return jnp.where(jnp.abs(d) <= k, w, jnp.float32(0.0))


def _wcolt(k, temperature):
    """(64, 96) cols-conv weights: W[r, j] = w(j - _HK - r) (output row r
    of a 64-row block reads window rows r .. r + 2*_HK)."""
    r = jnp.arange(64, dtype=jnp.float32)[:, None]
    j = jnp.arange(_WIN, dtype=jnp.float32)[None, :]
    d = j - jnp.float32(_HK) - r
    w = jnp.exp(-(d * d) / jnp.float32(temperature))
    return jnp.where(jnp.abs(d) <= k, w, jnp.float32(0.0))


# matmul precision: 6-pass f32 (HIGHEST) by default; CHAQ_SOFT_MXU_PREC=high
# opts into the 3-pass decomposition — ~2e-4 forward error, gradients at
# sigmoid-knee pixels shift up to 16% of scale (measured, see soft_mxu) —
# for throughput-first forward-only use (atlas generation sweeps).
# Mosaic has no HIGH lowering for in-kernel dots (NotImplementedError),
# so the 3-pass form is built manually: a/b split into bf16 hi + lo
# residual, C ~ ah.bh + ah.bl + al.bh (the dropped lo.lo term is
# O(2^-16) relative — exactly XLA's own HIGH decomposition).
import os as _os

_PREC_HIGH = _os.environ.get("CHAQ_SOFT_MXU_PREC", "highest") == "high"


def _dot(a, b):
    if _PREC_HIGH:
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        return d(ah, bh) + d(ah, bl) + d(al, bh)
    return lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _rows_conv_windows(src_ref, dst_ref, wrf, wrm, wrl, wid):
    """Banded conv along lanes: per 64-col block, one (rows, 96) x
    (96, 64) MXU dot; edge blocks use the pinned weight matrices so every
    slice stays in bounds (and 16-aligned)."""
    nb = wid // 64
    sl = slice(None)
    for c in range(nb):
        if c == 0:
            win = src_ref[sl, 0:_WIN]
            wm = wrf
        elif c == nb - 1:
            win = src_ref[sl, wid - _WIN : wid]
            wm = wrl
        else:
            win = src_ref[sl, c * 64 - _HK : c * 64 - _HK + _WIN]
            wm = wrm
        dst_ref[sl, c * 64 : (c + 1) * 64] = _dot(win, wm)


def _blend(main, halo, live):
    return main * live + halo * (jnp.float32(1.0) - live)


def _occupancy(g, tau, temperature, ct1, test_above):
    """gray -> (e_in, e_out) shifted occupancy; _DEAD pixels -> 0.
    ct1 = shift / T (a traced SMEM scalar — one compiled kernel serves
    every shift; the shift cancels exactly in the output)."""
    sgn = 1.0 if test_above else -1.0
    l = (g - jnp.float32(127.5)) * jnp.float32(sgn / tau)
    ls = -jax.nn.softplus(-l)  # log sigmoid(l)
    lmask = g > jnp.float32(_DEAD_CUT)
    zero = jnp.float32(0.0)
    e_in = jnp.where(lmask, jnp.exp(ct1 + ls), zero)
    e_out = jnp.where(lmask, jnp.exp(ct1 + ls - l), zero)
    return e_in, e_out


def _fwd_kernel(
    ga, gs, gb, ht, hb, wrf, wrm, wrl, wct, sref, *rest,
    nstrips, rs, tau, temperature, eps, test_above, memos,
):
    if memos:
        field_ref, d2i_ref, d2o_ref, es_ref, ast_ref = rest
    else:
        field_ref, es_ref, ast_ref = rest
        d2i_ref = d2o_ref = None
    i = pl.program_id(0)
    top_live = jnp.where(i > 0, jnp.float32(1.0), jnp.float32(0.0))
    bot_live = jnp.where(i < nstrips - 1, jnp.float32(1.0), jnp.float32(0.0))
    ext = rs + 2 * _HK
    wid = gs.shape[1]
    c = sref[0]

    g = jnp.concatenate(
        [_blend(ga[...], ht[...], top_live), gs[...], _blend(gb[...], hb[...], bot_live)],
        axis=0,
    )  # (ext, wid)
    t = jnp.float32(temperature)
    e_in, e_out = _occupancy(g, tau, temperature, c / t, test_above)
    es_ref[0:ext, :] = e_in
    es_ref[ext : 2 * ext, :] = e_out

    # rows pass: both fields in one stacked dot per column block
    _rows_conv_windows(es_ref, ast_ref, wrf[...], wrm[...], wrl[...], wid)
    flo = jnp.float32(_FLO)
    pad = jnp.float32(_PAD_H)
    e = jnp.float32(eps)
    wt = wct[...]

    def d2_of(win):
        s = _dot(wt, win)
        live = s > flo
        s_safe = jnp.where(live, s, jnp.float32(1.0))
        return jnp.where(live, c - t * jnp.log(s_safe), pad)

    for p in range(rs // 64):
        d2i = d2_of(ast_ref[p * 64 : p * 64 + _WIN, :])
        d2o = d2_of(ast_ref[ext + p * 64 : ext + p * 64 + _WIN, :])
        d_in = jnp.sqrt(jnp.maximum(d2i, 0) + e)
        d_out = jnp.sqrt(jnp.maximum(d2o, 0) + e)
        sl = slice(p * 64, (p + 1) * 64)
        field_ref[sl, :] = d_out - jnp.maximum(d_in - jnp.float32(1.0), jnp.float32(0.0))
        if memos:
            d2i_ref[sl, :] = d2i
            d2o_ref[sl, :] = d2o


def _bwd_kernel(
    ct_a, ct_s, ct_b, d2i_a, d2i_s, d2i_b, d2o_a, d2o_s, d2o_b,
    ct_ht, ct_hb, d2i_ht, d2i_hb, d2o_ht, d2o_hb,
    gs, wrf, wrm, wrl, wct, sref,
    dgray_ref, dss_ref, dast_ref,
    *, nstrips, rs, tau, temperature, eps, test_above,
):
    i = pl.program_id(0)
    top_live = jnp.where(i > 0, jnp.float32(1.0), jnp.float32(0.0))
    bot_live = jnp.where(i < nstrips - 1, jnp.float32(1.0), jnp.float32(0.0))
    ext = rs + 2 * _HK
    wid = gs.shape[1]
    t = jnp.float32(temperature)
    c = sref[0]
    e = jnp.float32(eps)

    ct = jnp.concatenate(
        [_blend(ct_a[...], ct_ht[...], top_live), ct_s[...],
         _blend(ct_b[...], ct_hb[...], bot_live)], axis=0,
    )
    d2i = jnp.concatenate(
        [_blend(d2i_a[...], d2i_ht[...], top_live), d2i_s[...],
         _blend(d2i_b[...], d2i_hb[...], bot_live)], axis=0,
    )
    d2o = jnp.concatenate(
        [_blend(d2o_a[...], d2o_ht[...], top_live), d2o_s[...],
         _blend(d2o_b[...], d2o_hb[...], bot_live)], axis=0,
    )

    # tails' VJP on the halo-extended slab (ds = ct_d2 * -T/s, s recomputed
    # from the memo; dead windows -> 0 without touching the exp)
    def ds_of(d2, ct_d2):
        live = d2 < jnp.float32(1e29)
        expo = jnp.where(live, (d2 - c) / t, jnp.float32(0.0))
        return jnp.where(live, ct_d2 * (-t) * jnp.exp(expo), jnp.float32(0.0))

    d_in = jnp.sqrt(jnp.maximum(d2i, 0) + e)
    d_out = jnp.sqrt(jnp.maximum(d2o, 0) + e)
    half = jnp.float32(0.5)
    gate_i = jnp.where(d2i > 0, half, jnp.float32(0.0)) / d_in
    gate_o = jnp.where(d2o > 0, half, jnp.float32(0.0)) / d_out
    relu_on = jnp.where(d_in > 1, jnp.float32(1.0), jnp.float32(0.0))
    dss_ref[0:ext, :] = ds_of(d2i, -ct * relu_on * gate_i)
    dss_ref[ext : 2 * ext, :] = ds_of(d2o, ct * gate_o)

    # self-adjoint cols-conv of each field's ds -> dA at strip rows
    wt = wct[...]
    for p in range(rs // 64):
        sl = slice(p * 64, (p + 1) * 64)
        dast_ref[sl, :] = _dot(wt, dss_ref[p * 64 : p * 64 + _WIN, :])
        dast_ref[rs + p * 64 : rs + (p + 1) * 64, :] = _dot(
            wt, dss_ref[ext + p * 64 : ext + p * 64 + _WIN, :]
        )

    # self-adjoint rows-conv (stacked) -> dE, then the occupancy VJP per
    # column block straight into dgray
    sgn = 1.0 if test_above else -1.0
    nb = wid // 64
    wrf_, wrm_, wrl_ = wrf[...], wrm[...], wrl[...]
    for cb in range(nb):
        if cb == 0:
            win = dast_ref[:, 0:_WIN]
            wm = wrf_
        elif cb == nb - 1:
            win = dast_ref[:, wid - _WIN : wid]
            wm = wrl_
        else:
            win = dast_ref[:, cb * 64 - _HK : cb * 64 - _HK + _WIN]
            wm = wrm_
        de = _dot(win, wm)  # (2*rs, 64)
        dei = de[0:rs, :]
        deo = de[rs : 2 * rs, :]
        g = gs[:, cb * 64 : (cb + 1) * 64]
        l = (g - jnp.float32(127.5)) * jnp.float32(sgn / tau)
        ls = -jax.nn.softplus(-l)
        ct1 = c / t
        e_in = jnp.exp(ct1 + ls)
        e_out = jnp.exp(ct1 + ls - l)
        si_m = jax.nn.sigmoid(-l)
        si_p = jax.nn.sigmoid(l)
        dg = (dei * e_in * si_m - deo * e_out * si_p) * jnp.float32(sgn / tau)
        lmask = g > jnp.float32(_DEAD_CUT)
        dgray_ref[:, cb * 64 : (cb + 1) * 64] = jnp.where(
            lmask, dg, jnp.float32(0.0)
        )


def _pick_rs(hgt):
    # NEGATIVE RESULT (r4, on-chip): 512-row strips (halo overhead
    # 12.5 -> 6.25%) run OUT OF VMEM by 316 KB at 4K (128.31M of 128M
    # with limit 112M + Mosaic's own scoped allocations) — 256 stays.
    for rs in (256, 128):
        if hgt % rs == 0 and hgt >= rs:
            return rs
    return None


def mm_fused_ok(hgt, wid, k1, k2) -> bool:
    """Kernel geometry gate (on padded shapes)."""
    return (
        k1 <= _HK
        and k2 <= _HK
        and wid % 128 == 0
        and wid >= 128
        and _pick_rs(hgt) is not None
    )


def _halo_spec(wid, nhalo, rs, side):
    if side == "above":
        index_map = lambda i: (jnp.maximum(i * (rs // _HK) - 1, 0), 0)
    else:
        index_map = lambda i: (jnp.minimum((i + 1) * (rs // _HK), nhalo - 1), 0)
    return pl.BlockSpec((_HK, wid), index_map, memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _weights(k1, k2, temperature, vma):
    ws = (
        _wrow(k1, temperature, 0),
        _wrow(k1, temperature, _HK),
        _wrow(k1, temperature, 2 * _HK),
        _wcolt(k2, temperature),
    )
    if vma:
        ws = tuple(jax.lax.pcast(w, tuple(vma), to="varying") for w in ws)
    return ws


def _sds(shape, vma):
    if vma:
        return jax.ShapeDtypeStruct(shape, jnp.float32, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def _shift_arr(shift, vma):
    s = jnp.reshape(jnp.asarray(shift, jnp.float32), (1,))
    if vma:
        s = jax.lax.pcast(s, tuple(vma), to="varying")
    return s


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def mm_fused_fwd(
    gray_p, ht, hb, shift, k1, k2, tau, temperature, eps, test_above,
    memos=True, interpret=False, vma=None,
):
    """One-kernel forward. gray_p: (hgt, wid) f32, dead pixels = _DEAD.
    ht/hb: (16, wid) rows just above/below (constants unsharded, ppermuted
    neighbour rows sharded). shift: traced scalar (SMEM — cancels exactly
    in the output, so one compiled kernel serves runtime-computed
    shifts). Returns (field, d2_in, d2_out) or field."""
    hgt, wid = gray_p.shape
    rs = _pick_rs(hgt)
    if rs is None or not mm_fused_ok(hgt, wid, k1, k2):
        raise ValueError(f"geometry {gray_p.shape} k=({k1},{k2}) outside kernel gate")
    nstrips = hgt // rs
    nhalo = hgt // _HK
    ws = _weights(k1, k2, temperature, vma)
    kernel = functools.partial(
        _fwd_kernel, nstrips=nstrips, rs=rs, tau=tau, temperature=temperature,
        eps=eps, test_above=test_above, memos=memos,
    )
    ext = rs + 2 * _HK
    n_out = 3 if memos else 1
    out = pl.pallas_call(
        kernel,
        grid=(nstrips,),
        in_specs=[
            _halo_spec(wid, nhalo, rs, "above"),
            pl.BlockSpec((rs, wid), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _halo_spec(wid, nhalo, rs, "below"),
            _const_spec((_HK, wid)),
            _const_spec((_HK, wid)),
            _const_spec((_WIN, 64)),
            _const_spec((_WIN, 64)),
            _const_spec((_WIN, 64)),
            _const_spec((64, _WIN)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((rs, wid), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * n_out,
        out_shape=[_sds((hgt, wid), vma)] * n_out,
        scratch_shapes=[
            pltpu.VMEM((2 * ext, wid), jnp.float32),
            pltpu.VMEM((2 * ext, wid), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(gray_p, gray_p, gray_p, ht, hb, *ws, _shift_arr(shift, vma))
    return out if memos else (out[0], None, None)


@functools.partial(jax.jit, static_argnums=(11, 12, 13, 14, 15, 16, 17, 18))
def mm_fused_bwd(
    ct, d2i, d2o, ct_ht, ct_hb, d2i_ht, d2i_hb, d2o_ht, d2o_hb, gray_p,
    shift, k1, k2, tau, temperature, eps, test_above,
    interpret=False, vma=None,
):
    """One-kernel backward: dgray from the output cotangent and the d2
    memos (+ their exchanged edge rows when sharded)."""
    # gray_p (9) and shift (10) are traced; statics start at k1
    hgt, wid = ct.shape
    rs = _pick_rs(hgt)
    nstrips = hgt // rs
    nhalo = hgt // _HK
    ws = _weights(k1, k2, temperature, vma)
    kernel = functools.partial(
        _bwd_kernel, nstrips=nstrips, rs=rs, tau=tau, temperature=temperature,
        eps=eps, test_above=test_above,
    )
    ext = rs + 2 * _HK
    strip = lambda: pl.BlockSpec((rs, wid), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo3 = lambda: [
        _halo_spec(wid, nhalo, rs, "above"),
        strip(),
        _halo_spec(wid, nhalo, rs, "below"),
    ]
    return pl.pallas_call(
        kernel,
        grid=(nstrips,),
        in_specs=halo3() + halo3() + halo3()
        + [_const_spec((_HK, wid))] * 6
        + [strip()]
        + [
            _const_spec((_WIN, 64)),
            _const_spec((_WIN, 64)),
            _const_spec((_WIN, 64)),
            _const_spec((64, _WIN)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=strip(),
        out_shape=_sds((hgt, wid), vma),
        scratch_shapes=[
            pltpu.VMEM((2 * ext, wid), jnp.float32),
            pltpu.VMEM((2 * rs, wid), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        ct, ct, ct, d2i, d2i, d2i, d2o, d2o, d2o,
        ct_ht, ct_hb, d2i_ht, d2i_hb, d2o_ht, d2o_hb,
        gray_p, *ws, _shift_arr(shift, vma),
    )


def _edge_exchange(x, axis_name, fill_top, fill_bot):
    """(top, bot): the _HK rows just above/below this shard's block, from
    the ring neighbours (``fill_*`` at the global edges). ppermute
    delivers zeros to shards outside the pairs; the where routes those to
    the fill value."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    if n == 1:
        shp = x[:_HK].shape
        return (
            jnp.full(shp, jnp.float32(fill_top)),
            jnp.full(shp, jnp.float32(fill_bot)),
        )
    top = lax.ppermute(
        lax.slice_in_dim(x, x.shape[0] - _HK, x.shape[0], axis=0),
        axis_name, [(s, s + 1) for s in range(n - 1)],
    )
    bot = lax.ppermute(
        lax.slice_in_dim(x, 0, _HK, axis=0),
        axis_name, [(s + 1, s) for s in range(n - 1)],
    )
    top = jnp.where(idx > 0, top, jnp.float32(fill_top))
    bot = jnp.where(idx < n - 1, bot, jnp.float32(fill_bot))
    return top, bot


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _mm_fused(gray_p, ht, hb, shift, k1, k2, tau, temperature, eps, test_above, meta):
    """meta = (y_axis | None, interpret, vma | None) — static. shift is a
    traced scalar whose cotangent is EXACTLY zero (c - T log(e^{c/T} ...)
    cancels c)."""
    y_axis, interpret, vma = meta
    field, _, _ = mm_fused_fwd(
        gray_p, ht, hb, shift, k1, k2, tau, temperature, eps, test_above,
        memos=False, interpret=interpret, vma=vma,
    )
    return field


def _mm_fused_vjp_fwd(gray_p, ht, hb, shift, k1, k2, tau, temperature, eps, test_above, meta):
    y_axis, interpret, vma = meta
    field, d2i, d2o = mm_fused_fwd(
        gray_p, ht, hb, shift, k1, k2, tau, temperature, eps, test_above,
        memos=True, interpret=interpret, vma=vma,
    )
    return field, (gray_p, shift, d2i, d2o)


def _mm_fused_vjp_bwd(k1, k2, tau, temperature, eps, test_above, meta, res, ct):
    gray_p, shift, d2i, d2o = res
    y_axis, interpret, vma = meta
    ct = ct.astype(jnp.float32)
    wid = ct.shape[1]
    if y_axis is None:
        z = jnp.zeros((_HK, wid), jnp.float32)
        p = jnp.full((_HK, wid), jnp.float32(_PAD_H))
        ct_ht = ct_hb = z
        d2i_ht = d2i_hb = d2o_ht = d2o_hb = p
    else:
        # pull the neighbours' edge cotangents/memos: this shard's kernel
        # then produces the COMPLETE dgray for its rows (including
        # contributions that flow through the neighbours' outputs), and
        # the halo inputs take zero cotangent below.
        ct_ht, ct_hb = _edge_exchange(ct, y_axis, 0.0, 0.0)
        d2i_ht, d2i_hb = _edge_exchange(d2i, y_axis, _PAD_H, _PAD_H)
        d2o_ht, d2o_hb = _edge_exchange(d2o, y_axis, _PAD_H, _PAD_H)
    dgray = mm_fused_bwd(
        ct, d2i, d2o, ct_ht, ct_hb, d2i_ht, d2i_hb, d2o_ht, d2o_hb, gray_p,
        shift, k1, k2, tau, temperature, eps, test_above,
        interpret=interpret, vma=vma,
    )
    zh = jnp.zeros((_HK, wid), jnp.float32)
    if vma:
        zh = jax.lax.pcast(zh, tuple(vma), to="varying")
    # shift cotangent: exactly zero (see _mm_fused docstring)
    return dgray, zh, zh, jnp.zeros_like(jnp.asarray(shift, jnp.float32))


_mm_fused.defvjp(_mm_fused_vjp_fwd, _mm_fused_vjp_bwd)


def soft_field_mm_fused(
    gray, band, tau, temperature, eps, test_above=True,
    gray_range=(0.0, 255.0), interpret=False,
):
    """Single-device entry: the whole bounded-range soft SDF as one fused
    Pallas kernel each way. Same math/API as soft_mxu.soft_sdf_field_mxu;
    callers gate with soft_field_mm_ok."""
    from chaq_sdfgen_tpu.ops import soft_mxu as SM

    k1, shift = SM._range_stats(band, tau, temperature, gray_range)
    k2, _ = SM._range_stats(
        band, tau, temperature, gray_range, margin=SM._P2_MARGIN_T * float(temperature)
    )
    h, w = gray.shape
    hp = max(-(-h // 128) * 128, 256)
    wl = -(-max(w, 128) // 128) * 128
    gray_p = jnp.pad(
        gray.astype(jnp.float32), ((0, hp - h), (0, wl - w)),
        constant_values=jnp.float32(_DEAD),
    )
    edge = jnp.full((_HK, wl), jnp.float32(_DEAD))
    field = _mm_fused(
        gray_p, edge, edge, shift, k1, k2, float(tau), float(temperature),
        float(eps), test_above, (None, interpret, None),
    )
    return field[:h, :w]


def soft_field_mm_rt(gray, shift, band, tau, temperature, eps, test_above=True,
                     interpret=False):
    """Fused path with a RUNTIME-computed shift for UNDECLARED-range
    inputs (the trained-image API): tap radius pinned at min(_HK, band)
    — extra taps below the true K are exact contributions of the banded
    sum, and the caller's runtime gate guarantees the needed K fits (see
    softsdf's dispatch). shift is a traced scalar; its cotangent is
    exactly zero."""
    kk = min(_HK, int(band))
    h, w = gray.shape
    hp = max(-(-h // 128) * 128, 256)
    wl = -(-max(w, 128) // 128) * 128
    gray_p = jnp.pad(
        gray.astype(jnp.float32), ((0, hp - h), (0, wl - w)),
        constant_values=jnp.float32(_DEAD),
    )
    edge = jnp.full((_HK, wl), jnp.float32(_DEAD))
    field = _mm_fused(
        gray_p, edge, edge, shift, kk, kk, float(tau), float(temperature),
        float(eps), test_above, (None, interpret, None),
    )
    return field[:h, :w]


def soft_field_mm_rt_ok(shape, band) -> bool:
    """Static geometry gate for the runtime-shift path (k = _HK)."""
    if len(shape) != 2:
        return False
    h, w = shape
    hp = max(-(-h // 128) * 128, 256)
    wl = -(-max(w, 128) // 128) * 128
    kk = min(_HK, int(band))
    return mm_fused_ok(hp, wl, kk, kk)


def soft_field_mm_ok(gray, band, tau, temperature, gray_range) -> bool:
    """Full gate: range stats in gamut AND padded geometry fits."""
    from chaq_sdfgen_tpu.ops import soft_mxu as SM

    if gray_range is None or gray.ndim != 2:
        return False
    if not (isinstance(tau, (int, float)) and isinstance(temperature, (int, float))):
        return False
    s1 = SM._range_stats(band, tau, temperature, gray_range)
    s2 = SM._range_stats(
        band, tau, temperature, gray_range, margin=SM._P2_MARGIN_T * float(temperature)
    )
    if s1 is None or s2 is None:
        return False
    h, w = gray.shape
    hp = max(-(-h // 128) * 128, 256)
    wl = -(-max(w, 128) // 128) * 128
    return mm_fused_ok(hp, wl, s1[0], s2[0])


def sharded_local_mm_fused_2d(
    gray_blk, band, tau, temperature, eps, test_above, gray_range,
    y_axis, x_axis, interpret=False, vma=None,
):
    """2-D ('y','x') tile body: columns are handled by WIDTH EXTENSION —
    a 128-column gray halo rides in from the x neighbours (lane blocks
    must stay 128-aligned, so the halo is 128 wide even though the taps
    only need k1 <= 16), the kernels run on the extended width with the
    dead-sentinel liveness doing the masking, and the halo columns are
    sliced off after. Gradients for the halo columns flow back through
    the exchange's AD transpose (the bwd kernel computes them as the
    cotangent contributions of THIS shard's outputs; the neighbour adds
    its own). Rows use the seam-free explicit-halo path unchanged."""
    from chaq_sdfgen_tpu.ops import soft_mxu as SM
    from chaq_sdfgen_tpu.parallel.halo import exchange_col_halo

    k1, shift = SM._range_stats(band, tau, temperature, gray_range)
    k2, _ = SM._range_stats(
        band, tau, temperature, gray_range, margin=SM._P2_MARGIN_T * float(temperature)
    )
    h, w = gray_blk.shape
    if w % 128 != 0:
        raise ValueError(f"2-D mm tile width {w} must be 128-aligned")
    gx = exchange_col_halo(gray_blk.astype(jnp.float32), 128, x_axis, _DEAD)
    ht, hb = _edge_exchange(gx, y_axis, _DEAD, _DEAD)
    field = _mm_fused(
        gx, ht, hb, shift, k1, k2, float(tau), float(temperature),
        float(eps), test_above, (y_axis, interpret, vma),
    )
    return field[:, 128 : 128 + w]


def sharded_local_mm_fused(
    gray_blk, band, tau, temperature, eps, test_above, gray_range,
    y_axis, w_real, interpret=False, vma=None,
):
    """Shard-local body for parallel/sharded.py: exchanges 16 gray rows
    each way, then the same fused kernels — zero reassembly seams. The
    backward's ct/d2 edge exchange lives inside _mm_fused's VJP."""
    from chaq_sdfgen_tpu.ops import soft_mxu as SM

    k1, shift = SM._range_stats(band, tau, temperature, gray_range)
    k2, _ = SM._range_stats(
        band, tau, temperature, gray_range, margin=SM._P2_MARGIN_T * float(temperature)
    )
    h, w = gray_blk.shape
    wl = -(-max(w, 128) // 128) * 128
    gray_p = jnp.pad(
        gray_blk.astype(jnp.float32), ((0, 0), (0, wl - w)),
        constant_values=jnp.float32(_DEAD),
    )
    ht, hb = _edge_exchange(gray_p, y_axis, _DEAD, _DEAD)
    field = _mm_fused(
        gray_p, ht, hb, shift, k1, k2, float(tau), float(temperature),
        float(eps), test_above, (y_axis, interpret, vma),
    )
    return field[:, :w_real]
