"""Pallas TPU kernel for the banded Gaussian cols-conv on the MXU.

The collapsed-mm soft path (ops/soft_mxu.py) runs its banded convs as
XLA window einsums; each einsum materializes its (rows, nb, blk+2K)
window operand and its output in HBM. This kernel keeps the window
build in VMEM: a row strip rides in with two 16-row halo blocks (the
same-operand-multiple-BlockSpecs trick the fused soft kernels use,
pallas_soft_fused.py), the per-64-row-block window is a STATIC
8-aligned sublane slice of the concatenated strip, and the contraction
runs as one (64, 96) x (96, wid) MXU dot per output block — the 96-row
window pads to one 128-deep pass.

Tap radius is padded to _HK = 16 with zero weights so every window
slice is 16-aligned (Mosaic requires provably 8-aligned sublane
starts); real k > 16 falls back to the XLA einsum (soft_mxu._conv_blk
gates the narrow-window regime identically).

The conv is exactly self-adjoint (symmetric taps, zero boundary), so
soft_mxu's custom VJPs can run this kernel in both directions.

No reference analogue (the soft path is BASELINE config 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HK = 16  # padded tap radius; window = 64 + 2*_HK = 96 rows
_RS = 128  # rows per strip (grid block)


def _weights_t(k, temperature):
    """(64, 96) f32: wT[r, j] = w(j - _HK - r), zero beyond the true k.
    Output row r of a 64-block reads window rows j = r - k .. r + k
    (window row j holds input row 64p - _HK + j for output block p)."""
    r = jnp.arange(64, dtype=jnp.float32)[:, None]
    j = jnp.arange(64 + 2 * _HK, dtype=jnp.float32)[None, :]
    d = j - jnp.float32(_HK) - r
    w = jnp.exp(-(d * d) / jnp.float32(temperature))
    return jnp.where(jnp.abs(d) <= k, w, jnp.float32(0.0))


def _cols_kernel(above_ref, strip_ref, below_ref, wt_ref, out_ref, *, nstrips):
    i = pl.program_id(0)
    top_live = jnp.where(i > 0, jnp.float32(1.0), jnp.float32(0.0))
    bot_live = jnp.where(i < nstrips - 1, jnp.float32(1.0), jnp.float32(0.0))
    xcat = jnp.concatenate(
        [above_ref[...] * top_live, strip_ref[...], below_ref[...] * bot_live],
        axis=0,
    )  # (_HK + _RS + _HK, wid)
    wt = wt_ref[...]
    for p in range(_RS // 64):
        win = xcat[p * 64 : p * 64 + 64 + 2 * _HK, :]  # 16-aligned static
        out_ref[p * 64 : (p + 1) * 64, :] = jax.lax.dot_general(
            wt,
            win,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def _p2f_kernel(
    ai_a, ai_s, ai_b, ao_a, ao_s, ao_b, wt_ref,
    field_ref, d2i_ref, d2o_ref,
    *, nstrips, temperature, shift, eps,
):
    """Fused pass 2 forward: cols-conv BOTH fields + the soft-SDF tails.

    Consumes the two rows-conv outputs (a_in, a_out — each as
    strip + 16-row halo blocks), emits the field and the two d2 memos
    the backward needs. Tail math mirrors soft_mxu.soft_sdf_field_mxu:
      d2 = shift - T log s   (dead windows s <= 1e-30 -> PAD 1e30)
      d  = sqrt(max(d2, 0) + eps)
      field = d_out - max(d_in - 1, 0)
    """
    i = pl.program_id(0)
    top = jnp.where(i > 0, jnp.float32(1.0), jnp.float32(0.0))
    bot = jnp.where(i < nstrips - 1, jnp.float32(1.0), jnp.float32(0.0))
    t = jnp.float32(temperature)
    c = jnp.float32(shift)
    flo = jnp.float32(1e-30)
    pad = jnp.float32(1e30)
    wt = wt_ref[...]
    xcat_i = jnp.concatenate([ai_a[...] * top, ai_s[...], ai_b[...] * bot], axis=0)
    xcat_o = jnp.concatenate([ao_a[...] * top, ao_s[...], ao_b[...] * bot], axis=0)

    def d2_of(xcat, p):
        win = xcat[p * 64 : p * 64 + 64 + 2 * _HK, :]
        s = jax.lax.dot_general(
            wt, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        live = s > flo
        s_safe = jnp.where(live, s, jnp.float32(1.0))
        return jnp.where(live, c - t * jnp.log(s_safe), pad)

    e = jnp.float32(eps)
    for p in range(_RS // 64):
        d2i = d2_of(xcat_i, p)
        d2o = d2_of(xcat_o, p)
        d_in = jnp.sqrt(jnp.maximum(d2i, 0) + e)
        d_out = jnp.sqrt(jnp.maximum(d2o, 0) + e)
        sl = slice(p * 64, (p + 1) * 64)
        field_ref[sl, :] = d_out - jnp.maximum(d_in - jnp.float32(1.0), jnp.float32(0.0))
        d2i_ref[sl, :] = d2i
        d2o_ref[sl, :] = d2o


def _p2b_kernel(
    ct_a, ct_s, ct_b, d2i_a, d2i_s, d2i_b, d2o_a, d2o_s, d2o_b, wt_ref,
    dai_ref, dao_ref,
    *, nstrips, temperature, shift, eps,
):
    """Fused pass 2 backward: tails' VJP (pointwise, from the d2 memos)
    then the self-adjoint cols-conv of each ds — emits da_in, da_out
    for the rows-conv VJP. The pointwise part runs on the full
    halo-extended slab so the conv windows see correct neighbours.

      ds = ct_d2 * (-T / s),  s = exp((shift - d2)/T) recomputed
      ct_d2_out = ct * [d2_out > 0] * 0.5 / d_out
      ct_d2_in = -ct * [d_in > 1] * [d2_in > 0] * 0.5 / d_in
    Dead windows (d2 == PAD) take ds = 0 via double-where — never
    through the exp (the round-2 NaN lesson)."""
    i = pl.program_id(0)
    top = jnp.where(i > 0, jnp.float32(1.0), jnp.float32(0.0))
    bot = jnp.where(i < nstrips - 1, jnp.float32(1.0), jnp.float32(0.0))
    t = jnp.float32(temperature)
    c = jnp.float32(shift)
    e = jnp.float32(eps)
    wt = wt_ref[...]

    ct = jnp.concatenate([ct_a[...] * top, ct_s[...], ct_b[...] * bot], axis=0)
    d2i = jnp.concatenate(
        [d2i_a[...] * top, d2i_s[...], d2i_b[...] * bot], axis=0
    )
    d2o = jnp.concatenate(
        [d2o_a[...] * top, d2o_s[...], d2o_b[...] * bot], axis=0
    )

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
    dsi = ds_of(d2i, -ct * relu_on * gate_i)
    dso = ds_of(d2o, ct * gate_o)

    for p in range(_RS // 64):
        sl = slice(p * 64, (p + 1) * 64)
        win_i = dsi[p * 64 : p * 64 + 64 + 2 * _HK, :]
        win_o = dso[p * 64 : p * 64 + 64 + 2 * _HK, :]
        dai_ref[sl, :] = jax.lax.dot_general(
            wt, win_i, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dao_ref[sl, :] = jax.lax.dot_general(
            wt, win_o, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def _halo_specs(wid, nhalo):
    """(above, strip, below) BlockSpecs for one (hgt, wid) operand."""
    return [
        pl.BlockSpec(
            (_HK, wid),
            lambda i: (jnp.maximum(i * (_RS // _HK) - 1, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((_RS, wid), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (_HK, wid),
            lambda i: (jnp.minimum((i + 1) * (_RS // _HK), nhalo - 1), 0),
            memory_space=pltpu.VMEM,
        ),
    ]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def p2_fused_fwd(a_in, a_out, k, temperature, shift, eps, interpret=False, vma=None):
    """(field, d2_in, d2_out) from the two rows-conv outputs."""
    hgt, wid = a_in.shape
    if not cols_conv_ok(a_in, k):
        raise ValueError(f"shape {a_in.shape} / k {k} outside kernel geometry")
    nstrips = hgt // _RS
    nhalo = hgt // _HK
    wt = _weights_t(k, temperature)
    if vma:
        # inside shard_map the kernel operands must agree on their
        # varying-manual-axes; the constant weights are replicated, so
        # mark them varying over the same axes as the data blocks
        wt = jax.lax.pcast(wt, tuple(vma), to='varying')
    kernel = functools.partial(
        _p2f_kernel, nstrips=nstrips, temperature=temperature, shift=shift, eps=eps
    )
    sds = (
        (lambda s: jax.ShapeDtypeStruct(s, jnp.float32))
        if vma is None
        else (lambda s: jax.ShapeDtypeStruct(s, jnp.float32, vma=frozenset(vma)))
    )
    return pl.pallas_call(
        kernel,
        grid=(nstrips,),
        in_specs=_halo_specs(wid, nhalo) * 2
        + [pl.BlockSpec((64, 64 + 2 * _HK), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((_RS, wid), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[sds((hgt, wid))] * 3,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(a_in, a_in, a_in, a_out, a_out, a_out, wt)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def p2_fused_bwd(ct, d2_in, d2_out, k, temperature, shift, eps, interpret=False, vma=None):
    """(da_in, da_out) — the cotangents of the rows-conv outputs."""
    hgt, wid = ct.shape
    if not cols_conv_ok(ct, k):
        raise ValueError(f"shape {ct.shape} / k {k} outside kernel geometry")
    nstrips = hgt // _RS
    nhalo = hgt // _HK
    wt = _weights_t(k, temperature)
    if vma:
        # inside shard_map the kernel operands must agree on their
        # varying-manual-axes; the constant weights are replicated, so
        # mark them varying over the same axes as the data blocks
        wt = jax.lax.pcast(wt, tuple(vma), to='varying')
    kernel = functools.partial(
        _p2b_kernel, nstrips=nstrips, temperature=temperature, shift=shift, eps=eps
    )
    sds = (
        (lambda s: jax.ShapeDtypeStruct(s, jnp.float32))
        if vma is None
        else (lambda s: jax.ShapeDtypeStruct(s, jnp.float32, vma=frozenset(vma)))
    )
    return pl.pallas_call(
        kernel,
        grid=(nstrips,),
        in_specs=_halo_specs(wid, nhalo) * 3
        + [pl.BlockSpec((64, 64 + 2 * _HK), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((_RS, wid), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 2,
        out_shape=[sds((hgt, wid))] * 2,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(ct, ct, ct, d2_in, d2_in, d2_in, d2_out, d2_out, d2_out, wt)


def cols_conv_ok(e, k):
    """Kernel geometry gate: 2-D, strips divide, taps fit the halo."""
    return (
        e.ndim == 2
        and k <= _HK
        and e.shape[0] % _RS == 0
        and e.shape[1] % 128 == 0
        and e.shape[0] >= _RS
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def cols_conv(e, k, temperature, interpret=False, vma=None):
    """Banded Gaussian conv along axis 0 (zero boundary). Forward only —
    soft_mxu.conv_cols_sym supplies the self-adjoint VJP.

    ``vma``: when called inside jax.shard_map (check_vma=True), the
    frozenset of mesh axis names the block varies over — shard_map
    requires it on the pallas out_shape."""
    hgt, wid = e.shape
    if not cols_conv_ok(e, k):
        raise ValueError(f"shape {e.shape} / k {k} outside kernel geometry")
    nstrips = hgt // _RS
    nhalo = hgt // _HK
    wt = _weights_t(k, temperature)
    if vma:
        # inside shard_map the kernel operands must agree on their
        # varying-manual-axes; the constant weights are replicated, so
        # mark them varying over the same axes as the data blocks
        wt = jax.lax.pcast(wt, tuple(vma), to='varying')
    kernel = functools.partial(_cols_kernel, nstrips=nstrips)
    out_shape = (
        jax.ShapeDtypeStruct((hgt, wid), jnp.float32)
        if vma is None
        else jax.ShapeDtypeStruct((hgt, wid), jnp.float32, vma=frozenset(vma))
    )
    return pl.pallas_call(
        kernel,
        grid=(nstrips,),
        in_specs=[
            # 16-row block just above the strip (clamped at the top edge;
            # the kernel zeroes its contribution there)
            pl.BlockSpec(
                (_HK, wid),
                lambda i: (jnp.maximum(i * (_RS // _HK) - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((_RS, wid), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # 16-row block just below the strip (clamped at the bottom)
            pl.BlockSpec(
                (_HK, wid),
                lambda i: (jnp.minimum((i + 1) * (_RS // _HK), nhalo - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((64, 64 + 2 * _HK), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_RS, wid), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(e, e, e, wt)
