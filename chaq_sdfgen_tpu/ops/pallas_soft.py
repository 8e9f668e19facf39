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

Used by ops.softsdf.band_softmin_ext when running on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_CHUNK = 256


def _softmin_fwd_kernel(gext_ref, out_ref, *, band, h, temperature):
    """gext: (H+2B, TN) f32; out: (H, TN) f32."""
    inv_t = jnp.float32(1.0 / temperature)
    t = jnp.float32(temperature)
    for r in range(0, h, _ROW_CHUNK):
        rc = min(_ROW_CHUNK, h - r)
        m = gext_ref[r : r + rc, :] + jnp.float32(band * band)
        for k in range(1, 2 * band + 1):
            dy = k - band
            m = jnp.minimum(m, gext_ref[r + k : r + k + rc, :] + jnp.float32(dy * dy))
        acc = jnp.zeros((rc, out_ref.shape[1]), jnp.float32)
        for k in range(0, 2 * band + 1):
            dy = k - band
            tk = gext_ref[r + k : r + k + rc, :] + jnp.float32(dy * dy)
            acc = acc + jnp.exp((m - tk) * inv_t)
        out_ref[r : r + rc, :] = m - t * jnp.log(acc)


def _softmin_bwd_kernel(gext_hbm, spad_hbm, ctpad_hbm, dg_ref, gv, sv, cv, sem, *, band, hext, temperature):
    """Manual-DMA variant (three big strips exceed the auto-pipelined VMEM
    budget): gext (H+2B, TN), spad/ctpad (H+4B, TN) in HBM; dg out (H+2B, TN).
    dg[p] = sum_{k=0..2B} exp((S[p-k+2B..] - (k-B)^2 - g[p])/T) * ct[...]."""
    j = pl.program_id(0)
    tn = dg_ref.shape[1]
    c1 = pltpu.make_async_copy(gext_hbm.at[:, pl.ds(j * tn, tn)], gv, sem.at[0])
    c2 = pltpu.make_async_copy(spad_hbm.at[:, pl.ds(j * tn, tn)], sv, sem.at[1])
    c3 = pltpu.make_async_copy(ctpad_hbm.at[:, pl.ds(j * tn, tn)], cv, sem.at[2])
    c1.start(); c2.start(); c3.start()
    c1.wait(); c2.wait(); c3.wait()
    inv_t = jnp.float32(1.0 / temperature)
    for r in range(0, hext, _ROW_CHUNK):
        rc = min(_ROW_CHUNK, hext - r)
        g = gv[r : r + rc, :]
        acc = jnp.zeros((rc, tn), jnp.float32)
        for k in range(0, 2 * band + 1):
            dy = k - band
            # source row q = p - k; Spad[q + 2B] = Spad[p + (2B - k)]
            st = sv[r + (2 * band - k) : r + (2 * band - k) + rc, :]
            ct = cv[r + (2 * band - k) : r + (2 * band - k) + rc, :]
            w = jnp.exp((st - jnp.float32(dy * dy) - g) * inv_t)
            acc = acc + w * ct
        dg_ref[r : r + rc, :] = acc


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_NEG_HUGE = -3.0e38


def softmin_col_fwd(gext: jnp.ndarray, band: int, temperature: float, interpret: bool) -> jnp.ndarray:
    """(H+2B, W) f32 -> (H, W) f32 soft band-min along axis 0."""
    hext, w = gext.shape
    h = hext - 2 * band
    wp = _round_up(w, 128)
    if wp != w:
        gext = jnp.pad(gext, ((0, 0), (0, wp - w)), constant_values=1e30)
    tn = _pick_tn_fwd(h, band, wp)
    wp2 = _round_up(wp, tn)
    if wp2 != wp:
        gext = jnp.pad(gext, ((0, 0), (0, wp2 - wp)), constant_values=1e30)
        wp = wp2
    kern = functools.partial(_softmin_fwd_kernel, band=band, h=h, temperature=temperature)
    out = pl.pallas_call(
        kern,
        grid=(wp // tn,),
        in_specs=[pl.BlockSpec((hext, tn), lambda j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((h, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, wp), jnp.float32),
        interpret=interpret,
    )(gext)
    return out[:, :w]


def softmin_col_bwd(
    gext: jnp.ndarray, s: jnp.ndarray, ct: jnp.ndarray, band: int, temperature: float, interpret: bool
) -> jnp.ndarray:
    """Gradient wrt gext. gext: (H+2B, W); s, ct: (H, W)."""
    hext, w = gext.shape
    wp = _round_up(w, 128)
    spad = jnp.pad(s, ((2 * band, 2 * band), (0, wp - w)), constant_values=_NEG_HUGE)
    ctpad = jnp.pad(ct, ((2 * band, 2 * band), (0, wp - w)), constant_values=0.0)
    if wp != w:
        gext = jnp.pad(gext, ((0, 0), (0, wp - w)), constant_values=1e30)
    tn = 128
    wp2 = _round_up(wp, tn)
    if wp2 != wp:
        gext = jnp.pad(gext, ((0, 0), (0, wp2 - wp)), constant_values=1e30)
        spad = jnp.pad(spad, ((0, 0), (0, wp2 - wp)), constant_values=_NEG_HUGE)
        ctpad = jnp.pad(ctpad, ((0, 0), (0, wp2 - wp)), constant_values=0.0)
        wp = wp2
    kern = functools.partial(_softmin_bwd_kernel, band=band, hext=hext, temperature=temperature)
    out = pl.pallas_call(
        kern,
        grid=(wp // tn,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((hext, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hext, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hext, tn), jnp.float32),
            pltpu.VMEM((hext + 2 * band, tn), jnp.float32),
            pltpu.VMEM((hext + 2 * band, tn), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(gext, spad, ctpad)
    return out[:, :w]


def _pick_tn_fwd(h: int, band: int, w: int) -> int:
    budget = 11 * 1024 * 1024
    per_lane = (h + 2 * band) * 4 * 2 + h * 4 * 2  # in + out, double-buffered
    tn = budget // max(per_lane, 1)
    tn = min(tn, w, 1024)
    tn = (tn // 128) * 128
    return max(tn, 128)
