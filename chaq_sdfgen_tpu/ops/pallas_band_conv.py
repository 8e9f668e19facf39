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
    )(e, e, e, wt)
