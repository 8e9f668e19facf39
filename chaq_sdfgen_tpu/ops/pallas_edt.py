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


_ROW_CHUNK = 512  # rows processed per inner step: bounds live temporaries


def _fused_kernel(gin_ref, gout_ref, out_ref, *, band, h, spread, asymmetric):
    """gin/gout: (H + 2B, TN) row-distance^2 strips; out: (H, TN) uint8.

    The strip stays VMEM-resident for the whole program; compute walks it
    in _ROW_CHUNK-row chunks so the ~8 live elementwise temporaries are
    (chunk, TN)-sized, not (H, TN)-sized (full-height temporaries blow the
    16 MB scoped-vmem budget at H = 4096)."""

    def band_min(ref, r, rc):
        acc = ref[r : r + rc, :] + jnp.float32(band * band)
        for k in range(1, 2 * band + 1):
            dy = k - band
            acc = jnp.minimum(acc, ref[r + k : r + k + rc, :] + jnp.float32(dy * dy))
        return acc

    s_min = jnp.float32(0.0) if asymmetric else jnp.float32(-float(spread))
    s_max = jnp.float32(float(spread))
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


def _pick_tn(h: int, band: int, w: int) -> int:
    """Largest lane-tile (multiple of 128) such that two double-buffered
    input strips + the output block stay within ~12 MB of VMEM."""
    budget = 12 * 1024 * 1024
    per_lane = (h + 2 * band) * 4 * 2 * 2 + h * 1 * 2  # 2 fields x 2 buffers + u8 out
    tn = budget // max(per_lane, 1)
    tn = min(tn, w, 2048)
    tn = (tn // 128) * 128
    return max(tn, 128)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("spread", "asymmetric", "band", "interpret")
)
def fused_sdf_bytes(
    b: jnp.ndarray,
    spread: int,
    asymmetric: bool = False,
    band: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Hard EXACT pipeline, Pallas-fused pass 2. b: (..., H, W) bool ->
    (..., H, W) uint8, byte-identical to the OpenMP reference (see
    ops/edt.py for the banding argument)."""
    band = band if band is not None else spread + 2
    if interpret is None:
        interpret = not _is_tpu()

    if b.ndim > 2:
        fn = functools.partial(
            fused_sdf_bytes, spread=spread, asymmetric=asymmetric, band=band, interpret=interpret
        )
        for _ in range(b.ndim - 2):
            fn = jax.vmap(fn)
        return fn(b)

    h, w = b.shape
    if h <= 1:
        # reference single-row quirk path (no pass-2 sqrt) — tiny, XLA
        from chaq_sdfgen_tpu.ops import merge

        d_in, d_out = edt.dual_edt_banded(b, band)
        return merge.remap_to_byte(merge.signed_merge(d_out, d_in), spread, asymmetric)

    big = jnp.float32(edt.big_sentinel(band))
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)

    g_in = edt.row_nearest_sq(b, band)
    g_out = edt.row_nearest_sq(jnp.logical_not(b), band)
    pad = ((band, band + (hp - h)), (0, wp - w))
    g_in = jnp.pad(g_in, pad, constant_values=big)
    g_out = jnp.pad(g_out, pad, constant_values=big)

    tn = _pick_tn(hp, band, wp)
    wp2 = _round_up(wp, tn)
    if wp2 != wp:
        g_in = jnp.pad(g_in, ((0, 0), (0, wp2 - wp)), constant_values=big)
        g_out = jnp.pad(g_out, ((0, 0), (0, wp2 - wp)), constant_values=big)
        wp = wp2

    kern = functools.partial(
        _fused_kernel, band=band, h=hp, spread=spread, asymmetric=asymmetric
    )
    out = pl.pallas_call(
        kern,
        grid=(wp // tn,),
        in_specs=[
            pl.BlockSpec((hp + 2 * band, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp + 2 * band, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hp, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.uint8),
        interpret=interpret,
    )(g_in, g_out)
    return out[:h, :w]
