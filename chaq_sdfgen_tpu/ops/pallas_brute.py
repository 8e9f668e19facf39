"""Pallas TPU kernel for the BRUTE (OpenCL-parity) pipeline.

The XLA formulation in ops/brute.py is already O(n^2 s) (row-factored
candidate search instead of the reference's O(n^2 s^2) per-pixel probes,
opencl/sdf.cl:79-191), but its lax.scan materializes ~5 full-image arrays
per dy step in HBM. This kernel runs the dy scan entirely in VMEM:

  pass A (XLA): per-row nearest/second-nearest seed distances for both
      polarities (ops.brute.row_seed_distances), clipped to u8 at
      sentinel = spread + 1 <= 255.
  kernel: per column strip, the eight u8 row-distance strips are widened
      once into i32 VMEM scratch; each output chunk then scans |dy| in
      8-tap groups from the center outward with the same provable skip
      bound as the hard EXACT kernel (segment minima of min(l1, r1):
      a group whose dymin^2 + min_dx^2 cannot beat the chunk's current
      worst pixel is elided — the TPU-native analogue of the reference
      search's bound shrinking, opencl/sdf.cl:66-69). The OpenCL sign /
      fallback / remap tail (opencl/sdf.cl:206-223) is fused in, so HBM
      traffic is 8 u8 strips in + 1 u8 image out.

Byte-identical to ops.brute.brute_sdf_bytes (and therefore to the
reference kernel): the diagonal-exclusion quirk (|dx| == |dy| candidates
skipped, strictly v < u at opencl/sdf.cl:131-183) is applied per tap, and
d^2 stays exact (integer dx, f32 accumulate of values < 2^24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chaq_sdfgen_tpu.ops import brute as brute_xla
from chaq_sdfgen_tpu.ops.pallas_edt import _is_tpu, _refined_sqrt_inline

_CHUNK = 256
_SEG = 64


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _brute_kernel(
    b_ref, l1t, l2t, r1t, r2t, l1f, l2f, r1f, r2f, out_ref,
    scr_refs_and_scalars,
    *, spread, h, asymmetric, invert,
):
    (sv1t, sv2t, sv3t, sv1f, sv2f, sv3f,
     acc_ref, dtmp_ref, seg_ref, sm_ref) = scr_refs_and_scalars
    hext = l1t.shape[0]
    tn = out_ref.shape[1]
    sent = spread + 1
    nseg = (hext + _SEG - 1) // _SEG

    # Sorted-candidate prologue: per polarity, merge the presorted side
    # pairs (l1 <= l2, r1 <= r2) into the three smallest row distances
    # v1 <= v2 <= v3 (f32 — kills the per-tap int->float converts; u8 VMEM
    # tiles are (32, 128) so bytes can't be tap-sliced directly anyway).
    # The per-tap diagonal exclusion then needs only 3 strips and
    # 2 cmp + 2 sel instead of 4 strips and the per-side select chain:
    #   min over {l1!=a?l1:l2, r1!=a?r1:r2}
    #     == v1 if v1!=a else (v2 if v2!=a else v3)
    # (proof: per side at most the FIRST distance can equal a, since
    # l2 = l1 + gap > l1 unless both are the sentinel > spread >= a; the
    # three cases l1,r1 != a / exactly one == a / both == a reduce to the
    # merge values above).
    quads = (
        (sv1t, sv2t, sv3t, l1t, l2t, r1t, r2t),
        (sv1f, sv2f, sv3f, l1f, l2f, r1f, r2f),
    )
    for v1d, v2d, v3d, l1s, l2s, r1s, r2s in quads:
        for r in range(0, hext, 512):
            rc = min(512, hext - r)
            a1 = l1s[r : r + rc, :].astype(jnp.int32)
            a2 = l2s[r : r + rc, :].astype(jnp.int32)
            b1 = r1s[r : r + rc, :].astype(jnp.int32)
            b2 = r2s[r : r + rc, :].astype(jnp.int32)
            v1d[r : r + rc, :] = jnp.minimum(a1, b1).astype(jnp.float32)
            hi1 = jnp.maximum(a1, b1)
            lo2 = jnp.minimum(a2, b2)
            v2d[r : r + rc, :] = jnp.minimum(hi1, lo2).astype(jnp.float32)
            v3d[r : r + rc, :] = jnp.maximum(hi1, lo2).astype(jnp.float32)

    # skip-bound tables: per-segment minima of v1, one per polarity
    for s in range(nseg):
        lo, hi = s * _SEG, min((s + 1) * _SEG, hext)
        seg_ref[s] = jnp.min(sv1t[lo:hi, :])
        seg_ref[nseg + s] = jnp.min(sv1f[lo:hi, :])

    def win_min(seg0, lo_row, hi_row):
        lo_s = max(lo_row, 0) // _SEG
        hi_s = (min(hi_row, hext) + _SEG - 1) // _SEG
        m = seg_ref[seg0 + lo_s]
        for s in range(lo_s + 1, hi_s):
            m = jnp.minimum(m, seg_ref[seg0 + s])
        return m

    n_groups = spread // 8 + 1

    def scan_polarity(sv1, sv2, sv3, seg0, r, rc):
        """min d^2 to this polarity's seed set over the triangle candidate
        set, for output rows [r, r+rc)."""

        def probe(a, acc):
            # tap pair dy = +-a reading ext rows r + spread -+ a
            av = jnp.float32(a)
            d2a = None
            for sgn in ((0,) if a == 0 else (-1, 1)):
                rr = r + spread + sgn * a
                tv1 = sv1[rr : rr + rc, :]
                tv2 = sv2[rr : rr + rc, :]
                tv3 = sv3[rr : rr + rc, :]
                # diagonal exclusion: |dx| == |dy| candidates skipped
                dx = jnp.where(tv1 != av, tv1, jnp.where(tv2 != av, tv2, tv3))
                d2 = dx * dx + jnp.float32(a * a)
                d2a = d2 if d2a is None else jnp.minimum(d2a, d2)
            return d2a if acc is None else jnp.minimum(acc, d2a)

        # center group: a = 0..8 unconditionally
        acc = None
        for a in range(0, min(8, spread) + 1):
            acc = probe(a, acc)
        acc_ref[0:rc, :] = acc
        sm_ref[0] = jnp.max(acc)

        for g in range(1, n_groups):
            alo = 8 * g + 1
            ahi = min(8 * (g + 1), spread)
            if alo > spread:
                break
            wmin = jnp.minimum(
                win_min(seg0, r + spread - ahi, r + spread - alo + rc),
                win_min(seg0, r + spread + alo, r + spread + ahi + rc),
            )
            lb = jnp.float32(alo * alo) + wmin * wmin

            @pl.when(lb < sm_ref[0])
            def _():
                a2 = acc_ref[0:rc, :]
                for a in range(alo, ahi + 1):
                    a2 = probe(a, a2)
                acc_ref[0:rc, :] = a2
                sm_ref[0] = jnp.max(a2)

        return acc_ref[0:rc, :]

    src_min = jnp.float32(0.0) if asymmetric else jnp.float32(-float(spread))
    src_max = jnp.float32(float(spread))
    bigf = jnp.float32(2 * spread + 4)
    for r in range(0, h, _CHUNK):
        rc = min(_CHUNK, h - r)
        # candidates are the OPPOSITE polarity of the center pixel
        dtmp_ref[0:rc, :] = scan_polarity(sv1t, sv2t, sv3t, 0, r, rc)
        d2f = scan_polarity(sv1f, sv2f, sv3f, nseg, r, rc)
        d2t = dtmp_ref[0:rc, :]
        # widen before comparing: v5e Mosaic can't compare u8 vectors
        bv = b_ref[r : r + rc, :].astype(jnp.int32) > jnp.int32(0)
        d2 = jnp.where(bv, d2f, d2t)
        found = d2 <= jnp.float32(spread * spread)
        d = _refined_sqrt_inline(d2)
        # OpenCL tail (opencl/sdf.cl:206-223): decider = invert ^ val.
        # invert is static, and the sign select is arithmetic: a
        # jnp.where with an i1 VECTOR cond and two SCALAR branches makes
        # Mosaic relayout the cond into the scalars' replicated layout
        # ("non-singleton dim replicated in destination") and fail.
        decider_f = (jnp.logical_not(bv) if invert else bv).astype(jnp.float32)
        sign = jnp.float32(2.0) * decider_f - jnp.float32(1.0)
        # decider ? d : -(d - 1)  ==  sign*d + (1 - decider)
        signed = sign * d + (jnp.float32(1.0) - decider_f)
        fallback = sign * bigf
        dist = jnp.where(found, signed, fallback)
        v = jnp.minimum(dist, src_max)
        v = jnp.maximum(v, src_min)
        remap = ((v - src_min) * jnp.float32(255.0)) / (src_max - src_min) + jnp.float32(0.0)
        out_ref[r : r + rc, :] = remap.astype(jnp.int32).astype(jnp.uint8)


def brute_sdf_bytes_pallas(
    b: jnp.ndarray,
    spread: int,
    asymmetric: bool = False,
    invert: bool = False,
    interpret: bool | None = None,
    tn: int = 128,
) -> jnp.ndarray:
    """BRUTE pipeline with the dy scan fused in VMEM. b: (..., H, W) bool ->
    (..., H, W) uint8, byte-identical to ops.brute.brute_sdf_bytes.
    Requires spread <= 254 (u8 sentinel range)."""
    if spread + 1 > 255:
        raise ValueError(f"pallas brute needs spread <= 254, got {spread}")
    if interpret is None:
        interpret = not _is_tpu()
    if b.ndim > 2:
        fn = functools.partial(
            brute_sdf_bytes_pallas, spread=spread, asymmetric=asymmetric,
            invert=invert, interpret=interpret, tn=tn,
        )
        for _ in range(b.ndim - 2):
            fn = jax.vmap(fn)
        return fn(b)

    h, w = b.shape
    sent = spread + 1
    hp = _round_up(h, 8)
    wp = _round_up(w, tn)

    rows_t = brute_xla.row_seed_distances(b, sent)
    rows_f = brute_xla.row_seed_distances(jnp.logical_not(b), sent)
    hext = _round_up(hp + 2 * spread + 8, 8)

    def prep(arr):
        # rows: spread sentinel rows above, sentinel fill below to hext;
        # pad columns (no pixels there) also read as sentinel
        a = arr.astype(jnp.uint8)
        return jnp.pad(
            a,
            ((spread, hext - h - spread), (0, wp - w)),
            constant_values=jnp.uint8(sent),
        )

    strips = [prep(a) for a in (*rows_t, *rows_f)]
    b_p = jnp.pad(b.astype(jnp.uint8), ((0, hp - h), (0, wp - w)))

    nseg = (hext + _SEG - 1) // _SEG
    kern = functools.partial(
        _brute_kernel_entry, spread=spread, h=hp, asymmetric=asymmetric, invert=invert
    )
    out = pl.pallas_call(
        kern,
        grid=(wp // tn,),
        in_specs=[pl.BlockSpec((hp, tn), lambda j: (0, j), memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec((hext, tn), lambda j: (0, j), memory_space=pltpu.VMEM)
            for _ in range(8)
        ],
        out_specs=pl.BlockSpec((hp, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((hext, tn), jnp.float32) for _ in range(6)]
        + [
            pltpu.VMEM((_CHUNK, tn), jnp.float32),
            pltpu.VMEM((_CHUNK, tn), jnp.float32),
            pltpu.SMEM((2 * nseg,), jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(b_p, *strips)
    return out[:h, :w]


def _brute_kernel_entry(
    b_ref, l1t, l2t, r1t, r2t, l1f, l2f, r1f, r2f, out_ref, *scr, **kw
):
    _brute_kernel(
        b_ref, l1t, l2t, r1t, r2t, l1f, l2f, r1f, r2f, out_ref, scr, **kw
    )
