"""Pallas TPU kernel for the BRUTE (OpenCL-parity) pipeline.

The XLA formulation in ops/brute.py is already O(n^2 s) (row-factored
candidate search instead of the reference's O(n^2 s^2) per-pixel probes,
opencl/sdf.cl:79-191), but its lax.scan materializes ~5 full-image arrays
per dy step in HBM. This kernel runs the dy scan entirely in VMEM:

  pass A (Pallas, row_seed_distances_ext): per-row nearest/second-nearest
      seed distances for both polarities via sublane log-jump sweeps,
      clipped to u8 at sentinel = spread + 1 <= 255, emitted as
      sentinel-extended dual-polarity strips (exact-integer parity with
      ops.brute.row_seed_distances, whose lane-direction cummax scans
      cost ~10.9 ms of the 17 ms 4K pipeline).
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

from chaq_sdfgen_tpu.ops.pallas_edt import _is_tpu, _refined_sqrt_inline

_CHUNK = 256
_SEG = 64


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# pass A as a Pallas kernel.
#
# The XLA formulation (brute.row_seed_distances) runs EIGHT lane-direction
# lax.cummax prefix scans (4 per polarity); measured ~10.9 ms of the
# 17 ms 4K pipeline — lane-axis scans relayout on every log step. This
# kernel computes the same eight arrays with SUBLANE log-jump sweeps on
# transposed VMEM blocks (the hard pass-1 pattern, pallas_edt.py), both
# polarities sharing each sweep in a (wp, 2*TM) scratch, and emits
# sentinel-extended u8 strips so the dy-scan kernel needs no XLA pad
# either. Exact-integer semantics identical to brute.row_seed_distances
# (L2 = L1 + gap carried from the nearest seed via a packed max-scan).
# --------------------------------------------------------------------------


def _dir_sweep(dscr, w_rows, down):
    """Directional 1-D chamfer along sublanes over a (w_rows, L) i32
    scratch seeded with 0/inf indicators: d[k] = min over seeds j<=k of
    (k-j) (down=True) or j>=k (down=False). 8-row blocks via log-jump
    shifts + a carried last/first-row vector (see pallas_edt._sweep_scratch
    for the Mosaic constraints this shape works around)."""
    lanes = dscr.shape[1]
    inf = jnp.int32(1 << 20)
    nblk = w_rows // 8
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 0)

    def shift_down(blk, st):
        top = jnp.full((st, lanes), inf, jnp.int32)
        return jnp.concatenate([top, blk[: 8 - st, :]], axis=0)

    def shift_up(blk, st):
        bot = jnp.full((st, lanes), inf, jnp.int32)
        return jnp.concatenate([blk[st:, :], bot], axis=0)

    if down:
        def body(i, carry):
            base = pl.multiple_of(i * 8, 8)
            blk = dscr[pl.ds(base, 8), :]
            for st in (1, 2, 4):
                blk = jnp.minimum(blk, shift_down(blk, st) + jnp.int32(st))
            blk = jnp.minimum(blk, carry + row8 + jnp.int32(1))
            dscr[pl.ds(base, 8), :] = blk
            return blk[7:8, :]
    else:
        def body(i, carry):
            base = pl.multiple_of((nblk - 1 - i) * 8, 8)
            blk = dscr[pl.ds(base, 8), :]
            for st in (1, 2, 4):
                blk = jnp.minimum(blk, shift_up(blk, st) + jnp.int32(st))
            blk = jnp.minimum(blk, carry + (jnp.int32(8) - row8))
            dscr[pl.ds(base, 8), :] = blk
            return blk[0:1, :]

    carry0 = jnp.full((1, lanes), inf, jnp.int32)
    jax.lax.fori_loop(0, nblk, body, carry0)


def _max_sweep(pscr, w_rows, down):
    """Directional running-max along sublanes (the packed nearest-seed
    carry): p[k] = max over j<=k (down) / j>=k (up) of p[j]."""
    lanes = pscr.shape[1]
    ninf = jnp.int32(-(1 << 30))
    nblk = w_rows // 8

    def shift_down(blk, st):
        top = jnp.full((st, lanes), ninf, jnp.int32)
        return jnp.concatenate([top, blk[: 8 - st, :]], axis=0)

    def shift_up(blk, st):
        bot = jnp.full((st, lanes), ninf, jnp.int32)
        return jnp.concatenate([blk[st:, :], bot], axis=0)

    if down:
        def body(i, carry):
            base = pl.multiple_of(i * 8, 8)
            blk = pscr[pl.ds(base, 8), :]
            for st in (1, 2, 4):
                blk = jnp.maximum(blk, shift_down(blk, st))
            blk = jnp.maximum(blk, carry)
            pscr[pl.ds(base, 8), :] = blk
            return blk[7:8, :]
    else:
        def body(i, carry):
            base = pl.multiple_of((nblk - 1 - i) * 8, 8)
            blk = pscr[pl.ds(base, 8), :]
            for st in (1, 2, 4):
                blk = jnp.maximum(blk, shift_up(blk, st))
            blk = jnp.maximum(blk, carry)
            pscr[pl.ds(base, 8), :] = blk
            return blk[0:1, :]

    carry0 = jnp.full((1, lanes), ninf, jnp.int32)
    jax.lax.fori_loop(0, nblk, body, carry0)


def _passa_kernel(
    b_ref, l1_ref, l2_ref, r1_ref, r2_ref, iscr, dscr, pscr,
    *, wp, w_actual, h_real, sent, nb, npad,
):
    """One program per TM-row block (grid nb + 2*npad; the outer npad
    blocks per side write the `sent` sentinel halo). Outputs: the four
    row-distance strips. Both polarities share every sweep: polarity TRUE
    in scratch lanes [0, TM), FALSE in [TM, 2*TM). Each output ref is
    (TM, 2*wp): columns [0, wp) = polarity TRUE, [wp, 2*wp) = FALSE."""
    i = pl.program_id(0)
    tm = l1_ref.shape[0]
    sentinel = jnp.logical_or(i < npad, i >= npad + nb)

    @pl.when(sentinel)
    def _():
        for ref in (l1_ref, l2_ref, r1_ref, r2_ref):
            ref[:, :] = jnp.full(ref.shape, sent, jnp.uint8)

    @pl.when(jnp.logical_not(sentinel))
    def _():
        inf = jnp.int32(1 << 20)
        ninf = jnp.int32(-(1 << 30))
        sentv = jnp.int32(sent)
        gbits = max(int(sent).bit_length(), 1)
        g = jnp.int32(1 << gbits)
        gmask = jnp.int32((1 << gbits) - 1)
        h_mask = jnp.int32(h_real) - (i - npad) * jnp.int32(tm)

        # indicators for both polarities, transposed (x on sublanes)
        for c in range(0, wp, 512):
            cc = min(512, wp - c)
            # u8 transpose before the widen (see pallas_edt._row_pass_body)
            blk = b_ref[:, c : c + cc].T.astype(jnp.int32)  # (cc, TM)
            ys = jax.lax.broadcasted_iota(jnp.int32, (cc, tm), 1)
            valid = ys < h_mask
            if c + cc > w_actual:
                xs = jax.lax.broadcasted_iota(jnp.int32, (cc, tm), 0) + jnp.int32(c)
                valid = jnp.logical_and(valid, xs < jnp.int32(w_actual))
            # tri-state liveness (the hard-path trick, pallas_edt.
            # _row_pass_body): 1 seeds TRUE, 0 seeds FALSE, any other
            # code (the x-sharded tier's beyond-image column fill 2)
            # seeds NEITHER — single-chip bool inputs are 0/1 so this
            # is the same predicate there.
            seed_t = jnp.logical_and(blk == 1, valid)
            seed_f = jnp.logical_and(blk == 0, valid)
            iscr[c : c + cc, 0:tm] = jnp.where(seed_t, jnp.int32(0), inf)
            iscr[c : c + cc, tm : 2 * tm] = jnp.where(seed_f, jnp.int32(0), inf)

        def emit(ref):
            """write dscr (clipped distances) as u8, transposed back:
            TRUE lanes -> ref[:, 0:wp], FALSE lanes -> ref[:, wp:2*wp]."""
            for c in range(0, wp, 512):
                cc = min(512, wp - c)
                d = jnp.minimum(dscr[c : c + cc, :], sentv)
                ref[:, c : c + cc] = d[:, 0:tm].T.astype(jnp.uint8)
                ref[:, wp + c : wp + c + cc] = d[:, tm : 2 * tm].T.astype(jnp.uint8)

        def second_pass(down):
            """pscr <- packed (x*G + gap) at seeds, max-swept; then
            dscr <- min(d1 + carried gap, sent) (sent where no carry)."""
            for c in range(0, wp, 512):
                cc = min(512, wp - c)
                d1 = dscr[c : c + cc, :]
                # gap at seed x = distance from x to the previous seed in
                # scan order = d1[x -+ 1] + 1 (sent-clipped; sent at the
                # scan edge). The +-1-shifted d1 rows cross the 512-chunk
                # boundary: read them via a direct (possibly unaligned)
                # scratch slice instead of re-shifting in-register.
                if down:
                    if c == 0:
                        prev = jnp.concatenate(
                            [jnp.full((1, 2 * tm), inf, jnp.int32), dscr[0 : cc - 1, :]],
                            axis=0,
                        )
                    else:
                        prev = dscr[c - 1 : c - 1 + cc, :]
                else:
                    if c + cc == wp:
                        prev = jnp.concatenate(
                            [dscr[c + 1 : c + cc, :], jnp.full((1, 2 * tm), inf, jnp.int32)],
                            axis=0,
                        )
                    else:
                        prev = dscr[c + 1 : c + 1 + cc, :]
                gap = jnp.minimum(prev + jnp.int32(1), sentv)
                xs = jax.lax.broadcasted_iota(jnp.int32, (cc, 2 * tm), 0) + jnp.int32(c)
                key = xs if down else (jnp.int32(wp) - xs)
                pack = jnp.where(
                    iscr[c : c + cc, :] == 0, key * g + gap, ninf
                )
                pscr[c : c + cc, :] = pack
            _max_sweep(pscr, wp, down)
            for c in range(0, wp, 512):
                cc = min(512, wp - c)
                carried = pscr[c : c + cc, :]
                d2nd = jnp.minimum(
                    dscr[c : c + cc, :] + jnp.bitwise_and(carried, gmask), sentv
                )
                dscr[c : c + cc, :] = jnp.where(carried >= 0, d2nd, sentv)

        # ---- L side (scan toward +x: seeds at-or-left) ----
        for c in range(0, wp, 512):
            cc = min(512, wp - c)
            dscr[c : c + cc, :] = iscr[c : c + cc, :]
        _dir_sweep(dscr, wp, down=True)
        emit(l1_ref)
        second_pass(down=True)
        emit(l2_ref)

        # ---- R side (scan toward -x: seeds at-or-right) ----
        for c in range(0, wp, 512):
            cc = min(512, wp - c)
            dscr[c : c + cc, :] = iscr[c : c + cc, :]
        _dir_sweep(dscr, wp, down=False)
        emit(r1_ref)
        second_pass(down=False)
        emit(r2_ref)


def row_seed_distances_ext(
    b: jnp.ndarray, spread: int, interpret: bool | None = None
):
    """Pallas pass A for BOTH polarities: (H, W) bool -> four u8 arrays
    (l1, l2, r1, r2), each ((nb + 2*npad)*TM, 2*Wp) with polarity TRUE in
    columns [0, Wp) and FALSE in [Wp, 2*Wp); image row y lives at strip
    row row_off + y; rows/columns outside the image read `sent`.
    Returns (l1, l2, r1, r2, row_off, wp). Exact-integer parity with
    brute.row_seed_distances (sentinel = spread + 1)."""
    if interpret is None:
        interpret = not _is_tpu()
    h, w = b.shape
    sent = spread + 1
    wp = _round_up(w, 128)
    tm = 128
    hpa = _round_up(h, tm)
    nb = hpa // tm
    npad = -(-spread // tm)
    b_p = jnp.pad(b.astype(jnp.uint8), ((0, hpa - h), (0, wp - w)))
    kern = functools.partial(
        _passa_kernel, wp=wp, w_actual=w, h_real=h, sent=sent, nb=nb, npad=npad
    )
    nbt = nb + 2 * npad
    outs = pl.pallas_call(
        kern,
        grid=(nbt,),
        in_specs=[
            pl.BlockSpec(
                (tm, wp),
                lambda i: (jnp.clip(i - npad, 0, nb - 1), 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[
            pl.BlockSpec((tm, 2 * wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbt * tm, 2 * wp), jnp.uint8) for _ in range(4)
        ],
        scratch_shapes=[
            pltpu.VMEM((wp, 2 * tm), jnp.int32),
            pltpu.VMEM((wp, 2 * tm), jnp.int32),
            pltpu.VMEM((wp, 2 * tm), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(b_p)
    l1, l2, r1, r2 = outs
    return l1, l2, r1, r2, npad * tm, wp


def _brute_kernel(
    b_ref, l1t, l2t, r1t, r2t, l1f, l2f, r1f, r2f, out_ref,
    scr_refs_and_scalars,
    *, spread, h, asymmetric, invert, row_off,
):
    hext = l1t.shape[0]
    regions_t = [(l1t, l2t, r1t, r2t, 0, 0, hext)]
    regions_f = [(l1f, l2f, r1f, r2f, 0, 0, hext)]
    _brute_kernel_impl(
        b_ref, regions_t, regions_f, out_ref, scr_refs_and_scalars,
        spread=spread, h=h, asymmetric=asymmetric, invert=invert,
        row_off=row_off, hext=hext,
    )


def _brute_kernel_impl(
    b_ref, regions_t, regions_f, out_ref, scr_refs_and_scalars,
    *, spread, h, asymmetric, invert, row_off, hext,
):
    """Shared dy-scan body. regions_t/_f: per polarity, a list of
    (l1, l2, r1, r2, src_off, dst_off, nrows) fill regions — one
    whole-strip region for the single-chip form; local + explicit
    up/down halo operands for the sharded seam-free form (the
    fused_pass2_bytes_halo design). All offsets are 8-aligned."""
    (sv1t, sv2t, sv3t, sv1f, sv2f, sv3f,
     acc_ref, dtmp_ref, seg_ref, sm_ref) = scr_refs_and_scalars
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
        (sv1t, sv2t, sv3t, regions_t),
        (sv1f, sv2f, sv3f, regions_f),
    )
    for v1d, v2d, v3d, regions in quads:
        for l1s, l2s, r1s, r2s, src0, dst0, nrows in regions:
            for r in range(0, nrows, 512):
                rc = min(512, nrows - r)
                a1 = l1s[src0 + r : src0 + r + rc, :].astype(jnp.int32)
                a2 = l2s[src0 + r : src0 + r + rc, :].astype(jnp.int32)
                b1 = r1s[src0 + r : src0 + r + rc, :].astype(jnp.int32)
                b2 = r2s[src0 + r : src0 + r + rc, :].astype(jnp.int32)
                v1d[dst0 + r : dst0 + r + rc, :] = jnp.minimum(a1, b1).astype(jnp.float32)
                hi1 = jnp.maximum(a1, b1)
                lo2 = jnp.minimum(a2, b2)
                v2d[dst0 + r : dst0 + r + rc, :] = jnp.minimum(hi1, lo2).astype(jnp.float32)
                v3d[dst0 + r : dst0 + r + rc, :] = jnp.maximum(hi1, lo2).astype(jnp.float32)

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
                rr = r + row_off + sgn * a
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
                win_min(seg0, r + row_off - ahi, r + row_off - alo + rc),
                win_min(seg0, r + row_off + alo, r + row_off + ahi + rc),
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
    hp = _round_up(h, 8)

    # pass A: Pallas sublane-sweep kernel, sentinel-extended dual-polarity
    # strips (the XLA cummax formulation cost ~10.9 ms of the 17 ms 4K
    # pipeline; see row_seed_distances_ext)
    l1, l2, r1, r2, row_off, wp = row_seed_distances_ext(b, spread, interpret)
    if wp % tn != 0:
        tn = 128  # wp is always a multiple of 128
    hext = l1.shape[0]
    nwt = wp // tn
    b_p = jnp.pad(b.astype(jnp.uint8), ((0, hp - h), (0, wp - w)))

    nseg = (hext + _SEG - 1) // _SEG
    kern = functools.partial(
        _brute_kernel_entry, spread=spread, h=hp, asymmetric=asymmetric,
        invert=invert, row_off=row_off,
    )
    # each dual-polarity strip feeds the kernel twice: column block j for
    # polarity TRUE, block j + nwt for FALSE
    spec_t = pl.BlockSpec((hext, tn), lambda j: (0, j), memory_space=pltpu.VMEM)
    spec_f = pl.BlockSpec((hext, tn), lambda j: (0, j + nwt), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(nwt,),
        in_specs=[pl.BlockSpec((hp, tn), lambda j: (0, j), memory_space=pltpu.VMEM)]
        + [spec_t, spec_t, spec_t, spec_t, spec_f, spec_f, spec_f, spec_f],
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
    )(b_p, l1, l2, r1, r2, l1, l2, r1, r2)
    return out[:h, :w]


def _brute_kernel_entry(
    b_ref, l1t, l2t, r1t, r2t, l1f, l2f, r1f, r2f, out_ref, *scr, **kw
):
    _brute_kernel(
        b_ref, l1t, l2t, r1t, r2t, l1f, l2f, r1f, r2f, out_ref, scr, **kw
    )


# in_specs order note: the kernel's (l1t..r2t, l1f..r2f) args map to the
# dual-polarity strips passed twice with column-shifted index maps.


def _brute_kernel_halo_entry(
    b_ref,
    l1t, l2t, r1t, r2t, l1f, l2f, r1f, r2f,                      # local strips
    ul1t, ul2t, ur1t, ur2t, ul1f, ul2f, ur1f, ur2f,              # up halos
    dl1t, dl2t, dr1t, dr2t, dl1f, dl2f, dr1f, dr2f,              # down halos
    out_ref, *scr, spread, h, asymmetric, invert, loc_off, hr,
):
    """Sharded seam-free brute kernel: local pass-A strips plus explicit
    (hr, TN) up/down halo operands (ppermute-received neighbour edge rows,
    parallel/halo.exchange_row_halo_parts) — assembled directly in the
    sv* scratch, no XLA concat of the extended strips. loc_off: strip row
    of local image row 0 inside the local strip refs."""
    h_loc = h
    hext = h_loc + 2 * hr
    regions_t = [
        (ul1t, ul2t, ur1t, ur2t, 0, 0, hr),
        (l1t, l2t, r1t, r2t, loc_off, hr, h_loc),
        (dl1t, dl2t, dr1t, dr2t, 0, hr + h_loc, hr),
    ]
    regions_f = [
        (ul1f, ul2f, ur1f, ur2f, 0, 0, hr),
        (l1f, l2f, r1f, r2f, loc_off, hr, h_loc),
        (dl1f, dl2f, dr1f, dr2f, 0, hr + h_loc, hr),
    ]
    _brute_kernel_impl(
        b_ref, regions_t, regions_f, out_ref, scr,
        spread=spread, h=h, asymmetric=asymmetric, invert=invert,
        row_off=hr, hext=hext,
    )


def brute_sdf_bytes_pallas_halo(
    b_blk: jnp.ndarray,
    strips,           # (l1, l2, r1, r2) dual-polarity local strips
    halos_up,         # (l1, l2, r1, r2) up halos, each (hr, 2*wp)
    halos_dn,         # (l1, l2, r1, r2) down halos
    loc_off: int,
    wp: int,
    spread: int,
    asymmetric: bool = False,
    invert: bool = False,
    interpret: bool | None = None,
    tn: int = 128,
) -> jnp.ndarray:
    """Sharded BRUTE pass 2 with halo operands. b_blk: (H_loc, W) bool
    (H_loc an 8-multiple); strips from row_seed_distances_ext on the
    local block; halos from exchange_row_halo_parts over the strips' real
    rows with hr = roundup(spread, 8) rows and `spread + 1` fill.
    Byte-identical to the single-chip kernel: the assembled scratch rows
    hold exactly the values the whole-image strip holds there (pass A is
    row-local; edge shards read the sentinel like the single-chip
    boundary blocks). Reference analogue: the 2-D NDRange decomposition,
    opencl/main.cpp:798."""
    if interpret is None:
        interpret = not _is_tpu()
    h_loc, w = b_blk.shape
    hr = halos_up[0].shape[0]
    if h_loc % 8 != 0 or hr % 8 != 0 or hr < spread:
        raise ValueError(
            f"brute halo kernel needs 8-aligned H_loc ({h_loc}) and "
            f"hr ({hr}) >= spread ({spread})"
        )
    hext = h_loc + 2 * hr
    hstrip = strips[0].shape[0]
    nwt = wp // tn
    b_p = jnp.pad(b_blk.astype(jnp.uint8), ((0, 0), (0, wp - w)))

    nseg = (hext + _SEG - 1) // _SEG
    kern = functools.partial(
        _brute_kernel_halo_entry, spread=spread, h=h_loc,
        asymmetric=asymmetric, invert=invert, loc_off=loc_off, hr=hr,
    )
    spec_lt = pl.BlockSpec((hstrip, tn), lambda j: (0, j), memory_space=pltpu.VMEM)
    spec_lf = pl.BlockSpec((hstrip, tn), lambda j: (0, j + nwt), memory_space=pltpu.VMEM)
    spec_ht = pl.BlockSpec((hr, tn), lambda j: (0, j), memory_space=pltpu.VMEM)
    spec_hf = pl.BlockSpec((hr, tn), lambda j: (0, j + nwt), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(nwt,),
        in_specs=[pl.BlockSpec((h_loc, tn), lambda j: (0, j), memory_space=pltpu.VMEM)]
        + [spec_lt] * 4 + [spec_lf] * 4
        + [spec_ht] * 4 + [spec_hf] * 4
        + [spec_ht] * 4 + [spec_hf] * 4,
        out_specs=pl.BlockSpec((h_loc, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_loc, wp), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((hext, tn), jnp.float32) for _ in range(6)]
        + [
            pltpu.VMEM((_CHUNK, tn), jnp.float32),
            pltpu.VMEM((_CHUNK, tn), jnp.float32),
            pltpu.SMEM((2 * nseg,), jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(
        b_p,
        *strips, *strips,
        *halos_up, *halos_up,
        *halos_dn, *halos_dn,
    )
    return out[:, :w]
