"""Pure-NumPy oracle transcribing the reference chaq-sdfgen semantics.

Every function documents the reference location it mirrors
(paths relative to /root/reference):

- threshold          -> openmp/sdfgen.c:52-62   (transform_img_to_bool)
- indicator          -> openmp/sdfgen.c:65-72   (transform_bool_to_float)
- FH 1-D/2-D EDT     -> openmp/df.c:9-136       (dist_transform_1d/_axis/_2d)
- signed merge       -> openmp/sdfgen.c:98-106  (transform_float_sub)
- byte remap         -> openmp/sdfgen.c:75-96   (transform_float_to_byte)
- OpenCL kernel      -> opencl/sdf.cl:193-224   (kernel sdf + search_triangle)

All float arithmetic is float32 in the same operation order as the C code so
that results are bit-for-bit comparable. This module is the *test oracle*; it
is intentionally loop-heavy and slow.
"""

from __future__ import annotations

import numpy as np

_F32 = np.float32
_INF = np.float32(np.inf)


# ---------------------------------------------------------------------------
# L4: image loading helpers (stb_image parity: force gray+alpha, 2 channels)
# ---------------------------------------------------------------------------

def load_image_gray_alpha(path_or_file) -> np.ndarray:
    """Load an image as (H, W, 2) uint8 gray+alpha, mirroring
    ``stbi_load(..., channels=2)`` (openmp/sdfgen.c:246-258).

    stb converts RGB to luminance with ``(r*77 + g*150 + 29*b) >> 8``
    (stb_image's stb__compute_y); alpha defaults to 255 when absent.
    """
    from PIL import Image

    im = Image.open(path_or_file)
    if im.mode in ("1", "L"):
        gray = np.asarray(im.convert("L"), dtype=np.uint8)
        alpha = np.full_like(gray, 255)
    elif im.mode == "LA":
        arr = np.asarray(im, dtype=np.uint8)
        gray, alpha = arr[..., 0], arr[..., 1]
    else:
        arr = np.asarray(im.convert("RGBA"), dtype=np.uint16)
        r, g, b, a = (arr[..., i] for i in range(4))
        gray = ((r * 77 + g * 150 + 29 * b) >> 8).astype(np.uint8)
        alpha = a.astype(np.uint8)
    return np.stack([gray, alpha], axis=-1)


# ---------------------------------------------------------------------------
# L3: pixel transforms
# ---------------------------------------------------------------------------

def img_to_bool(img2ch: np.ndarray, channel: int = 1, test_above: bool = True) -> np.ndarray:
    """Threshold: pixel > 127 (or < 127 when inverted) on the chosen channel.

    Mirrors transform_img_to_bool (openmp/sdfgen.c:52-62): ``channel`` is the
    byte offset into the 2-channel interleaved buffer — 1 selects alpha
    (default), 0 selects luminance (the ``-l`` flag).
    """
    chan = img2ch[..., channel]
    return (chan > 127) if test_above else (chan < 127)


def bool_to_indicator(b: np.ndarray, true_is_zero: bool) -> np.ndarray:
    """bool -> {0, +inf} float32 parabola heights.

    Mirrors transform_bool_to_float (openmp/sdfgen.c:65-72).
    """
    return np.where(b == true_is_zero, _F32(0.0), _INF).astype(_F32)


def signed_merge(outside: np.ndarray, inside: np.ndarray) -> np.ndarray:
    """outside -= (inside > 0 ? inside - 1 : inside), elementwise float32.

    Mirrors transform_float_sub (openmp/sdfgen.c:98-106). The -1 bias places
    the zero level set on the shape boundary pixels rather than one pixel out.
    """
    outside = outside.astype(_F32)
    inside = inside.astype(_F32)
    biased = np.where(inside > 0, inside + _F32(-1.0), inside)
    return (outside - biased).astype(_F32)


def float_to_byte(vals: np.ndarray, spread: int, asymmetric: bool) -> np.ndarray:
    """Clamped linear remap [s_min, spread] -> [0, 255], truncating u8 cast.

    Mirrors transform_float_to_byte (openmp/sdfgen.c:75-96) including the
    exact float32 operation order ``(((v - s_min) * nd) / sn) + d_min``.
    """
    v = vals.astype(_F32)
    s_min = _F32(0.0) if asymmetric else _F32(-float(spread))
    s_max = _F32(float(spread))
    sn = s_max - s_min
    nd = _F32(255.0) - _F32(0.0)
    v = np.minimum(v, s_max)
    v = np.maximum(v, s_min)
    remap = ((v - s_min) * nd) / sn + _F32(0.0)
    # C truncating cast; values are in [0, 255] after the clamp.
    return remap.astype(np.uint8)


# ---------------------------------------------------------------------------
# L2: exact Felzenszwalb–Huttenlocher EDT (openmp/df.c)
# ---------------------------------------------------------------------------

def _parabola_intersect(f: np.ndarray, p: int, q: int) -> np.float32:
    """Intersection abscissa of parabolas rooted at p and q (df.c:9-15)."""
    p1_x = _F32(p)
    p2_x = _F32(q)
    p1_y = f[p]
    p2_y = f[q]
    return _F32(((p2_y - p1_y) + (p2_x * p2_x - p1_x * p1_x)) / (_F32(2.0) * (p2_x - p1_x)))


def felzenszwalb_edt_1d(
    img_row: np.ndarray, y: int, img_tpose_out: np.ndarray, do_sqrt: bool, n_rows: int | None = None
) -> None:
    """One row of the FH lower-envelope distance transform, output transposed.

    Direct transcription of dist_transform_1d (openmp/df.c:29-97):
    ``img_tpose_out`` is the flat transposed buffer; the entry for column q of
    row y goes to index ``y + n_rows*q``. Two deliberate deviations from the
    reference, both latent bugs there:
    - df.c:41 reads ``img_row[offset]`` before checking ``offset < w`` (OOB
      read on all-inf rows); the bound is checked first here.
    - df.c:92 uses stride ``w`` (row length) instead of the number of rows for
      the transposed writeback, which garbles/overflows for non-square images;
      the correct stride ``n_rows`` is used here (identical for square).
    """
    f = img_row.astype(_F32)
    w = f.shape[0]
    if n_rows is None:
        n_rows = w
    if w <= 1:
        img_tpose_out[y] = f[0]
        return

    offset = 0
    while offset < w and np.isinf(f[offset]):
        offset += 1
    if offset == w:
        for i in range(w):
            img_tpose_out[y + n_rows * i] = _INF
        return

    v = np.zeros(w, dtype=np.int64)
    h = np.zeros(w, dtype=_F32)
    z = np.zeros(max(w - 1, 1), dtype=_F32)
    v[0] = offset
    h[0] = f[offset]

    k = 0
    for q in range(offset + 1, w):
        if np.isinf(f[q]):
            continue
        s = _parabola_intersect(f, int(v[k]), q)
        while k > 0 and s <= z[k - 1]:
            k -= 1
            s = _parabola_intersect(f, int(v[k]), q)
        z[k] = s
        k += 1
        v[k] = q
        h[k] = f[q]

    j = 0
    for q in range(w):
        while j < k and z[j] < _F32(q):
            j += 1
        displacement = _F32(q) - _F32(v[j])
        val = displacement * displacement + h[j]
        if do_sqrt:
            val = np.sqrt(val, dtype=_F32)
        img_tpose_out[y + n_rows * q] = val


def felzenszwalb_edt_2d(img: np.ndarray) -> np.ndarray:
    """Exact 2-D EDT of a {0, +inf} indicator field (dist_transform_2d,
    openmp/df.c:125-136): row pass (no sqrt, transposed writeback), then
    column pass (sqrt)."""
    img = img.astype(_F32)
    h_, w_ = img.shape
    tpose = np.empty(w_ * h_, dtype=_F32)
    for y in range(h_):
        felzenszwalb_edt_1d(img[y], y, tpose, do_sqrt=False, n_rows=h_)
    tpose = tpose.reshape(w_, h_)
    out = np.empty(h_ * w_, dtype=_F32)
    for y in range(w_):
        felzenszwalb_edt_1d(tpose[y], y, out, do_sqrt=True, n_rows=w_)
    return out.reshape(h_, w_)


# ---------------------------------------------------------------------------
# End-to-end OpenMP-binary pipeline (openmp/sdfgen.c:122-352)
# ---------------------------------------------------------------------------

def sdf_pipeline_openmp(
    img2ch: np.ndarray,
    spread: int = 64,
    asymmetric: bool = False,
    channel: int = 1,
    test_above: bool = True,
) -> np.ndarray:
    """Full reference pipeline: threshold -> dual EDT -> merge -> remap.

    Returns the (H, W) uint8 SDF bitmap, byte-identical to the chaq_sdfgen
    OpenMP binary (openmp/sdfgen.c main, lines 122-352).
    """
    b = img_to_bool(img2ch, channel=channel, test_above=test_above)
    inside = felzenszwalb_edt_2d(bool_to_indicator(b, True))
    outside = felzenszwalb_edt_2d(bool_to_indicator(b, False))
    merged = signed_merge(outside, inside)
    return float_to_byte(merged, spread, asymmetric)


# ---------------------------------------------------------------------------
# OpenCL-binary pipeline (opencl/sdf.cl kernel semantics)
# ---------------------------------------------------------------------------

def _triangle_candidate_offsets(spread: int) -> np.ndarray:
    """Offsets probed by search_triangle (opencl/sdf.cl:79-191).

    The 'triangle' search probes, for ring radius u = 1..spread, the four
    axis pixels (±u, 0), (0, ±u) and the eight off-diagonal pixels
    (±u, ±v), (±v, ±u) for 1 <= v < u with u² + v² <= spread².  Exact
    diagonals |dx| == |dy| are therefore NEVER probed — a quirk of the
    reference kernel that this oracle reproduces faithfully.
    """
    offs = []
    for u in range(1, spread + 1):
        if u * u > spread * spread:
            break
        offs.append((u, 0))
        offs.append((-u, 0))
        offs.append((0, u))
        offs.append((0, -u))
        for vv in range(1, u):
            if u * u + vv * vv > spread * spread:
                break
            for dx, dy in ((u, vv), (u, -vv), (-u, vv), (-u, -vv),
                           (vv, u), (vv, -u), (-vv, u), (-vv, -u)):
                offs.append((dx, dy))
    return np.array(sorted(set(offs)), dtype=np.int64)


def opencl_nearest_d2(b: np.ndarray, spread: int) -> np.ndarray:
    """Per-pixel min squared distance to an opposite-valued pixel within the
    triangle-search candidate set; -1 where no candidate found.

    Value-equivalent to search_triangle (opencl/sdf.cl:79-191): the early
    exits there only change *which* equal-distance candidate is returned,
    never the distance. Out-of-image probes are skipped (the reference's
    one-past-the-edge read at sdf.cl:110-111 is undefined behaviour and is
    not reproduced).
    """
    h_, w_ = b.shape
    best = np.full((h_, w_), -1, dtype=np.int64)
    offs = _triangle_candidate_offsets(spread)
    d2s = offs[:, 0] ** 2 + offs[:, 1] ** 2
    order = np.argsort(d2s, kind="stable")
    for oi in order:
        dx, dy = offs[oi]
        d2 = int(d2s[oi])
        # candidate value at (x+dx, y+dy)
        ys0, ys1 = max(0, -dy), min(h_, h_ - dy)
        xs0, xs1 = max(0, -dx), min(w_, w_ - dx)
        if ys0 >= ys1 or xs0 >= xs1:
            continue
        sub = np.s_[ys0:ys1, xs0:xs1]
        cand = b[ys0 + dy:ys1 + dy, xs0 + dx:xs1 + dx]
        hit = (cand != b[sub]) & (best[sub] < 0)
        best[sub] = np.where(hit, d2, best[sub])
    return best


def sdf_pipeline_opencl(
    img2ch: np.ndarray,
    spread: int = 64,
    asymmetric: bool = False,
    use_luminance: bool = False,
    invert: bool = False,
) -> np.ndarray:
    """Full OpenCL kernel pipeline (opencl/sdf.cl:193-224).

    Threshold is always ``> 127`` (sdf.cl:2-7); ``invert`` flips the sign
    decider (sdf.cl:208), not the threshold. Returns (H, W) uint8 (the gray
    channel of the reference's gray+alpha output).
    """
    channel = 0 if use_luminance else 1
    b = img_to_bool(img2ch, channel=channel, test_above=True)
    d2 = opencl_nearest_d2(b, spread)
    found = d2 >= 0
    d = np.sqrt(np.maximum(d2, 0).astype(_F32), dtype=_F32)
    decider = np.logical_xor(invert, b)
    dist = np.where(
        found,
        np.where(decider, d, -(d + _F32(-1.0))),
        np.where(decider, _INF, -_INF),
    ).astype(_F32)
    src_min = _F32(0.0) if asymmetric else _F32(-float(spread))
    src_max = _F32(float(spread))
    v = np.minimum(dist, src_max)
    v = np.maximum(v, src_min)
    sn = src_max - src_min
    nd = _F32(255.0)
    remap = ((v - src_min) * nd) / sn + _F32(0.0)
    return remap.astype(np.uint32).astype(np.uint8)
