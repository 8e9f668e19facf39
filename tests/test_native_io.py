"""Native C++ codec (native/sdfio): cross-checked against PIL on random
images for every supported format, including the stb luminance conversion."""

import io

import numpy as np
import pytest
from PIL import Image

from chaq_sdfgen_tpu.utils import sdfio_native
from chaq_sdfgen_tpu.utils.imageio import decode_gray_alpha

pytestmark = pytest.mark.skipif(
    not sdfio_native.available(), reason="native codec not built"
)


def _pil_bytes(arr, mode, fmt):
    im = Image.fromarray(arr, mode)
    buf = io.BytesIO()
    im.save(buf, format=fmt)
    return buf.getvalue()


@pytest.mark.parametrize("mode", ["L", "LA", "RGB", "RGBA"])
def test_png_decode_matches_reference_semantics(mode):
    rng = np.random.default_rng(hash(mode) % 2**31)
    ch = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
    arr = (rng.random((13, 17, ch)) * 255).astype(np.uint8).squeeze()
    data = _pil_bytes(arr, mode, "PNG")
    got = sdfio_native.decode_gray_alpha(data)
    assert got is not None, "native decoder refused valid PNG"
    if mode == "L":
        np.testing.assert_array_equal(got[..., 0], arr)
        assert (got[..., 1] == 255).all()
    elif mode == "LA":
        np.testing.assert_array_equal(got, arr)
    else:
        r, g, b = (arr[..., i].astype(int) for i in range(3))
        want = ((r * 77 + g * 150 + 29 * b) >> 8).astype(np.uint8)
        np.testing.assert_array_equal(got[..., 0], want)
        if mode == "RGBA":
            np.testing.assert_array_equal(got[..., 1], arr[..., 3])


def test_png_roundtrip_native():
    rng = np.random.default_rng(0)
    img = (rng.random((31, 45)) * 255).astype(np.uint8)
    data = sdfio_native.encode_gray(img, "png")
    assert data is not None
    # our own decoder
    back = sdfio_native.decode_gray_alpha(data)
    np.testing.assert_array_equal(back[..., 0], img)
    # and PIL agrees
    pil = np.asarray(Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(pil, img)


@pytest.mark.parametrize("fmt", ["bmp", "tga"])
def test_bmp_tga_roundtrip(fmt):
    rng = np.random.default_rng(1)
    img = (rng.random((22, 37)) * 255).astype(np.uint8)
    data = sdfio_native.encode_gray(img, fmt)
    assert data is not None
    back = sdfio_native.decode_gray_alpha(data)
    np.testing.assert_array_equal(back[..., 0], img)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    np.testing.assert_array_equal(pil, img)


def test_bmp_decode_pil_written():
    rng = np.random.default_rng(2)
    arr = (rng.random((9, 14, 3)) * 255).astype(np.uint8)
    data = _pil_bytes(arr, "RGB", "BMP")
    got = sdfio_native.decode_gray_alpha(data)
    assert got is not None
    r, g, b = (arr[..., i].astype(int) for i in range(3))
    want = ((r * 77 + g * 150 + 29 * b) >> 8).astype(np.uint8)
    np.testing.assert_array_equal(got[..., 0], want)


def test_sample_input_native_equals_pil():
    with open("/root/reference/image/sample_input.png", "rb") as f:
        data = f.read()
    native = sdfio_native.decode_gray_alpha(data)
    full = decode_gray_alpha(data)  # same path used by the pipeline
    if native is not None:
        np.testing.assert_array_equal(native, full)


def test_unsupported_falls_back():
    assert sdfio_native.decode_gray_alpha(b"\xff\xd8\xff\xe0 jpeg-ish") is None
