"""CLI + image I/O: end-to-end golden run, flag handling, filetype
resolution, stdin/stdout streaming."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from chaq_sdfgen_tpu.cli import main
from chaq_sdfgen_tpu.utils import imageio as iio

SAMPLE = "/root/reference/image/sample_input.png"
GOLDEN = "/root/reference/image/sample_output.png"


def test_cli_golden_end_to_end(tmp_path, sample_golden):
    out = tmp_path / "out.png"
    rc = main(["-i", SAMPLE, "-o", str(out), "-s", "100", "-a", "-l"])
    assert rc == 0
    got = np.asarray(Image.open(out))
    np.testing.assert_array_equal(got, sample_golden)


def test_cli_combined_short_flags(tmp_path, sample_golden):
    out = tmp_path / "out2.png"
    rc = main(["-i", SAMPLE, "-o", str(out), "-s", "100", "-al"])
    assert rc == 0
    got = np.asarray(Image.open(out))
    np.testing.assert_array_equal(got, sample_golden)


def test_cli_validation_errors(tmp_path):
    assert main(["-i", SAMPLE, "-s", "10"]) == 1  # no output
    assert main(["-o", str(tmp_path / "x.png")]) == 1  # no input
    assert main(["-i", SAMPLE, "-o", "x.png", "-q", "0"]) == 1
    assert main(["-i", SAMPLE, "-o", "x.png", "-q", "101"]) == 1
    assert main(["-i", SAMPLE, "-o", "x.png", "-s", "0"]) == 1
    assert main(["-i", "/nonexistent.png", "-o", "x.png"]) == 1


def test_cli_algorithms_agree(tmp_path):
    outs = {}
    for algo in ("exact", "jfa"):
        out = tmp_path / f"{algo}.png"
        rc = main(["-i", SAMPLE, "-o", str(out), "-s", "16", "-l", "--algorithm", algo])
        assert rc == 0
        outs[algo] = np.asarray(Image.open(out)).astype(int)
    diff = np.abs(outs["exact"] - outs["jfa"])
    assert (diff == 0).mean() > 0.995


def test_filetype_resolution():
    assert iio.deduce_filetype("x.png") == "png"
    assert iio.deduce_filetype("x.bmp") == "bmp"
    # strncmp(ext, "jpg", 3) does NOT match "jpeg" -> png fallback
    # (openmp/sdfgen.c:108-115); the OpenCL-style resolver does match it
    assert iio.deduce_filetype("x.jpeg") == "png"
    assert iio.deduce_filetype("x.jpg") == "jpg"
    assert iio.deduce_filetype("x.tga") == "tga"
    assert iio.deduce_filetype("noext") == "png"
    assert iio.deduce_filetype("x.webp") == "png"  # unknown -> png fallback
    assert iio.deduce_filetype("x.png", explicit="bmp") == "bmp"
    assert iio.filetype_from_str_opencl("JPEG") == "jpg"
    assert iio.filetype_from_str_opencl("something.tga") == "tga"
    assert iio.filetype_from_str_opencl("???") == "png"


@pytest.mark.parametrize("ft", ["png", "bmp", "tga", "jpg"])
def test_write_read_roundtrip(tmp_path, ft):
    rng = np.random.default_rng(0)
    img = (rng.random((20, 30)) * 255).astype(np.uint8)
    path = tmp_path / f"img.{ft}"
    iio.write_gray(img, str(path), quality=100)
    back = iio.load_gray_alpha(str(path))
    assert back.shape == (20, 30, 2)
    if ft != "jpg":  # jpeg is lossy
        np.testing.assert_array_equal(back[..., 0], img)


def test_rgba_luminance_matches_stb_formula(tmp_path):
    rng = np.random.default_rng(1)
    rgba = (rng.random((8, 8, 4)) * 255).astype(np.uint8)
    p = tmp_path / "c.png"
    Image.fromarray(rgba, "RGBA").save(p)
    out = iio.load_gray_alpha(str(p))
    r, g, b = rgba[..., 0].astype(int), rgba[..., 1].astype(int), rgba[..., 2].astype(int)
    want = ((r * 77 + g * 150 + 29 * b) >> 8).astype(np.uint8)
    np.testing.assert_array_equal(out[..., 0], want)
    np.testing.assert_array_equal(out[..., 1], rgba[..., 3])


def test_stdout_streaming(tmp_path, sample_golden, monkeypatch, capsysbinary):
    rc = main(["-i", SAMPLE, "-o", "-", "-s", "100", "-al"])
    assert rc == 0
    data = capsysbinary.readouterr().out
    got = np.asarray(Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(got, sample_golden)


def test_cli_list_platforms(capsys):
    assert main(["--list-platforms"]) == 0
    assert capsys.readouterr().out.strip()


def test_cli_platform_selection(tmp_path, sample_golden, capsys):
    # select by case-insensitive name substring (opencl/main.cpp:493-538)
    out = tmp_path / "plat.png"
    rc = main(["-i", SAMPLE, "-o", str(out), "-s", "100", "-al", "--platform", "CP"])
    assert rc == 0
    np.testing.assert_array_equal(np.asarray(Image.open(out)), sample_golden)
    # no-match -> reference error message + failure exit
    assert main(["-i", SAMPLE, "-o", str(out), "--platform", "vulkan"]) == 1
    assert "Platform specified not found." in capsys.readouterr().err
    # --list-devices honors the selected platform
    assert main(["--platform", "cpu", "--list-devices"]) == 0
    listing = capsys.readouterr().out
    assert listing.strip() and "cpu" in listing.lower()


def test_cli_time_flag_reports_kernel_seconds(tmp_path, capsys):
    out = tmp_path / "timed.png"
    rc = main(["-i", SAMPLE, "-o", str(out), "-s", "16", "-l", "--time"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "Kernel timing:" in err and "sec" in err


def test_cli_device_selection(tmp_path, sample_golden):
    out = tmp_path / "dev.png"
    rc = main(["-i", SAMPLE, "-o", str(out), "-s", "100", "-al", "--device", "0"])
    assert rc == 0
    np.testing.assert_array_equal(np.asarray(Image.open(out)), sample_golden)
    assert main(["-i", SAMPLE, "-o", str(out), "--device", "99"]) == 1
    assert main(["-i", SAMPLE, "-o", str(out), "--device", "nonexistent-kind"]) == 1


def test_cli_two_channel_output(tmp_path):
    out = tmp_path / "la.png"
    rc = main(["-i", SAMPLE, "-o", str(out), "-s", "16", "-l", "--algorithm", "brute",
               "--two-channel"])
    assert rc == 0
    im = Image.open(out)
    assert im.mode == "LA"
    arr = np.asarray(im)
    assert (arr[..., 1] == 255).all()
