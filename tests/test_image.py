"""Image IO round-trip tests (coverage model: src/tests/imageio.cpp)."""

import numpy as np

from pbrt_v3_iile_tpu.utils import image as imglib


def test_pfm_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 10, (17, 23, 3)).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    imglib.write_pfm(p, img)
    back = imglib.read_pfm(p)
    assert np.allclose(img, back)


def test_pfm_gray_roundtrip(tmp_path):
    img = np.random.default_rng(1).uniform(0, 2, (9, 11)).astype(np.float32)
    p = str(tmp_path / "g.pfm")
    imglib.write_pfm(p, img)
    assert np.allclose(img, imglib.read_pfm(p))


def test_exr_roundtrip(tmp_path):
    img = np.random.default_rng(2).uniform(0, 100, (13, 19, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    imglib.write_exr(p, img)
    back = imglib.read_exr(p)
    assert np.allclose(img, back)


def test_png_writes(tmp_path):
    img = np.random.default_rng(3).uniform(0, 1, (8, 8, 3))
    p = str(tmp_path / "t.png")
    imglib.write_png_tonemapped(p, img)
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_gamma_correct():
    assert abs(imglib.gamma_correct(np.array(1.0)) - 1.0) < 1e-5
    assert imglib.gamma_correct(np.array(0.0)) == 0.0
