"""Spectral subsystem tests (ref: src/tests/spectrum.cpp + the
FromRGB/FromSampled semantics of src/core/spectrum.cpp)."""

import os

import numpy as np
import pytest

from pbrt_v3_iile_tpu.utils import spectrum as sp


def test_constant_spectrum_has_unit_luminance():
    s = sp.SampledSpectrum(np.ones(sp.N_SPECTRAL_SAMPLES))
    assert abs(s.y() - 1.0) < 5e-3
    xyz = s.to_xyz()
    # equal-energy spectrum is near the equal-energy whitepoint
    assert np.allclose(xyz, 1.0, atol=0.01)


def test_cie_curves_shape():
    x, y, z = sp.cie_xyz_curves(np.array([450.0, 550.0, 600.0]))
    # y peaks near 555nm; z dominates at 450; x has a red lobe at 600
    assert z[0] > x[0] > y[0] * 0.3
    assert y[1] > 0.9
    assert x[2] > y[2] * 0.9
    assert 100.0 < sp.CIE_Y_INTEGRAL < 115.0


@pytest.mark.parametrize("rgb", [
    (1.0, 1.0, 1.0), (0.2, 0.5, 0.8), (0.9, 0.1, 0.05),
    (0.0, 0.7, 0.2), (0.5, 0.5, 0.0), (0.0, 0.0, 0.0),
])
def test_rgb_spectrum_roundtrip(rgb):
    """from_rgb -> to_rgb is near-identity (the property the reference's
    Smits tables are constructed for, spectrum.cpp:229+)."""
    for kind in ("reflectance", "illuminant"):
        back = sp.SampledSpectrum.from_rgb(rgb, kind).to_rgb()
        assert np.allclose(back, rgb, atol=0.02), (kind, rgb, back)


def test_from_rgb_nonnegative_and_smooth():
    s = sp.SampledSpectrum.from_rgb((0.3, 0.6, 0.1)).c
    assert (s >= 0).all()
    # smoothness: second differences are small vs the signal
    d2 = np.abs(np.diff(s, 2)).max()
    assert d2 < 0.2 * max(s.max(), 1e-9)


def test_from_sampled_bucket_average():
    # step SPD: 0 below 550nm, 1 above -> mean over visible ~0.5
    lam = np.array([400.0, 549.9, 550.1, 700.0])
    vals = np.array([0.0, 0.0, 1.0, 1.0])
    s = sp.SampledSpectrum.from_sampled(lam, vals)
    assert abs(s.c.mean() - 0.5) < 0.02
    # constant extension outside the sampled range
    s2 = sp.SampledSpectrum.from_sampled([500.0, 600.0], [2.0, 2.0])
    assert np.allclose(s2.c, 2.0)


def test_average_spectrum_samples_unsorted_input():
    lam = np.array([700.0, 400.0, 550.0])
    vals = np.array([3.0, 1.0, 2.0])
    # piecewise-linear through sorted pairs -> average = 2 over full range
    avg = sp.average_spectrum_samples(lam, vals, np.array([400.0]),
                                      np.array([700.0]))
    assert abs(avg[0] - 2.0) < 1e-6


def test_blackbody_planck_behavior():
    # Wien: 6500K peaks in the visible; hotter shifts blue
    rgb_hot = sp.blackbody_rgb(12000.0)
    rgb_warm = sp.blackbody_rgb(2500.0)
    assert rgb_warm[0] > rgb_warm[2]           # warm is red-heavy
    assert rgb_hot[2] / rgb_hot[0] > rgb_warm[2] / rgb_warm[0]
    # normalized=True: peak bucket value == scale
    s = sp.SampledSpectrum.blackbody(5500.0, 2.0)
    assert s.c.max() <= 2.0 + 1e-6
    assert s.c.max() > 1.5  # 5500K peaks inside the visible range


def test_spectrum_arithmetic():
    a = sp.SampledSpectrum.from_rgb((0.5, 0.5, 0.5))
    b = sp.SampledSpectrum.from_rgb((0.25, 0.25, 0.25))
    assert np.allclose((a + b - b).c, a.c)
    assert np.allclose((a * 2.0 / 2.0).c, a.c)
    assert np.allclose(a.sqrt().pow(2.0).c, a.c, atol=1e-9)
    assert not a.is_black()
    assert sp.SampledSpectrum(np.zeros(sp.N_SPECTRAL_SAMPLES)).is_black()
    assert np.allclose(a.lerp(b, 0.0).c, a.c)


def test_batched_spectra():
    rgbs = np.array([[0.1, 0.2, 0.3], [0.9, 0.5, 0.1]])
    s = sp.SampledSpectrum.from_rgb(rgbs)
    assert s.c.shape == (2, sp.N_SPECTRAL_SAMPLES)
    assert np.allclose(s.to_rgb(), rgbs, atol=0.02)


def test_spd_file_and_pairs(tmp_path):
    p = tmp_path / "test.spd"
    p.write_text("# comment\n400 0.2\n500 0.2\n# mid\n600 0.8\n700 0.8\n")
    rgb = sp.spd_file_to_rgb(str(p))
    assert rgb.shape == (3,)
    assert rgb[0] > rgb[2]  # red-heavy SPD
    rgb2 = sp.spd_pairs_to_rgb([400, 0.2, 500, 0.2, 600, 0.8, 700, 0.8])
    assert np.allclose(rgb, rgb2)


def test_paramset_spectrum_types(tmp_path):
    from pbrt_v3_iile_tpu.scene.paramset import ParamSet

    ps = ParamSet()
    ps.add("spectrum Kd", [400.0, 0.0, 550.0, 0.0, 560.0, 1.0, 700.0, 1.0])
    rgb = ps.find_one_rgb("Kd", [0, 0, 0])
    assert rgb[0] > rgb[2]  # long-wavelength step is red-ish

    spd = tmp_path / "kd.spd"
    spd.write_text("400 1\n700 1\n")
    ps2 = ParamSet()
    ps2.add("spectrum Kd", [str(spd)])
    rgb2 = ps2.find_one_rgb("Kd", [0, 0, 0])
    # flat SPD = equal-energy whitepoint; sRGB (D65 white) renders that
    # slightly pink — exactly xyz_to_rgb(1,1,1), as the reference does
    assert np.allclose(rgb2, sp.xyz_to_rgb(np.ones(3)), atol=0.02)

    ps3 = ParamSet()
    ps3.add("blackbody L", [3000.0, 5.0])
    rgb3 = ps3.find_one_rgb("L", None)
    assert rgb3.max() == pytest.approx(5.0, rel=1e-6)
    assert rgb3[0] > rgb3[2]


def test_parser_spectrum_directive(tmp_path):
    """End-to-end: a scene using 'spectrum Kd' pairs parses and builds."""
    from pbrt_v3_iile_tpu.scene import api as apilib

    scene = tmp_path / "s.pbrt"
    scene.write_text("""
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
Material "matte" "spectrum Kd" [400 0.1 700 0.9]
Shape "trianglemesh" "point P" [-1 0 -1 1 0 -1 1 0 1 -1 0 1]
  "integer indices" [0 1 2 2 3 0]
LightSource "point" "blackbody I" [4500 10]
WorldEnd
""")
    sd = apilib.load_scene(str(scene))
    kd = sd.materials[1].kd  # [0] is the default material
    assert kd[0] > kd[2]  # rising SPD -> red-heavy reflectance
