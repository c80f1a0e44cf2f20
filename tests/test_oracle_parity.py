"""TRUE reference parity: compares this renderer's killeroo output with
an image rendered by the REFERENCE C++ renderer itself (pbrt-v3-IILE
built by scripts/oracle/build_oracle.sh — system zlib+OpenEXR + glog
stub; see BENCH_NOTES round 4).  The committed fixture
tests/golden/killeroo_ref_path128_175.npy is the reference's own
700^2 @ 128 spp halton path render (box-downsampled to 175^2),
converted by utils/image.py read_exr from the oracle's EXR output.

Unlike test_golden.py (self-regression goldens), a failure here means a
genuine estimator deviation from the reference renderer."""
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "golden",
                       "killeroo_ref_path128_175.npy")


@pytest.mark.slow
def test_killeroo_matches_reference_render():
    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib

    ref = np.load(FIXTURE)
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd.film.x_resolution = 175
    sd.film.y_resolution = 175
    img, _ = renderlib.render(sd, spp=8, seed=3)
    img = np.asarray(img)

    # global energy: the two independent 8/128-spp estimates of the same
    # integral must agree to a few percent
    assert abs(img.mean() - ref.mean()) < 0.03 * ref.mean(), \
        (img.mean(), ref.mean())
    # regional energy (top=backdrop+light, middle=models, bottom=floor)
    for lo, hi, tol in ((0, 58, 0.05), (58, 116, 0.12), (116, 175, 0.08)):
        m, r = img[lo:hi].mean(), ref[lo:hi].mean()
        assert abs(m - r) < tol * max(r, 1e-3), (lo, hi, m, r)
    # structural: 4x4-blurred images agree to ~10% relative L1 (blur
    # suppresses the 8-spp noise; the tolerance absorbs the rest)
    def blur(x):
        return x[:172].reshape(43, 4, 175, 3).mean(1)[
            :, :172].reshape(43, 43, 4, 3).mean(2)
    bm, br = blur(img), blur(ref)
    rel = np.abs(bm - br).mean() / br.mean()
    assert rel < 0.10, rel
