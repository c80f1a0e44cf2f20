"""TRUE reference parity MATRIX: compares this renderer's output with
images rendered by the REFERENCE C++ renderer itself (pbrt-v3-IILE
built by scripts/oracle/build_oracle.sh — system zlib+OpenEXR + glog
stub; fixtures rendered by scripts/oracle/render_fixtures.py).

Fixtures (tests/golden/*_ref_*.npy) are the reference's own renders,
box-downsampled:
- killeroo 700^2: path @128 spp, directlighting @64, bdpt @32 -> 175^2
- atrium 256^2: path @96, directlighting @96 -> 128^2
- interior_v1 256^2: path @96 -> 128^2
plus the 512^2 @320 spp atrium ground truth used by the quality sweep
(atrium_gt_oracle_path320_512.npz).

Unlike test_golden.py (self-regression goldens), a failure here means a
genuine estimator deviation from the reference renderer.  Tolerances
are set at ~2x the measured deltas (scripts/oracle/calibrate_parity.py
on the chip) so a percent-level regional energy bug — the class of bug
round 4 actually found and fixed — fails the test.
"""
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fixture, scene, integrator, res, our spp, tol(global, regions, blur)
CASES = [
    # post-fix calibration (scripts/oracle/calibrate_parity.py, chip):
    # killeroo path/direct/bdpt: global -1.2/-1.2/-2.4%, middle region
    # -6.3/-6.8/-8.0% (known remaining statue gap — loopsubdiv limit
    # normals are approximate), blur 7.4/7.4/7.1%
    # atrium path/direct: +0.3/+0.7% global, regions < 1.7%
    # interior1 path: -1.9% global, bottom -4.5%
    ("killeroo_ref_path128_175.npy", KILLEROO, "path", 175, 32,
     0.025, (0.025, 0.10, 0.05), 0.09),
    ("killeroo_ref_direct64_175.npy", KILLEROO, "directlighting", 175, 32,
     0.025, (0.025, 0.10, 0.05), 0.09),
    ("killeroo_ref_bdpt32_175.npy", KILLEROO, "bdpt", 175, 16,
     0.04, (0.04, 0.12, 0.07), 0.09),
    ("atrium_ref_path96_128.npy",
     os.path.join(REPO, "scenes", "atrium.pbrt"), "path", 128, 64,
     0.015, (0.02, 0.02, 0.02), 0.07),
    ("atrium_ref_direct96_128.npy",
     os.path.join(REPO, "scenes", "atrium.pbrt"), "directlighting",
     128, 64, 0.02, (0.03, 0.025, 0.02), 0.07),
    ("interior1_ref_path96_128.npy",
     os.path.join(REPO, "scenes", "interior_v1.pbrt"), "path", 128, 64,
     0.03, (0.03, 0.03, 0.07), 0.07),
]


def _blur4(x):
    n = x.shape[0] // 4 * 4
    return x[:n, :n].reshape(n // 4, 4, n // 4, 4, 3).mean((1, 3))


@pytest.mark.slow
@pytest.mark.parametrize(
    "fixture,scene,integ,res,spp,gtol,rtols,btol", CASES,
    ids=[c[0].replace("_ref_", ":").replace(".npy", "") for c in CASES])
def test_matches_reference_render(fixture, scene, integ, res, spp,
                                  gtol, rtols, btol):
    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib

    ref = np.load(os.path.join(GOLDEN, fixture))
    sd = apilib.load_scene(scene)
    sd.integrator.kind = integ
    sd.film.x_resolution = sd.film.y_resolution = res
    img, _ = renderlib.render(sd, spp=spp, seed=3)
    img = np.asarray(img)

    # global energy: two independent estimates of the same integral
    g = abs(img.mean() - ref.mean()) / ref.mean()
    assert g < gtol, (img.mean(), ref.mean(), g)
    # regional energy in horizontal thirds (top/middle/bottom)
    h = res // 3
    for (lo, hi), tol in zip(((0, h), (h, 2 * h), (2 * h, res)), rtols):
        m, r = img[lo:hi].mean(), ref[lo:hi].mean()
        assert abs(m - r) < tol * max(r, 1e-3), (lo, hi, m, r)
    # structural: 4x4-box-blurred images agree in relative L1 (blur
    # suppresses both sides' sampling noise)
    bm, br = _blur4(img), _blur4(ref)
    rel = np.abs(bm - br).mean() / br.mean()
    assert rel < btol, rel
