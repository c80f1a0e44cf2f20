"""Realistic (lens-table) camera tests (ref: src/cameras/realistic.cpp).

A synthetic biconvex lens with known focal length validates the host
focusing solver against the thin-lens equation, and the jitted wavefront
ray-gen against the host trace.
"""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_v3_iile_tpu.ops import camera as camlib
from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib


# biconvex f=50mm lens (mm, front-to-rear): R1=50 n=1.5, R2=-50 air,
# last thickness = film distance (refined by focusing)
LENS_DAT = """\
# radius  thickness  eta  aperture-diameter
50   2   1.5  20
-50  45  0    20
"""


def _lens_file():
    f = tempfile.NamedTemporaryFile("w", suffix=".dat", delete=False)
    f.write(LENS_DAT)
    f.close()
    return f.name


def test_focus_matches_thin_lens():
    """Thin-lens: f=50mm, object at 1m -> image at ~52.6mm."""
    path = _lens_file()
    curv, thick, eta, ap_r = camlib.load_lens_file(path)
    assert len(curv) == 2 and abs(curv[0] - 0.05) < 1e-9
    thick2 = camlib.focus_lens(curv, thick, eta, ap_r, 1.0)
    di = 1.0 / (1.0 / 0.050 - 1.0 / 1.0)   # 52.63 mm
    # thick lens principal planes shift this by ~the 2mm center thickness
    assert abs(thick2[-1] - di) < 0.004, (thick2[-1], di)
    os.unlink(path)


def test_axial_point_focuses_on_film():
    """Rays from the in-focus axial point converge to the film center."""
    path = _lens_file()
    curv, thick, eta, ap_r = camlib.load_lens_file(path)
    thick = camlib.focus_lens(curv, thick, eta, ap_r, 1.0)
    front_z = -float(np.sum(thick))
    src = np.array([0.0, 0.0, front_z - 1.0])
    for h in [0.002, -0.004, 0.006]:
        aim = np.array([h, 0.0, front_z])
        d = aim - src
        d = d / np.linalg.norm(d)
        res = camlib._trace_lens_np(src, d, curv, thick, eta, ap_r,
                                    from_scene=True)
        assert res is not None
        o, dd = res
        t = (0.0 - o[2]) / dd[2]
        x_f = o[0] + t * dd[0]
        assert abs(x_f) < 2e-4, (h, x_f)   # spot < 0.2mm
    os.unlink(path)


def test_realistic_ray_gen_jit():
    path = _lens_file()
    scene_text = f"""
    LookAt 0 1 -4  0 0.5 0  0 1 0
    Camera "realistic" "string lensfile" "{path}"
      "float aperturediameter" [10] "float focusdistance" [4]
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Integrator "path" "integer maxdepth" [2]
    WorldBegin
    LightSource "point" "rgb I" [30 30 30]
    Material "matte" "rgb Kd" [0.7 0.7 0.7]
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-6 -0.5 4  6 -0.5 4  6 6 4  -6 6 4]
    WorldEnd
    """
    sd = apilib.load_scene_string(scene_text)
    assert sd.camera.kind == "realistic"
    cam = camlib.make_camera(sd.camera, sd.film)
    assert cam.lens_curv.shape[0] == 2
    N = 256
    p_film = jax.random.uniform(jax.random.PRNGKey(0), (N, 2)) * 16.0
    u = jax.random.uniform(jax.random.PRNGKey(1), (N, 2))
    o, d, w = jax.jit(camlib.realistic_generate_rays)(cam, p_film, u)
    o, d, w = np.asarray(o), np.asarray(d), np.asarray(w)
    assert np.isfinite(o).all() and np.isfinite(d).all()
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    assert (w > 0).mean() > 0.5, "most rays should clear the lens"
    assert (w <= 1.0 + 1e-5).all()
    # an image actually forms: render end-to-end
    img, _ = renderlib.render(sd, spp=4)
    assert np.isfinite(img).all() and img.mean() > 0.0
    os.unlink(path)
