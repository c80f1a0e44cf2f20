"""Analytic-scene convergence of the MLT and SPPM integrators
(coverage model: src/tests/analytic_scenes.cpp crossed with integrators
{mlt, sppm} as in INSTANTIATE_TEST_CASE_P, analytic_scenes.cpp:439)."""

import numpy as np
import pytest

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib

# unit sphere, albedo 0.5, point light I=pi at center: L = 1 exactly at
# infinite depth; truncated at maxdepth D the analytic value is 1 - 2^-D
SPHERE = """
LookAt 0 0 0  1 0 0  0 0 1
Camera "perspective" "float fov" [90]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
%s
WorldBegin
LightSource "point" "color I" [3.14159265 3.14159265 3.14159265]
AttributeBegin
  ReverseOrientation
  Material "matte" "color Kd" [0.5 0.5 0.5]
  Shape "sphere" "float radius" [1]
AttributeEnd
WorldEnd
"""


@pytest.mark.slow
def test_mlt_sphere_radiance():
    sd = apilib.load_scene_string(SPHERE % (
        'Integrator "mlt" "integer maxdepth" [8]'))
    img, _ = renderlib.render(sd, spp=64)
    expect = 1.0 - 2.0 ** -8
    assert abs(float(img.mean()) - expect) < 0.08
    assert np.isfinite(img).all()


@pytest.mark.slow
def test_sppm_sphere_radiance():
    sd = apilib.load_scene_string(SPHERE % (
        'Integrator "sppm" "integer maxdepth" [6] "float radius" [0.2]'))
    img, _ = renderlib.render(sd, spp=8)
    expect = 1.0 - 2.0 ** -6
    assert abs(float(img.mean()) - expect) < 0.08
    assert np.isfinite(img).all()


GLASS_BULB = """
LookAt 0 1.2 -2.6  0 1.0 0.5  0 1 0
Camera "perspective" "float fov" [70]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Integrator "mlt" "integer maxdepth" [6]
WorldBegin
# a point light sealed inside a glass ball: every shadow ray is blocked
# by the shell and the delta light is unreachable by BSDF sampling, so
# unidirectional transport gets (almost) nothing — the light subpath
# refracts out and connects (the transport BDPT-MLT exists for)
LightSource "point" "color I" [60 60 60] "point from" [0 1.4 0.8]
AttributeBegin
  Material "glass" "float eta" [1.5]
  Translate 0 1.4 0.8
  Shape "sphere" "float radius" [0.35]
AttributeEnd
Material "matte" "color Kd" [0.7 0.7 0.7]
# room: floor, ceiling, back wall
Shape "trianglemesh" "point P" [-3 0 -3  3 0 -3  3 0 3  -3 0 3] "integer indices" [0 1 2 0 2 3]
Shape "trianglemesh" "point P" [-3 2.6 -3  3 2.6 -3  3 2.6 3  -3 2.6 3] "integer indices" [0 2 1 0 3 2]
Shape "trianglemesh" "point P" [-3 0 2.5  3 0 2.5  3 2.6 2.5  -3 2.6 2.5] "integer indices" [0 2 1 0 3 2]
WorldEnd
"""


@pytest.mark.slow
def test_mlt_bdpt_beats_pssmlt_on_sealed_light():
    """Metropolis over BDPT proposals (ref: mlt.cpp:36,144-153) must
    transport light that the unidirectional PSSMLT cannot: a delta
    light sealed in glass (NEE shadow rays always occluded, BSDF
    sampling cannot hit a point light) — only light-subpath
    connections carry energy."""
    from pbrt_v3_iile_tpu.integrators import mlt as mltlib

    sd = apilib.load_scene_string(GLASS_BULB)
    cfg_b = mltlib.MLTConfig(max_depth=6, n_chains=384, n_bootstrap=2048,
                             bdpt=True)
    cfg_p = cfg_b._replace(bdpt=False)
    img_b, st_b = mltlib.render_mlt(sd, mutations_per_pixel=48, seed=3,
                                    cfg=cfg_b)
    img_p, st_p = mltlib.render_mlt(sd, mutations_per_pixel=48, seed=3,
                                    cfg=cfg_p)
    assert np.isfinite(img_b).all()
    mb, mp = float(img_b.mean()), float(img_p.mean())
    # BDPT proposals find the refracted transport; unidirectional gets
    # (essentially) nothing
    assert mb > 0.02, f"bdpt-mlt found no transport ({mb})"
    assert mb > 4.0 * max(mp, 1e-9), (mb, mp)

