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
