"""Goniometric / projection lights and tessellated shape coverage
(ref: src/lights/goniometric.cpp, projection.cpp; src/shapes/cone.cpp,
paraboloid.cpp, hyperboloid.cpp, heightfield.cpp, curve.cpp, nurbs.cpp)."""

import os

import numpy as np
import jax
import pytest

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.scene import shapes
from pbrt_v3_iile_tpu.scene.paramset import ParamSet
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.utils import image as imglib


def _render(scene_txt, base_dir="."):
    sd = apilib.load_scene_string(scene_txt, base_dir)
    scene, cam = renderlib.build(sd)
    cfg = renderlib.make_integrator_config(sd)
    run = jax.jit(renderlib.render_pass_fn(sd, cfg))
    L, _, _ = run(scene, cam, jax.random.PRNGKey(0), 0)
    return np.asarray(L)


_PLANE = """
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "random" "integer pixelsamples" [4]
Integrator "directlighting"
WorldBegin
{light}
AttributeBegin
  Material "matte" "rgb Kd" [0.8 0.8 0.8]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-5 -5 2  5 -5 2  5 5 2  -5 5 2]
AttributeEnd
WorldEnd
"""


def test_projection_light_window(tmp_path):
    # left half of the projected texture dark, right half bright
    img = np.zeros((16, 32, 3), np.float32)
    img[:, 16:] = 1.0
    mp = os.path.join(tmp_path, "map.pfm")
    imglib.write_pfm(str(mp), img)
    L = _render(_PLANE.format(
        light=f'LightSource "projection" "rgb I" [10 10 10] '
              f'"float fov" [60] "string mapname" ["{mp}"]'))
    assert L[:, 24:].mean() > 1e-3       # bright side lit
    assert L[:, :8].mean() < 1e-6        # dark side black
    # outside the fov cone there is no light at all: corners vs center
    assert np.isfinite(L).all()


def test_projection_no_map_cone():
    # without a map the projection light is a cone-limited point light
    L = _render(_PLANE.format(
        light='LightSource "projection" "rgb I" [10 10 10] "float fov" [30]'))
    mid = L[12:20, 12:20].mean()
    corner = L[:2, :2].mean()
    assert mid > 1e-3 and corner < 1e-6


def test_goniometric_light(tmp_path):
    # constant map == plain point light; scaled map scales radiance
    img1 = np.ones((16, 32, 3), np.float32)
    mp1 = os.path.join(tmp_path, "g1.pfm")
    imglib.write_pfm(str(mp1), img1)
    imglib.write_pfm(str(os.path.join(tmp_path, "g2.pfm")), 0.5 * img1)
    Lp = _render(_PLANE.format(
        light='LightSource "point" "rgb I" [10 10 10]'))
    Lg = _render(_PLANE.format(
        light=f'LightSource "goniometric" "rgb I" [10 10 10] '
              f'"string mapname" ["{mp1}"]'))
    Lh = _render(_PLANE.format(
        light=f'LightSource "goniometric" "rgb I" [10 10 10] '
              f'"string mapname" ["{os.path.join(tmp_path, "g2.pfm")}"]'))
    np.testing.assert_allclose(Lg, Lp, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(Lh, 0.5 * Lp, rtol=1e-4, atol=1e-6)


def _mk(**kw):
    ps = ParamSet()
    for k, v in kw.items():
        ps.add(k, v)
    return ps


@pytest.mark.parametrize("kind,params", [
    ("cone", {"float radius": [0.5], "float height": [2.0]}),
    ("paraboloid", {"float radius": [1.0], "float zmin": [0.0],
                    "float zmax": [1.0]}),
    ("hyperboloid", {"point p1": [1, 0, 0], "point p2": [1, 1, 1]}),
    ("heightfield", {"integer nu": [4], "integer nv": [3],
                     "float Pz": list(np.arange(12.0))}),
    ("curve", {"point P": [0, 0, 0, 1, 0, 0, 2, 1, 0, 3, 1, 0],
               "string type": ["cylinder"], "float width": [0.1]}),
    ("curve", {"point P": [0, 0, 0, 1, 0, 0, 2, 1, 0, 3, 1, 0],
               "string type": ["ribbon"], "float width": [0.1],
               "normal N": [0, 0, 1, 0, 0, 1]}),
])
def test_tessellated_shapes_finite(kind, params):
    out = shapes.create_triangles(kind, _mk(**params), np.eye(4), False, ".")
    assert out is not None
    tp, tn, tuv = out
    assert tp.shape[0] > 0 and np.isfinite(tp).all()
    if tn is not None:
        nl = np.linalg.norm(tn.reshape(-1, 3), axis=-1)
        assert np.isfinite(tn).all() and (nl < 1.001).all()


def test_nurbs_plane_exact():
    # bicubic Bezier-like clamped NURBS of a flat bilinear sheet stays flat
    ctrl = [c for v in range(4) for u in range(4) for c in (u / 3, v / 3, 0.0)]
    ps = _mk(**{"integer nu": [4], "integer nv": [4], "integer uorder": [4],
                "integer vorder": [4],
                "float uknots": [0, 0, 0, 0, 1, 1, 1, 1],
                "float vknots": [0, 0, 0, 0, 1, 1, 1, 1],
                "point P": ctrl})
    tp, tn, tuv = shapes.create_triangles("nurbs", ps, np.eye(4), False, ".")
    assert np.abs(tp[..., 2]).max() < 1e-6
    assert tp[..., 0].min() > -1e-6 and tp[..., 0].max() < 1 + 1e-6


def test_heightfield_matches_grid():
    z = np.linspace(0.0, 1.0, 12)
    ps = _mk(**{"integer nu": [4], "integer nv": [3], "float Pz": list(z)})
    tp, _, _ = shapes.create_triangles("heightfield", ps, np.eye(4), False, ".")
    # 2*(nu-1)*(nv-1) triangles covering [0,1]^2
    assert tp.shape[0] == 2 * 3 * 2
    assert tp[..., 0].min() == 0.0 and tp[..., 0].max() == 1.0
