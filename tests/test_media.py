"""Participating-media tests (coverage model: src/tests/hg.cpp for the
phase function + an analytic Beer-Lambert attenuation scene)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_v3_iile_tpu.integrators.path import _hg_p, _hg_sample
from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib


def test_hg_normalization():
    """Integral of HG over the sphere = 1 (ref: src/tests/hg.cpp)."""
    for g in [-0.5, 0.0, 0.3, 0.8]:
        u = jax.random.uniform(jax.random.PRNGKey(0), (1 << 14,))
        cos_t = 1.0 - 2.0 * u
        p = np.asarray(_hg_p(cos_t, jnp.full_like(cos_t, g)))
        integral = p.mean() * 4 * np.pi
        assert abs(integral - 1.0) < 0.02, (g, integral)


def test_hg_sample_pdf_consistency():
    N = 1 << 13
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    g = jnp.full(N, 0.6)
    u = jax.random.uniform(jax.random.PRNGKey(1), (N, 2))
    wi, pdf = _hg_sample(d, g, u)
    wi = np.asarray(wi)
    assert np.allclose(np.linalg.norm(wi, axis=-1), 1.0, atol=1e-4)
    # forward scattering for g>0: mean cos with propagation dir == g
    assert abs(float(wi[:, 2].mean()) - 0.6) < 0.03
    # pdf equals phase value at dot(wo, wi) = -wi.d (pbrt convention)
    p = np.asarray(_hg_p(jnp.asarray(-wi[:, 2]), g))
    assert np.allclose(p, np.asarray(pdf), rtol=1e-3)


ABSORB_SCENE = """
LookAt 0 0 0  0 0 1  0 1 0
Camera "perspective" "float fov" [30]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "volpath" "integer maxdepth" [4]
MakeNamedMedium "fog" "string type" "homogeneous"
  "color sigma_a" [0.2 0.4 0.6] "color sigma_s" [0 0 0]
MediumInterface "" "fog"
WorldBegin
AttributeBegin
  Material "matte" "color Kd" [0 0 0]
  AreaLightSource "area" "color L" [5 5 5] "bool twosided" "true"
  Shape "trianglemesh" "point P" [-9 -9 4 9 -9 4 9 9 4 -9 9 4]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
WorldEnd
"""


@pytest.mark.slow
def test_beer_lambert_attenuation():
    """Emissive wall at distance 4 through absorbing fog:
    L = 5 * exp(-sigma_a * 4) per channel."""
    sd = apilib.load_scene_string(ABSORB_SCENE)
    assert len(sd.media) == 1
    img, _ = renderlib.render(sd, spp=32)
    got = img.mean(axis=(0, 1))
    want = 5.0 * np.exp(-np.array([0.2, 0.4, 0.6]) * 4.0)
    # small fov -> all rays ~ distance 4; channel-mixed estimator noise
    # at 32 spp x 256 px is ~1%
    assert np.allclose(got, want, rtol=0.06), (got, want)


GRID_ABSORB_SCENE = """
LookAt 0 0 0  0 0 1  0 1 0
Camera "perspective" "float fov" [20]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "volpath" "integer maxdepth" [4]
MakeNamedMedium "smoke" "string type" "heterogeneous"
  "color sigma_a" [0.5 0.5 0.5] "color sigma_s" [0 0 0]
  "integer nx" [2] "integer ny" [2] "integer nz" [2]
  "float density" [1 1 1 1 1 1 1 1]
  "point p0" [-10 -10 0] "point p1" [10 10 4]
MediumInterface "" "smoke"
WorldBegin
AttributeBegin
  Material "matte" "color Kd" [0 0 0]
  AreaLightSource "area" "color L" [5 5 5] "bool twosided" "true"
  Shape "trianglemesh" "point P" [-9 -9 4 9 -9 4 9 9 4 -9 9 4]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
WorldEnd
"""


def test_grid_density_lookup():
    """Trilinear density lookup matches hand values (ref: grid.cpp D)."""
    from pbrt_v3_iile_tpu.integrators.path import _grid_density
    from pbrt_v3_iile_tpu.scene import device as devlib
    sd = apilib.load_scene_string(GRID_ABSORB_SCENE)
    assert sd.media[0].density is not None
    scene, _ = renderlib.build(sd, use_native_bvh=False)
    # grid is constant 1 inside, 0 outside the box [-10,10]x[-10,10]x[0,4]
    pts = jnp.array([[0.0, 0.0, 2.0],     # deep inside -> 1
                     [0.0, 0.0, -3.0],    # outside -> 0
                     [0.0, 0.0, 50.0]])   # outside -> 0
    mid = jnp.zeros(3, jnp.int32)
    d = np.asarray(_grid_density(scene, mid, pts))
    assert abs(d[0] - 1.0) < 1e-5, d
    assert d[1] == 0.0 and d[2] == 0.0, d


@pytest.mark.slow
def test_grid_beer_lambert_attenuation():
    """Emissive wall at distance 4 through absorbing smoke (density 1,
    sigma_a 0.5).  pbrt's trilinear D() ramps to zero over the half-voxel
    at each grid face (grid.cpp), so with nz=2 over world z in [0,4] the
    density profile is 0.5->1 (z<1), 1 (1..3), 1->0.5 (z>3): optical
    depth = 0.5 * 3.5 = 1.75, L = 5*exp(-1.75) (delta tracking is
    unbiased)."""
    sd = apilib.load_scene_string(GRID_ABSORB_SCENE)
    img, _ = renderlib.render(sd, spp=48)
    got = img.mean(axis=(0, 1))
    want = 5.0 * np.exp(-1.75)
    assert np.allclose(got, want, rtol=0.08), (got, want)
