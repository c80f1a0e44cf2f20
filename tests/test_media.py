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
