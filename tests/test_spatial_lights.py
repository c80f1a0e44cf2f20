"""SpatialLightDistribution tests (ref: core/lightdistrib.h:100) —
per-voxel light selection must be a valid distribution, agree with the
global table when the grid is off, and measurably beat the power
distribution on a many-light scene (VERDICT r1 item #8)."""

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib


_SCENE = """
LookAt 0 2 -7  0 1 0  0 1 0
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [32] "integer yresolution" [24]
Sampler "random" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [2] "string lightsamplestrategy" ["{strat}"]
WorldBegin
LightSource "point" "color I" [400 400 400] "point from" [30 4 0]
LightSource "point" "color I" [0.4 0.4 0.4] "point from" [-3 2 0]
LightSource "point" "color I" [0.4 0.4 0.4] "point from" [0 2 -3]
LightSource "point" "color I" [0.4 0.4 0.4] "point from" [3 2 -1]
Material "matte" "color Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "point P" [-40 0 -40 40 0 -40 40 0 40 -40 0 40]
  "integer indices" [0 1 2 2 3 0]
# occluder between the camera's area and the strong far light
Shape "trianglemesh" "point P" [8 0 -40 8 0 40 8 8 40 8 8 -40]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def _scene(strat):
    return apilib.load_scene_string(_SCENE.format(strat=strat))


def test_spatial_tables_built():
    sd = _scene("spatial")
    scene, _ = renderlib.build(sd)
    res = np.asarray(scene.spatial_res)
    assert res.prod() > 1
    pdf = np.asarray(scene.spatial_pdf)
    assert pdf.shape[0] == res.prod()
    nl = int(scene.n_lights)
    np.testing.assert_allclose(pdf[:, :nl].sum(axis=1), 1.0, atol=1e-4)
    # a voxel near the weak lights must prefer them over the (occluded,
    # distant) strong light relative to the raw power ratio
    from pbrt_v3_iile_tpu.ops import lights as lightlib
    v = np.asarray(lightlib._spatial_voxel(
        scene, jnp.asarray([[-3.0, 1.0, 0.0]])))[0]
    assert pdf[v, 1] > np.asarray(scene.light_pdf)[1] * 3


def test_spatial_selection_is_consistent():
    """choose_light_spatial's pdf must match light_select_pdf_spatial and
    reproduce the voxel pdf by Monte Carlo."""
    from pbrt_v3_iile_tpu.ops import lights as lightlib

    sd = _scene("spatial")
    scene, _ = renderlib.build(sd)
    N = 4096
    p = jnp.tile(jnp.asarray([[-3.0, 0.5, 0.0]]), (N, 1))
    u = jax.random.uniform(jax.random.PRNGKey(0), (N,))
    lid, pdf = lightlib.choose_light_spatial(scene, u, p)
    pdf2 = lightlib.light_select_pdf_spatial(scene, p, lid)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-6)
    counts = np.bincount(np.asarray(lid), minlength=4) / N
    v = np.asarray(lightlib._spatial_voxel(scene, p[:1]))[0]
    np.testing.assert_allclose(counts,
                               np.asarray(scene.spatial_pdf)[v][:4],
                               atol=0.03)


def test_uniform_grid_matches_global():
    """strategy != spatial -> 1-voxel grid == the global distribution."""
    from pbrt_v3_iile_tpu.ops import lights as lightlib

    sd = _scene("power")
    scene, _ = renderlib.build(sd)
    assert np.asarray(scene.spatial_res).prod() == 1
    u = jax.random.uniform(jax.random.PRNGKey(1), (512,))
    p = jax.random.uniform(jax.random.PRNGKey(2), (512, 3)) * 10 - 5
    l1, p1 = lightlib.choose_light_spatial(scene, u, p)
    l2, p2 = lightlib.choose_light(scene, u)
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)


def test_spatial_beats_power_mse():
    """On the occluded-strong-light scene, spatial selection must reduce
    MSE vs the power distribution at equal spp ('Done' criterion)."""
    ref, _ = renderlib.render(_scene("spatial"), spp=64, seed=9)
    img_p, _ = renderlib.render(_scene("power"), spp=4, seed=0)
    img_s, _ = renderlib.render(_scene("spatial"), spp=4, seed=0)
    mse_p = float(((img_p - ref) ** 2).mean())
    mse_s = float(((img_s - ref) ** 2).mean())
    assert mse_s < 0.7 * mse_p, (mse_s, mse_p)
