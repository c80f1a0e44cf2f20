"""Differentiable-pass validation: AD pixel gradients vs finite
differences (BASELINE.json config 3; no reference analogue — the C++
renderer is not differentiable)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.integrators import path as pathlib_
from pbrt_v3_iile_tpu.integrators import grad as gradlib
from pbrt_v3_iile_tpu.ops import camera as camlib
from pbrt_v3_iile_tpu.ops import samplers as smplr

SCENE = """
LookAt 0 1 -4  0 1 0  0 1 0
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "point" "color I" [10 10 10] "point from" [0 3 -1]
Material "matte" "color Kd" [0.6 0.3 0.2]
Shape "trianglemesh" "point P" [-5 0 -5 5 0 -5 5 0 5 -5 0 5]
  "integer indices" [0 1 2 2 3 0]
Shape "trianglemesh" "point P" [-5 0 2 5 0 2 5 5 2 -5 5 2]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""

SPP = 16


def _mean_image_fn(sd, cam, differentiable):
    cfg = renderlib.make_integrator_config(sd)._replace(
        differentiable=differentiable)
    H = W = 16
    cam_kind = 0

    def f(scene, key):
        px = jnp.arange(W, dtype=jnp.float32)
        py = jnp.arange(H, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(px, py)
        pix = jnp.stack([gx, gy], -1).reshape(-1, 2)

        def one_pass(acc, p):
            k = jax.random.fold_in(key, p)
            kj = smplr.wave_key(k, 0, 0, smplr.DIM_PIXEL_JITTER)
            jitter = smplr.uniform(kj, (H * W, 2))
            o, d = camlib.generate_rays(cam, pix + jitter, kind=cam_kind)
            L, _ = pathlib_.trace_paths(scene, o, d, k, cfg)
            return acc + jnp.mean(L), None

        acc, _ = jax.lax.scan(one_pass, 0.0, jnp.arange(SPP))
        return acc / SPP

    return f


@pytest.mark.slow
def test_ad_matches_finite_difference():
    sd = apilib.load_scene_string(SCENE)
    scene, cam = renderlib.build(sd, use_native_bvh=True)
    key = jax.random.PRNGKey(0)

    f_diff = _mean_image_fn(sd, cam, differentiable=True)
    grad_fn = jax.jit(jax.grad(
        lambda kd, scene, key: f_diff(scene._replace(mat_kd=kd), key)))
    g_kd = np.asarray(grad_fn(scene.mat_kd, scene, key))

    f_prim = jax.jit(_mean_image_fn(sd, cam, differentiable=False))
    eps = 2e-2
    # same RNG stream on both sides -> correlated FD, low noise
    for ci in range(3):
        up = scene.mat_kd.at[1, ci].add(eps)
        dn = scene.mat_kd.at[1, ci].add(-eps)
        fd = (float(f_prim(scene._replace(mat_kd=up), key))
              - float(f_prim(scene._replace(mat_kd=dn), key))) / (2 * eps)
        ad = float(g_kd[1, ci])
        assert fd != 0.0
        assert abs(ad - fd) < 0.15 * max(abs(fd), 1e-3), (ci, ad, fd)


@pytest.mark.slow
def test_light_gradient_positive():
    sd = apilib.load_scene_string(SCENE)
    scene, cam = renderlib.build(sd, use_native_bvh=True)
    key = jax.random.PRNGKey(0)
    f_diff = _mean_image_fn(sd, cam, differentiable=True)
    g = jax.jit(jax.grad(
        lambda L, scene, key: f_diff(scene._replace(light_L=L), key)))(
            scene.light_L, scene, key)
    # brightening the only light brightens the image
    assert (np.asarray(g)[0] > 0).all()
