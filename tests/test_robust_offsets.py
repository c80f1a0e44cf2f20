"""Robust self-intersection avoidance tests (the EFloat role: ref
core/efloat.h error-bounded intersections + interaction.h OffsetRayOrigin.
Our mechanism is scale-relative ray offsets — vecmath.offset_ray_origin;
VERDICT r1 flagged it untested at grazing angles)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_v3_iile_tpu.utils import vecmath as vm
from pbrt_v3_iile_tpu.ops import intersect as isect
from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib


def _plane_scene(offset):
    """A big quad far from the origin (large float magnitudes stress the
    offset's scale-relative term)."""
    ox, oy, oz = offset
    return f"""
LookAt {ox} {oy + 3} {oz - 3}  {ox} {oy} {oz}  0 1 0
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "path" "integer maxdepth" [3]
WorldBegin
LightSource "point" "rgb I" [50 50 50] "point from" [{ox} {oy + 4} {oz}]
Material "matte" "rgb Kd" [0.6 0.6 0.6]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [{ox - 8} {oy} {oz - 8}  {ox + 8} {oy} {oz - 8}
             {ox + 8} {oy} {oz + 8}  {ox - 8} {oy} {oz + 8}]
WorldEnd
"""


@pytest.mark.parametrize("grazing_deg", [0.5, 2.0, 10.0, 45.0, 89.0])
def test_offset_prevents_self_hit_at_grazing_angles(grazing_deg):
    """Rays re-spawned from hit points must not re-hit their own
    triangle, even leaving at grazing angles from far-from-origin
    geometry (OffsetRayOrigin semantics, interaction.h:231)."""
    sd = apilib.load_scene_string(_plane_scene((5000.0, 300.0, -2000.0)))
    scene, _ = renderlib.build(sd, use_native_bvh=False)

    rng = np.random.default_rng(4)
    n = 512
    # hit points scattered across the far-away plane
    px = 5000.0 + rng.uniform(-6, 6, n)
    pz = -2000.0 + rng.uniform(-6, 6, n)
    p = jnp.asarray(np.stack([px, np.full(n, 300.0), pz], -1), jnp.float32)
    ng = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    # outgoing directions at the given elevation above the surface
    phi = rng.uniform(0, 2 * np.pi, n)
    el = np.deg2rad(grazing_deg)
    d = np.stack([np.cos(phi) * np.cos(el), np.full(n, np.sin(el)),
                  np.sin(phi) * np.cos(el)], -1)
    d = jnp.asarray(d, jnp.float32)

    o = vm.offset_ray_origin(p, ng, d)
    hit = isect.intersect(scene, o, d, jnp.full(n, 1e30, jnp.float32))
    # any hit must be the genuine far edge of the plane, not the origin
    # point itself (t ~ 0 = shadow acne / self-intersection)
    t = np.asarray(hit.t)
    valid = np.asarray(hit.valid)
    assert not (valid & (t < 1e-3)).any(), \
        f"self-intersections at {grazing_deg} deg: min t {t[valid].min()}"


def test_far_scene_renders_without_acne():
    """End-to-end: shading a plane at coordinates ~5e3 must not produce
    the black-speckle pattern of shadow-ray self-hits."""
    sd = apilib.load_scene_string(_plane_scene((5000.0, 300.0, -2000.0)))
    img = np.asarray(renderlib.render(sd, spp=8, seed=3)[0])
    assert np.isfinite(img).all()
    h, w = img.shape[:2]
    center = img[h // 4: 3 * h // 4, w // 4: 3 * w // 4].mean(-1)
    # acne shows as scattered zero pixels in the lit region
    assert (center <= 1e-6).mean() < 0.02, \
        f"{(center <= 1e-6).mean():.1%} black pixels in lit region"


def test_near_origin_matches_far_origin():
    """The same scene near and far from the origin renders the same
    image (translation invariance of the offset machinery)."""
    near = np.asarray(renderlib.render(
        apilib.load_scene_string(_plane_scene((0.0, 0.0, 0.0))),
        spp=8, seed=3)[0])
    far = np.asarray(renderlib.render(
        apilib.load_scene_string(_plane_scene((5000.0, 300.0, -2000.0))),
        spp=8, seed=3)[0])
    assert abs(near.mean() - far.mean()) < 0.02 * max(near.mean(), 1e-9)
