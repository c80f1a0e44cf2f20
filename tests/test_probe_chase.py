"""Deep-specular probe chase: the reference follows up to 24 mirror
bounces before giving up (ref: iisptrenderrunner.cpp:657-757); a chase
capped at 8 loses the first-diffuse hit in mirror corridors."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.integrators import probes as probelib

SCENE = """
LookAt 0.5 0.5 -2  0.5 0.5 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Integrator "path" "integer maxdepth" [30]
WorldBegin
LightSource "point" "point from" [0.5 0.5 -1] "rgb I" [10 10 10]
# mirror corridor: two parallel mirrors at x=0 and x=1, z in [0, 1.2]
AttributeBegin
  Material "mirror" "rgb Kr" [0.95 0.95 0.95]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [0 -1 0  0 -1 1.2  0 2 1.2  0 2 0]
  Shape "trianglemesh" "integer indices" [0 2 1 0 3 2]
    "point P" [1 -1 0  1 -1 1.2  1 2 1.2  1 2 0]
AttributeEnd
# diffuse back wall past the corridor
AttributeBegin
  Material "matte" "rgb Kd" [0.6 0.2 0.2]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-9 -9 3  39 -9 3  39 11 3  -9 11 3]
AttributeEnd
WorldEnd
"""


def _build(tmp_path):
    f = tmp_path / "corridor.pbrt"
    f.write_text(SCENE)
    sd = apilib.load_scene(str(f))
    scene, _ = renderlib.build(sd)
    return scene


def test_deep_specular_chase_reaches_diffuse(tmp_path):
    scene = _build(tmp_path)
    # ray bouncing between the mirrors, advancing 0.1 in z per crossing:
    # 12 specular bounces before escaping the corridor to the back wall
    o = jnp.asarray(np.tile([[0.001, 0.5, 0.0]], (8, 1)), jnp.float32)
    d = jnp.asarray(np.tile([[1.0, 0.0, 0.1]], (8, 1)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    key = jax.random.PRNGKey(0)

    res24 = probelib.find_first_nonspecular(scene, o, d, key)
    assert bool(res24["found"][0]), "24-deep chase must reach the wall"
    assert abs(float(res24["p"][0, 2]) - 3.0) < 1e-2

    res8 = probelib.find_first_nonspecular(scene, o, d, key, max_chase=8)
    assert not bool(res8["found"][0]), \
        "8-deep chase cannot exit a 12-bounce corridor (guards the " \
        "reference-depth default)"
