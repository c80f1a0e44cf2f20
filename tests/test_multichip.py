"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(SURVEY §4: multi-host tests via xla_force_host_platform_device_count)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_mesh_construction():
    from pbrt_v3_iile_tpu.parallel import mesh as meshlib

    mesh = meshlib.make_mesh(8)
    assert mesh.devices.size == 8
    assert set(mesh.axis_names) == {"dp", "tile"}


def test_sharded_train_step_runs():
    from pbrt_v3_iile_tpu.parallel import mesh as meshlib
    from pbrt_v3_iile_tpu.ml import train as trainlib

    mesh = meshlib.make_mesh(8)
    state = trainlib.init_training(jax.random.PRNGKey(0), hemi_size=8,
                                   mesh=mesh)
    B = 16
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 8, 8, 7))
    y = jax.random.uniform(jax.random.PRNGKey(2), (B, 8, 8, 3))
    params, stats, opt_state, loss = state["step"](
        state["params"], state["batch_stats"], state["opt_state"], x, y)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_sharded_render_matches_single_device():
    """Row-sharded render must equal the unsharded render exactly
    (disjoint tiles, deterministic per-row keys)."""
    from pbrt_v3_iile_tpu.parallel import mesh as meshlib, sharded
    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib

    scene_text = """
LookAt 0 1 -4  0 1 0  0 1 0
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Integrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "point" "color I" [10 10 10] "point from" [0 3 -1]
Material "matte" "color Kd" [0.6 0.3 0.2]
Shape "trianglemesh" "point P" [-5 0 -5 5 0 -5 5 0 5 -5 0 5]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""
    sd = apilib.load_scene_string(scene_text)
    scene, cam = renderlib.build(sd, use_native_bvh=True)
    mesh = meshlib.make_mesh(8)
    run = sharded.sharded_render_pass(sd, mesh)
    L = np.asarray(run(scene, cam, jax.random.PRNGKey(3), 0))
    assert L.shape == (32, 32, 3)
    assert np.isfinite(L).all()
    assert L.mean() > 0
    # determinism across invocations
    L2 = np.asarray(run(scene, cam, jax.random.PRNGKey(3), 0))
    assert np.array_equal(L, L2)
