"""End-to-end IILE ML pipeline test: on-device dataset generation ->
U-Net training (loss decreases) -> inference through the probe pipeline.
(Replaces-and-tests the reference flow render_reference -> main_train.py
-> main_stdio_net.py, which had no automated tests at all.)"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib

SCENE = """
LookAt 0 2.5 -6  0 2.5 0  0 1 0
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Integrator "iispt" "integer maxdepth" [4]
WorldBegin
AttributeBegin
  Material "matte" "color Kd" [0 0 0]
  AreaLightSource "area" "color L" [20 20 20]
  Translate 0 4.5 0
  Shape "sphere" "float radius" [0.4]
AttributeEnd
Material "matte" "color Kd" [0.6 0.6 0.6]
Shape "trianglemesh" "point P" [-5 0 -5 5 0 -5 5 0 5 -5 0 5]
  "integer indices" [0 1 2 2 3 0]
Material "matte" "color Kd" [0.7 0.3 0.3]
Shape "trianglemesh" "point P" [-5 0 3 5 0 3 5 5 3 -5 5 3]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""

HEMI = 8


@pytest.mark.slow
def test_dataset_generation_and_training(tmp_path):
    from pbrt_v3_iile_tpu.ml import dataset as datasetlib
    from pbrt_v3_iile_tpu.ml import train as trainlib
    from pbrt_v3_iile_tpu.parallel import mesh as meshlib

    sd = apilib.load_scene_string(SCENE)
    scene, cam = renderlib.build(sd, use_native_bvh=True)
    key = jax.random.PRNGKey(0)

    # reference-tiles style probe grid (ref: iispt.cpp:498 render_reference)
    g = jnp.linspace(2, 29, 4).astype(jnp.int32)
    gx, gy = jnp.meshgrid(g, g)
    coords = jnp.stack([gx, gy], -1).reshape(-1, 2)

    gen = jax.jit(lambda scene, key: datasetlib.generate_examples(
        scene, cam, 0, key, coords, hemi_size=HEMI, gt_spp=2))
    maps = gen(scene, key)
    assert maps["p"].shape == (16, HEMI, HEMI, 3)
    assert bool(maps["valid"].any())
    assert np.isfinite(np.asarray(maps["p"])).all()

    raw = [
        {k: np.asarray(maps[k][i]) for k in "pdnz"}
        for i in range(16) if bool(maps["valid"][i])
    ]
    assert len(raw) >= 4

    # train a small net; loss must decrease
    mesh = meshlib.make_mesh(1)
    state = trainlib.init_training(jax.random.PRNGKey(1), hemi_size=HEMI,
                                   mesh=mesh)
    # shrink the net for test speed
    from pbrt_v3_iile_tpu.models import iisptnet
    import optax
    net = iisptnet.IISPTNet(k=8)
    variables = net.init(jax.random.PRNGKey(2),
                         jnp.zeros((1, HEMI, HEMI, 7)), train=False)
    opt = optax.adam(1e-3)
    from pbrt_v3_iile_tpu.parallel import sharded
    step = sharded.make_train_step(net, opt, mesh)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    opt_state = opt.init(params)
    losses = []
    for epoch in range(6):
        for x, y in datasetlib.batches_from_raw(
                raw, 8, jax.random.fold_in(key, epoch)):
            params, stats, opt_state, loss = step(params, stats, opt_state,
                                                  x, y)
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses

    # checkpoint round trip (replaces iispt_model.tch)
    ckpt = str(tmp_path / "model.ckpt")
    trainlib.save_checkpoint(ckpt, dict(params=params, batch_stats=stats))
    blob = trainlib.load_checkpoint(ckpt)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: np.allclose(a, b), params, blob["params"]))
