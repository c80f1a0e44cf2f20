"""Train an IISPTNet on on-device-generated probe data and run an IILE
render with it — the full reference workflow (render_reference ->
main_train.py -> iispt render, ref: tools/training_batch_generate.py) as
one script, no PFM files, no child processes.

Usage: python scripts/train_demo.py [--scene S.pbrt] [--out model.ckpt]
       [--grid 8] [--gt-spp 32] [--steps 300] [--hemi 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

DEMO_SCENE = """
LookAt 0 2.5 -6  0 2.5 0  0 1 0
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [128] "integer yresolution" [128]
Integrator "iispt" "integer maxdepth" [5]
WorldBegin
AttributeBegin
  Material "matte" "color Kd" [0 0 0]
  AreaLightSource "area" "color L" [30 30 30]
  Translate 0 4.7 0
  Shape "sphere" "float radius" [0.4]
AttributeEnd
Material "matte" "color Kd" [0.65 0.65 0.65]
# floor / ceiling / back / left (red) / right (green)
Shape "trianglemesh" "point P" [-3 0 -7 3 0 -7 3 0 3 -3 0 3] "integer indices" [0 1 2 2 3 0]
Shape "trianglemesh" "point P" [-3 5 -7 3 5 -7 3 5 3 -3 5 3] "integer indices" [0 2 1 2 0 3]
Shape "trianglemesh" "point P" [-3 0 3 3 0 3 3 5 3 -3 5 3] "integer indices" [0 1 2 2 3 0]
Material "matte" "color Kd" [0.7 0.15 0.15]
Shape "trianglemesh" "point P" [-3 0 -7 -3 0 3 -3 5 3 -3 5 -7] "integer indices" [0 1 2 2 3 0]
Material "matte" "color Kd" [0.15 0.7 0.15]
Shape "trianglemesh" "point P" [3 0 -7 3 0 3 3 5 3 3 5 -7] "integer indices" [0 2 1 2 0 3]
Material "plastic" "color Kd" [0.3 0.3 0.5] "color Ks" [0.4 0.4 0.4] "float roughness" [0.05]
Shape "trianglemesh" "point P" [-1.5 0 0 0 0 0.8 0 2 0.8 -1.5 2 0] "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None)
    ap.add_argument("--out", default="iispt_model.ckpt")
    ap.add_argument("--grid", type=int, default=8, help="probe grid per side")
    ap.add_argument("--gt-spp", type=int, default=32)
    ap.add_argument("--hemi", type=int, default=32)
    ap.add_argument("--batches", type=int, default=200)
    ap.add_argument("--render", action="store_true",
                    help="render IILE with the trained model afterwards")
    args = ap.parse_args()

    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib
    from pbrt_v3_iile_tpu.ml import dataset as datasetlib, train as trainlib
    from pbrt_v3_iile_tpu.ops import camera as camlib

    print("devices:", jax.devices(), flush=True)
    if args.scene:
        sd = apilib.load_scene(args.scene)
    else:
        sd = apilib.load_scene_string(DEMO_SCENE)
    scene, cam = renderlib.build(sd)
    cam_kind = camlib.KIND.get(sd.camera.kind, 0)
    key = jax.random.PRNGKey(0)

    # ---- dataset generation (reference-tiles grid) ----
    W, H = sd.film.x_resolution, sd.film.y_resolution
    g = args.grid
    gx = jnp.linspace(W * 0.06, W * 0.94, g).astype(jnp.int32)
    gy = jnp.linspace(H * 0.06, H * 0.94, g).astype(jnp.int32)
    mx, my = jnp.meshgrid(gx, gy)
    coords = jnp.stack([mx, my], -1).reshape(-1, 2)
    print(f"generating {g*g} probes, gt_spp={args.gt_spp} ...", flush=True)
    t0 = time.time()
    gen = jax.jit(lambda scene, key, c: datasetlib.generate_examples(
        scene, cam, cam_kind, key, c, hemi_size=args.hemi,
        gt_spp=args.gt_spp))
    # multiple jittered grids for a bigger set
    raws = []
    for rep in range(4):
        maps = gen(scene, jax.random.fold_in(key, rep),
                   coords + rep * 3)
        valid = np.asarray(maps["valid"])
        for i in range(coords.shape[0]):
            if valid[i]:
                raws.append({k: np.asarray(maps[k][i]) for k in "pdnz"})
    print(f"dataset: {len(raws)} examples in {time.time()-t0:.1f}s",
          flush=True)

    # ---- training ----
    state = trainlib.init_training(jax.random.PRNGKey(1),
                                   hemi_size=args.hemi)
    t0 = time.time()
    n_steps = 0
    losses = []
    while n_steps < args.batches:
        state, ls = trainlib.train(raws, state, jax.random.fold_in(key, n_steps),
                                   max_epochs=1, time_budget_s=1e9,
                                   log_every=20)
        losses += ls
        n_steps += len(ls)
        if not ls:
            break
    print(f"trained {n_steps} steps in {time.time()-t0:.1f}s; "
          f"loss {losses[0]:.4f} -> {np.mean(losses[-10:]):.4f}", flush=True)
    trainlib.save_checkpoint(args.out, state)
    print(f"saved {args.out}")

    if args.render:
        from pbrt_v3_iile_tpu.integrators import iispt as iisptlib
        from pbrt_v3_iile_tpu.utils import image as imglib

        net_vars = trainlib.inference_variables(state)
        combined, direct, indirect, stats = iisptlib.render_iile(
            sd, net_vars=net_vars, indirect_tasks=4, direct_samples=8,
            hemi_size=args.hemi, radius_start=16.0)
        imglib.write_png_tonemapped("iile_demo.png", combined, exposure=-2)
        imglib.write_exr("iile_demo.exr", combined)
        print("indirect mean:", indirect.mean(), "direct mean:",
              direct.mean(), stats)


if __name__ == "__main__":
    main()
