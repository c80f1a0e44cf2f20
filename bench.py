"""Benchmark: Mrays/s on killeroo-simple (path integrator) on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 100 — the BASELINE.md north-star target of
100 Mrays/s/chip forward (the reference publishes no rays/s figure; its
whole-frame numbers are an i7-4770 CPU, see BASELINE.md).
"""

import json
import os
import sys
import time

TARGET_MRAYS = 100.0


def main():
    import jax

    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib

    scene_path = os.environ.get(
        "BENCH_SCENE", "/root/reference/scenes/killeroo-simple.pbrt")
    sd = apilib.load_scene(scene_path)
    sd.integrator.kind = "path"
    sd.integrator.max_depth = 5

    scene, cam = renderlib.build(sd)
    cfg = renderlib.make_integrator_config(sd)
    run = jax.jit(renderlib.render_pass_fn(sd, cfg))
    key = jax.random.PRNGKey(0)

    # warmup / compile
    L, jit_, rays = run(scene, cam, key, 0)
    L.block_until_ready()

    spp = int(os.environ.get("BENCH_SPP", "8"))
    t0 = time.time()
    total_rays = 0
    outs = []
    for p in range(1, spp + 1):
        L, _, rays = run(scene, cam, key, p)
        outs.append((L, rays))
    for L, rays in outs:
        L.block_until_ready()
        total_rays += int(rays)
    dt = time.time() - t0
    mrays = total_rays / dt / 1e6

    print(json.dumps({
        "metric": "killeroo_path_mrays_per_s_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
