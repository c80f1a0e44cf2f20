"""Per-bounce stage timing of one killeroo pass on the chip (fused
accel), with data-dependent syncs per stage via PBRT stats."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.utils import stats as statslib


def main():
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd.integrator.kind = "path"
    sd.integrator.max_depth = 5
    cfg = renderlib.make_integrator_config(sd)
    print("accel:", cfg.accel, "staged:", cfg.staged, flush=True)
    scene, cam = renderlib.build(sd, with_clusters=cfg.accel == "clusters")
    run = renderlib.render_pass_fn(sd, cfg)
    key = jax.random.PRNGKey(0)

    # warmup
    L, _, aux = run(scene, cam, key, 0, 0)
    float(jnp.sum(L))

    statslib.enable(True)
    statslib.reset()
    t0 = time.time()
    L, _, aux = run(scene, cam, key, 1, 0)
    float(jnp.sum(L))
    total = time.time() - t0
    print(f"pass total {total:.3f}s rays={int(aux['rays'])}", flush=True)
    print(statslib.report(), flush=True)


if __name__ == "__main__":
    main()
