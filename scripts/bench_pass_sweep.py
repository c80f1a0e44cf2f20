"""Full-pass sweep of fused-kernel (cluster_group, cluster_maxc) on
killeroo; one warm pass per config, data-dependent sync."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib


def main():
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd.integrator.kind = "path"
    sd.integrator.max_depth = 5
    scene, cam = renderlib.build(sd, with_clusters=True)
    key = jax.random.PRNGKey(0)

    for G, M in ((64, 48), (64, 64), (128, 48), (128, 64), (128, 96),
                 (256, 64)):
        cfg = renderlib.make_integrator_config(sd)._replace(
            cluster_group=G, cluster_maxc=M)
        run = renderlib.render_pass_fn(sd, cfg)
        L, _, aux = run(scene, cam, key, 0, 0)   # warm
        float(jnp.sum(L))
        best = 1e30
        for p in (1, 2):
            t0 = time.time()
            L, _, aux = run(scene, cam, key, p, 0)
            float(jnp.sum(L))
            best = min(best, time.time() - t0)
        rays = int(aux["rays"])
        print(f"G={G:4d} MAXC={M:4d}: {best:.3f} s/pass "
              f"({rays / best / 1e6:.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
