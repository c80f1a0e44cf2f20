"""Sweep fused-kernel (group, MAXC) on killeroo waves; TPU."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.ops import intersect as isect


def timed(fn, *args, n=2):
    fn(*args)[0].block_until_ready()
    best = 1e30
    for _ in range(n):
        t0 = time.time()
        r = fn(*args)
        float(jnp.sum(r[0]))
        best = min(best, time.time() - t0)
    return best


def main():
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd.integrator.kind = "path"
    scene, cam = renderlib.build(sd, with_clusters=True)
    prep, _ = renderlib.make_wave_prep(sd)
    key = jax.random.PRNGKey(0)
    o, d, w, jitter, k, ctx, rtime = jax.jit(prep)(cam, key, 1, 0)
    N = o.shape[0]
    t_max = jnp.full((N,), 1e30)
    kd = jax.random.PRNGKey(7)
    d2 = jax.random.permutation(kd, d, axis=0)

    for G in (128, 256, 512):
        for MAXC in (32, 64, 128, 192):
            fused = jax.jit(lambda o, d, t, G=G, M=MAXC: (isect.intersect(
                scene, o, d, t, accel="clusters", cluster_group=G,
                cluster_maxc=M).t,))
            tp = timed(fused, o, d, t_max)
            ts = timed(fused, o, d2, t_max)
            print(f"G={G:4d} MAXC={MAXC:4d}: primary {tp:.3f}s "
                  f"({N/tp/1e6:5.1f} Mr/s)  shuffled {ts:.3f}s "
                  f"({N/ts/1e6:5.1f} Mr/s)", flush=True)


if __name__ == "__main__":
    main()
