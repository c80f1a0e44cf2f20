"""Amortized (chained) traversal timings: true per-wave kernel cost with
the relay's ~26 ms dispatch floor amortized over REPS dependent calls.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.ops import intersect as isect

REPS = 8


def chained(label, make_fn, o, d, t_max, n=2):
    @jax.jit
    def run(o, d, t):
        def body(carry, _):
            t_prev = carry
            hit_t = make_fn(o, d, t + 0.0 * t_prev[:1].sum())
            return hit_t, None
        tfin, _ = jax.lax.scan(body, t, jnp.arange(REPS))
        return tfin

    float(jnp.sum(run(o, d, t_max)))
    best = 1e30
    for _ in range(n):
        t0 = time.time()
        float(jnp.sum(run(o, d, t_max)))
        best = min(best, time.time() - t0)
    N = o.shape[0]
    per = best / REPS
    print(f"{label}: {per*1e3:.1f} ms/wave amortized "
          f"({N/per/1e6:.1f} Mrays/s)", flush=True)


def main():
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    scene, cam = renderlib.build(sd, with_clusters=True)
    prep, _ = renderlib.make_wave_prep(sd)
    key = jax.random.PRNGKey(0)
    o, d, w, jitter, k, ctx, rtime = jax.jit(prep)(cam, key, 1, 0)
    t_max = jnp.full((o.shape[0],), 1e30)
    kd = jax.random.PRNGKey(7)
    d2 = jax.random.permutation(kd, d, axis=0)

    def packet(o, d, t):
        return isect.intersect(scene, o, d, t, use_pallas=True).t

    cases = [("packet", packet)]
    for G, M in ((128, 64), (256, 128), (512, 192)):
        def fused(o, d, t, G=G, M=M):
            return isect.intersect(scene, o, d, t, accel="clusters",
                                   cluster_group=G, cluster_maxc=M).t
        cases.append((f"fused G={G} MAXC={M}", fused))

    for label, fn in cases:
        try:
            chained(label + " primary", fn, o, d, t_max)
            chained(label + " shuffled", fn, o, d2, t_max)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
