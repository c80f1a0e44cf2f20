"""Decompose the killeroo pass: amortized fused closest/any-hit wave
cost at current defaults vs whole-pass time (small chained programs —
safe for the relay)."""
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

REPS = 4


def amortized(label, fn, *args, n=2):
    @jax.jit
    def chain(o, d, t):
        def body(c, _):
            h = fn(o, d, t + 0.0 * c[:1].sum())
            return h, None
        r, _ = jax.lax.scan(body, t, jnp.arange(REPS))
        return r
    float(jnp.sum(chain(*args)))
    best = 1e30
    for _ in range(n):
        t0 = time.time()
        float(jnp.sum(chain(*args)))
        best = min(best, time.time() - t0)
    per = best / REPS
    print(f"{label}: {per*1e3:.1f} ms/wave amortized", flush=True)
    return per


def main():
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd.integrator.kind = "path"
    sd.integrator.max_depth = 5
    scene, cam = renderlib.build(sd, with_clusters=True)
    prep, _ = renderlib.make_wave_prep(sd)
    key = jax.random.PRNGKey(0)
    o, d, w, jit_, k, ctx, rt = jax.jit(prep)(cam, key, 1, 0)
    t_max = jnp.full((o.shape[0],), 1e30)
    kd = jax.random.PRNGKey(7)
    d2 = jax.random.permutation(kd, d, axis=0)

    def fused(o, d, t):
        return isect.intersect(scene, o, d, t, accel="clusters").t

    def fused_any(o, d, t):
        return isect.intersect(scene, o, d, t, accel="clusters",
                               any_hit=True).t

    c = amortized("fused closest primary", fused, o, d, t_max)
    a = amortized("fused any-hit primary", fused_any, o, d, t_max)
    s = amortized("fused closest shuffled", fused, o, d2, t_max)
    print(f"rough pass model: 1 primary closest ({c*1e3:.0f}) + "
          f"6 shadow (~{a*1e3:.0f} ea) + 5 bounce closest "
          f"(~{s*1e3:.0f} ea) = "
          f"{(c + 6 * a + 5 * s):.2f} s vs measured pass ~2.0 s",
          flush=True)


if __name__ == "__main__":
    main()
