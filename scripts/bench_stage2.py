"""Stage attribution part 2: fused intersect / occluded at per-bounce
wave sizes (small chained programs, REPS=4)."""
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
from pbrt_v3_iile_tpu.ops import clusters as cluster_lib

REPS = 4


def amortized(label, fn, args, n=2):
    @jax.jit
    def chain(args):
        def body(c, i):
            r = fn(args, i + 0 * c)
            return c + jnp.sum(r.astype(jnp.float32)) * 0, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return c

    float(chain(args))
    best = 1e30
    for _ in range(n):
        t0 = time.time()
        float(chain(args))
        best = min(best, time.time() - t0)
    per = best / REPS
    print(f"{label}: {per * 1e3:7.2f} ms", flush=True)
    return per


def main():
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd.integrator.kind = "path"
    sd.integrator.max_depth = 5
    scene, cam = renderlib.build(sd, with_clusters=True)
    prep, _ = renderlib.make_wave_prep(sd)
    key = jax.random.PRNGKey(0)
    o, d, w, jit_, k, ctx, rt = jax.jit(prep)(cam, key, 1, 0)
    N = (o.shape[0] // 64) * 64
    o, d = o[:N], d[:N]
    t_max = jnp.full((N,), 1e30)
    d2 = jax.random.permutation(jax.random.PRNGKey(7), d, axis=0)

    sk2 = cluster_lib.sort_key6(o, d2, scene.world_min, scene.world_max)
    p2 = jnp.argsort(sk2)
    ob, db, t2 = o[p2], d2[p2], t_max

    def stage_intersect(a, i):
        o_, d_, t_ = a
        return isect.intersect(scene, o_, d_ + 0.0 * i, t_,
                               accel="clusters", presorted=True,
                               cluster_group=64, cluster_maxc=192).t

    def stage_occluded(a, i):
        o_, d_, t_ = a
        return isect.occluded(scene, o_, d_ + 0.0 * i, t_,
                              accel="clusters", presorted=True,
                              cluster_group=64, cluster_maxc=192)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sizes = [N, N // 2, N // 4, N // 8]
    if which in ("all", "int"):
        for s in sizes:
            amortized(f"intersect bounce n={s}", stage_intersect,
                      (ob[:s], db[:s], t2[:s]))
    if which in ("all", "occ"):
        for s in sizes:
            amortized(f"occluded  bounce n={s}", stage_occluded,
                      (ob[:s], db[:s], t2[:s]))
    if which in ("all", "prim"):
        sk = cluster_lib.sort_key6(o, d, scene.world_min, scene.world_max)
        p = jnp.argsort(sk)
        amortized(f"intersect primary n={N}", stage_intersect,
                  (o[p], d[p], t_max))


if __name__ == "__main__":
    main()
