"""Time the XLA-side prep of the fused path (sort, cull, candidate
ordering) separately from the Pallas kernel, on the chip."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.ops import clusters as cl


def timed(label, fn, *args, n=3):
    fn(*args)
    best = 1e30
    for _ in range(n):
        t0 = time.time()
        r = fn(*args)
        float(jnp.sum(r))
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)


def main():
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    scene, cam = renderlib.build(sd, with_clusters=True)
    cp = scene.clusters
    prep, _ = renderlib.make_wave_prep(sd)
    key = jax.random.PRNGKey(0)
    o, d, w, jitter, k, ctx, rtime = jax.jit(prep)(cam, key, 1, 0)
    N = o.shape[0]
    G = 256
    MAXC = 64
    padn = (-N) % G
    if padn:
        o = jnp.concatenate([o, jnp.zeros((padn, 3))])
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[1.0, 0, 0]]),
                                         (padn, 1))])
    N = o.shape[0]
    t_max = jnp.full((N,), 1e30)

    @jax.jit
    def ray_sort(o, d, t):
        key = cl.sort_key(o, d, scene.world_min, scene.world_max)
        key = jnp.where(t > 0, key, jnp.int32(0x7FFFFFFF))
        perm = jnp.argsort(key)
        inv = jnp.argsort(perm)
        return perm.astype(jnp.float32).sum() + inv[0]

    timed("ray argsort x2", ray_sort, o, d, t_max)

    @jax.jit
    def cull(o, d, t):
        mask, tnear = cl.group_cull_tnear(o, d, t, cp.aabb_min,
                                          cp.aabb_max, G)
        return jnp.sum(mask)

    timed("group cull", cull, o, d, t_max)

    @jax.jit
    def cand_order(o, d, t):
        mask, tnear = cl.group_cull_tnear(o, d, t, cp.aabb_min,
                                          cp.aabb_max, G)
        okey = jnp.where(mask, tnear, 3.0e38)
        order = jnp.argsort(okey, axis=1)[:, :MAXC]
        return jnp.sum(order)

    timed("cull + cand argsort(K)", cand_order, o, d, t_max)

    @jax.jit
    def cand_topk(o, d, t):
        mask, tnear = cl.group_cull_tnear(o, d, t, cp.aabb_min,
                                          cp.aabb_max, G)
        okey = jnp.where(mask, tnear, 3.0e38)
        neg, idx = jax.lax.top_k(-okey, MAXC)
        return jnp.sum(idx)

    timed("cull + cand top_k", cand_topk, o, d, t_max)

    @jax.jit
    def gather_unperm(o):
        perm = jnp.argsort(o[:, 0])
        return o[perm].sum()

    timed("one f32 gather-by-perm", gather_unperm, o)


if __name__ == "__main__":
    main()
