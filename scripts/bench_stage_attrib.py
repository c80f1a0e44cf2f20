"""Per-stage attribution of the compacted-wavefront killeroo pass.

Times each pipeline stage amortized on-chip (REPS chained inside one
jitted scan so the relay sync floor cancels), at the real per-bounce
wave sizes of the compact schedule, and prints a pass model vs the
measured pass.  Also prints the live fraction after each bounce so the
compact_schedule budgets can be set from data.
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
from pbrt_v3_iile_tpu.ops import clusters as cluster_lib

REPS = 8


def amortized(label, make_fn, args, n=3):
    """make_fn(args, i) -> array; chained REPS times in one program."""
    fn = make_fn

    @jax.jit
    def chain(args):
        def body(c, i):
            r = fn(args, i + 0 * c)
            return c + jnp.sum(r).astype(jnp.float32) * 0, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return c

    float(chain(args))  # compile+warm
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
    print(f"wave N={N}", flush=True)
    t_max = jnp.full((N,), 1e30)
    kd = jax.random.PRNGKey(7)
    d2 = jax.random.permutation(kd, d, axis=0)  # bounce-like directions

    cp = scene.clusters
    K = cp.aabb_min.shape[0]
    G = 64
    print(f"clusters K={K}", flush=True)

    cfg = renderlib.make_integrator_config(sd)
    print(f"cfg maxc={cfg.cluster_maxc} group={cfg.cluster_group}",
          flush=True)

    # --- stage timings at a representative full wave (sorted rays)
    skey = cluster_lib.sort_key6(o, d, scene.world_min, scene.world_max)
    perm = jnp.argsort(skey)
    os_, ds_ = o[perm], d[perm]
    d2s = d2[perm]

    def stage_sort15(a, i):
        o_, d_, t_ = a
        sk = cluster_lib.sort_key6(o_, d_, scene.world_min, scene.world_max)
        ops = [sk + i, o_[:, 0], o_[:, 1], o_[:, 2], d_[:, 0], d_[:, 1],
               d_[:, 2], t_, t_, t_, t_, t_,
               jnp.arange(o_.shape[0], dtype=jnp.int32),
               jnp.zeros(o_.shape[0], jnp.int32),
               jnp.ones(o_.shape[0], jnp.int32)]
        return jax.lax.sort(tuple(ops), dimension=0, num_keys=1)[1]

    def stage_cull(a, i):
        o_, d_, t_ = a
        m, tn = cluster_lib.per_ray_cull(o_, d_ + 0.0 * i, t_,
                                         cp.aabb_min, cp.aabb_max, G)
        return tn

    def stage_candsort(a, i):
        mask, tnear = a
        big = jnp.float32(3.0e38)
        Gn = mask.shape[0]
        okey = jnp.where(mask, tnear + 0.0 * i, big)
        cid = jnp.arange(K, dtype=jnp.int32)
        packed = cp.tri_off * 256 + cp.tri_cnt
        ctn, cand, pk = jax.lax.sort(
            (okey, jnp.broadcast_to(cid, (Gn, K)),
             jnp.broadcast_to(packed, (Gn, K))), dimension=1, num_keys=1)
        return ctn[:, :192]

    def stage_intersect(a, i):
        o_, d_, t_ = a
        return isect.intersect(scene, o_, d_ + 0.0 * i, t_,
                               accel="clusters", presorted=True,
                               cluster_group=G, cluster_maxc=192).t

    def stage_occluded(a, i):
        o_, d_, t_ = a
        return isect.occluded(scene, o_, d_ + 0.0 * i, t_,
                              accel="clusters", presorted=True,
                              cluster_group=G, cluster_maxc=192)

    sizes = [N, N, N // 2, N // 4, N // 4, N // 8]
    # align sizes to G
    sizes = [max(G, (s // G) * G) for s in sizes]

    print("--- full-wave stages (N, primary dirs sorted)", flush=True)
    t_sort = amortized("  sort15 (resort)", stage_sort15, (os_, ds_, t_max))
    t_cull = amortized("  per_ray_cull", stage_cull, (os_, ds_, t_max))
    mask, tnear = cluster_lib.per_ray_cull(os_, ds_, t_max,
                                           cp.aabb_min, cp.aabb_max, G)
    t_csort = amortized("  cand sort (Gn,K)", stage_candsort, (mask, tnear))
    t_int = amortized("  intersect full", stage_intersect, (os_, ds_, t_max))
    t_occ = amortized("  occluded full", stage_occluded, (os_, ds_, t_max))

    print("--- full-wave stages (N, shuffled bounce-like dirs)", flush=True)
    sk2 = cluster_lib.sort_key6(os_, d2s, scene.world_min, scene.world_max)
    p2 = jnp.argsort(sk2)
    ob, db = os_[p2], d2s[p2]
    t_int_b = amortized("  intersect bounce", stage_intersect,
                        (ob, db, t_max))
    mb, tb = cluster_lib.per_ray_cull(ob, db, t_max,
                                      cp.aabb_min, cp.aabb_max, G)
    nc = jnp.sum(mb, 1)
    print(f"  bounce wave: mean cand/group={float(jnp.mean(nc)):.1f} "
          f"p99={float(jnp.percentile(nc, 99)):.0f} "
          f"max={int(jnp.max(nc))}", flush=True)

    print("--- per-size intersect+occluded (bounce dirs)", flush=True)
    tot_model = 0.0
    for b, s in enumerate(sizes):
        oo, dd, tt = ob[:s], db[:s], t_max[:s]
        ti = amortized(f"  b{b} intersect  (n={s})", stage_intersect,
                       (oo, dd, tt), n=2)
        to = amortized(f"  b{b} occluded   (n={s})", stage_occluded,
                       (oo, dd, tt), n=2)
        ts = amortized(f"  b{b} sort15     (n={s})", stage_sort15,
                       (oo, dd, tt), n=2)
        tot_model += ti + to + ts

    print(f"--- pass model: sum(intersect+occluded+sort per bounce) = "
          f"{tot_model * 1e3:.0f} ms  (measured pass ~563 ms; gap = "
          f"shading/NEE/film/misc)", flush=True)
    print(f"--- full-wave reference: sort15={t_sort*1e3:.1f} "
          f"cull={t_cull*1e3:.1f} candsort={t_csort*1e3:.1f} "
          f"intersect={t_int*1e3:.1f} (bounce {t_int_b*1e3:.1f}) "
          f"occluded={t_occ*1e3:.1f}", flush=True)


if __name__ == "__main__":
    main()
