"""Time the MXU-dense cluster intersection vs the walkers on the chip.

All timings force a data-dependent scalar per rep (relay-proof; see
BENCH_NOTES.md).  Usage: python scripts/bench_clusters.py [--n 262144]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def force(out):
    s = 0.0
    for leaf in jax.tree.leaves(out):
        s += float(jnp.sum(leaf.astype(jnp.float32) * jnp.float32(1e-9)))
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--group", type=int, default=256)
    ap.add_argument("--maxc", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--scene",
                    default="/root/reference/scenes/killeroo-simple.pbrt")
    args = ap.parse_args()

    log("devices:", jax.devices())
    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib
    from pbrt_v3_iile_tpu.ops import intersect as isect
    from pbrt_v3_iile_tpu.ops import bvh as bvhlib
    from pbrt_v3_iile_tpu.ops import clusters as cllib
    from pbrt_v3_iile_tpu.ops import camera as camlib

    sd = apilib.load_scene(args.scene)
    scene, cam = renderlib.build(sd)
    p0 = np.asarray(scene.tri_p0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    flat = bvhlib.build_bvh(np.stack([p0, p0 + e1, p0 + e2], 1),
                            use_native=False)
    cs = cllib.build_clusters(flat, p0[flat.prim_order],
                              e1[flat.prim_order], e2[flat.prim_order])
    log(f"{p0.shape[0]} tris -> {cs.aabb_min.shape[0]} clusters")

    N = args.n
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 700, (N, 2)).astype(np.float32))
    o_p, d_p = camlib.generate_rays(cam, px)
    tm = jnp.full(N, 1e30)
    # incoherent wave: bounce-like rays from primary hits
    hit = isect.intersect(scene, o_p, d_p, tm)
    it = isect.make_interaction(scene, o_p, d_p, hit)
    from pbrt_v3_iile_tpu.ops import sampling as smp
    from pbrt_v3_iile_tpu.utils import vecmath as vm
    u = jnp.asarray(rng.uniform(size=(N, 2)).astype(np.float32))
    loc = smp.cosine_sample_hemisphere(u)
    tb_, bb_ = vm.coordinate_system(it.ns)
    d_b = vm.to_world(loc, tb_, bb_, it.ns)
    o_b = vm.offset_ray_origin(it.p, it.ng, d_b)
    perm = jnp.asarray(rng.permutation(N))
    o_s, d_s = jnp.take(o_b, perm, axis=0), jnp.take(d_b, perm, axis=0)

    waves = {"primary": (o_p, d_p), "bounce": (o_b, d_b),
             "bounce_shuffled": (o_s, d_s)}

    # amortize the relay's per-call latency floor (hundreds of ms when
    # degraded): run AMORT chained intersects inside one jit; per-
    # intersect time = call_time / AMORT.  Chaining through t_max stops
    # CSE from collapsing the repeats.
    AMORT = int(os.environ.get("BENCH_AMORT", "8"))

    def amortize(one):
        def run(o, d, t):
            def body(tm_c, i):
                r = one(o, d, tm_c * (1.0 + 1e-7 * i))
                tval = r[0] if isinstance(r, tuple) else r.t
                return jnp.maximum(tm_c, 0.0 * tval + t), jnp.sum(tval)
            _, sums = jax.lax.scan(body, t, jnp.arange(AMORT,
                                                       dtype=jnp.float32))
            return sums
        return jax.jit(run)

    gfun = amortize(lambda o, d, t: cllib.intersect_grouped(
        cs, o, d, t, group=args.group, max_candidates=args.maxc,
        chunk=args.chunk))
    wfun = amortize(lambda o, d, t: isect.intersect(scene, o, d, t))
    pfun = amortize(lambda o, d, t: isect.intersect(scene, o, d, t,
                                                    use_pallas=True))

    for kname, f in [("clusters", gfun), ("xla_walker", wfun),
                     ("pallas_packet", pfun)]:
        for wname, (o, d) in waves.items():
            try:
                t0 = time.time()
                force(f(o, d, tm))
                tc = time.time() - t0
                t0 = time.time()
                for _ in range(args.reps):
                    force(f(o, d, tm))
                dt = (time.time() - t0) / args.reps / AMORT
                log(f"{kname:14s} {wname:16s} compile {tc:6.1f}s  "
                    f"warm/amort {dt * 1e3:9.2f} ms  "
                    f"{N / dt / 1e6:8.2f} Mrays/s")
            except Exception as e:
                log(f"{kname:14s} {wname:16s} FAILED "
                    f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
