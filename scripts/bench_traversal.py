"""Traversal microbenchmark: rays/s for each intersect kernel on the
killeroo BVH, primary vs bounce waves, sorted vs unsorted, closest/any.

This is the attribution tool for the renderer's hot loop (the reference's
equivalent hot loop is BVHAccel::Intersect, src/accelerators/bvh.cpp:662).
Run on the TPU (or CPU with PYTHONPATH=. JAX_PLATFORMS=cpu) under timeout:

    timeout 900 python scripts/bench_traversal.py [--n 65536] [--reps 5]
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


def make_waves(scene, cam, N, seed=0):
    """Returns dict of named (o, d) ray waves."""
    from pbrt_v3_iile_tpu.ops import camera as camlib
    from pbrt_v3_iile_tpu.ops import intersect as isect
    from pbrt_v3_iile_tpu.ops import sampling as smp

    rng = np.random.default_rng(seed)
    H = W = int(np.sqrt(N))
    # coherent primary rays: contiguous pixel block
    px = jnp.asarray(
        np.stack(np.meshgrid(np.arange(W), np.arange(H)), -1)
        .reshape(-1, 2).astype(np.float32) * (700.0 / W))
    o_p, d_p = camlib.generate_rays(cam, px[:N])

    # bounce rays: start at primary hit points, cosine-sample around normal
    hit = isect.intersect(scene, o_p, d_p, jnp.full(N, 1e30))
    it = isect.make_interaction(scene, o_p, d_p, hit)
    u = jnp.asarray(rng.uniform(size=(N, 2)).astype(np.float32))
    from pbrt_v3_iile_tpu.utils import vecmath as vm
    local = smp.cosine_sample_hemisphere(u)
    t, b = vm.coordinate_system(it.ns)
    d_b = vm.to_world(local, t, b, it.ns)
    o_b = vm.offset_ray_origin(it.p, it.ng, d_b)
    # rays that missed: re-point at scene center so every ray works
    ctr = 0.5 * (scene.world_min + scene.world_max)
    d_b = jnp.where(hit.valid[:, None], d_b,
                    (ctr[None] - o_p) / jnp.maximum(
                        jnp.linalg.norm(ctr[None] - o_p, axis=-1,
                                        keepdims=True), 1e-6))
    o_b = jnp.where(hit.valid[:, None], o_b, o_p)
    # shuffled bounce rays = worst-case incoherence
    perm = jnp.asarray(rng.permutation(N))
    return {
        "primary": (o_p, d_p),
        "bounce": (o_b, d_b),
        "bounce_shuffled": (jnp.take(o_b, perm, axis=0),
                            jnp.take(d_b, perm, axis=0)),
    }


def _force(out):
    """Bring a data-dependent scalar to the host.  block_until_ready on
    the axon relay can ACK before the computation finishes (measured
    584 'Mrays/s' that way vs 0.6 real — see BENCH_NOTES.md); a value
    computed from the result cannot lie."""
    s = 0.0
    for leaf in jax.tree.leaves(out):
        s += float(jnp.sum(leaf.astype(jnp.float32)
                           * jnp.float32(1e-9)))
    return s


def time_fn(f, *args, reps=5):
    _force(f(*args))
    t0 = time.time()
    for _ in range(reps):
        _force(f(*args))
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scene", default="/root/reference/scenes/killeroo-simple.pbrt")
    ap.add_argument("--kernels", default="xla,pallas")
    args = ap.parse_args()

    log("devices:", jax.devices())
    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib
    from pbrt_v3_iile_tpu.ops import intersect as isect

    sd = apilib.load_scene(args.scene)
    scene, cam = renderlib.build(sd)
    T = int(scene.tri_p0.shape[0])
    M = int(scene.nodes_packed.shape[0])
    log(f"scene: {T} tris, {M} BVH nodes")

    N = args.n
    waves = make_waves(scene, cam, N)
    tm = jnp.full(N, 1e30)

    kernels = args.kernels.split(",")
    results = {}
    for kname in kernels:
        use_pallas = kname == "pallas"
        for sort in ([False, True] if use_pallas else [False]):
            for any_hit in [False, True]:
                f = jax.jit(lambda s, o, d, t, up=use_pallas, so=sort,
                            ah=any_hit: isect.intersect(
                                s, o, d, t, any_hit=ah, use_pallas=up,
                                sort=so))
                for wname, (o, d) in waves.items():
                    tag = (f"{kname}{'+sort' if sort else ''}"
                           f"{'/any' if any_hit else ''} {wname}")
                    try:
                        dt = time_fn(f, scene, o, d, tm, reps=args.reps)
                        mrays = N / dt / 1e6
                        results[tag] = mrays
                        log(f"{tag:42s} {dt*1e3:9.2f} ms  {mrays:8.2f} Mrays/s")
                    except Exception as e:
                        log(f"{tag:42s} FAILED: {type(e).__name__}: {e}")
    print(flush=True)
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{v:10.2f} Mrays/s  {k}", flush=True)


if __name__ == "__main__":
    main()
