"""TPU validation ladder: escalate from a tiny intersect to the full
killeroo benchmark in ONE process, printing progress after each rung.
Run under `timeout` with a generous budget.
"""

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


def main():
    log("devices:", jax.devices())
    from pbrt_v3_iile_tpu.scene import api as apilib, device as devlib
    from pbrt_v3_iile_tpu.ops import intersect as isect
    from pbrt_v3_iile_tpu.integrators import render as renderlib

    # ---- rung 1: intersect-only on the killeroo BVH ----
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    scene, cam = renderlib.build(sd)
    N = 4096
    rng = np.random.default_rng(0)
    from pbrt_v3_iile_tpu.ops import camera as camlib
    pix = jnp.asarray(rng.uniform(0, 700, (N, 2)).astype(np.float32))
    o, d = camlib.generate_rays(cam, pix)
    f = jax.jit(lambda s, o, d: isect.intersect(s, o, d, jnp.full(N, 1e30)))
    t0 = time.time()
    hit = f(scene, o, d)
    hit.t.block_until_ready()
    log(f"rung1 intersect killeroo: compile+run {time.time()-t0:.1f}s, "
        f"hits {int(hit.valid.sum())}/{N}")
    t0 = time.time()
    for _ in range(10):
        hit = f(scene, o, d)
    hit.t.block_until_ready()
    per = (time.time() - t0) / 10
    log(f"rung1 warm: {per*1e3:.2f} ms -> {N/per/1e6:.1f} Mrays/s")

    # ---- rung 2: small render ----
    sd.film.x_resolution = 128
    sd.film.y_resolution = 128
    t0 = time.time()
    img, stats = renderlib.render(sd, spp=2)
    log(f"rung2 128x128@2spp: {stats} (total {time.time()-t0:.1f}s), "
        f"mean {img.mean():.3f}")

    # ---- rung 3: full res ----
    sd.film.x_resolution = 700
    sd.film.y_resolution = 700
    t0 = time.time()
    img, stats = renderlib.render(sd, spp=4)
    log(f"rung3 700x700@4spp: {stats} (total {time.time()-t0:.1f}s)")
    t0 = time.time()
    img, stats = renderlib.render(sd, spp=8)
    log(f"rung3 warm 8spp: {stats}")
    np.save("/tmp/killeroo_tpu.npy", img)

    # ---- rung 4: pallas packet kernel ----
    try:
        from pbrt_v3_iile_tpu.ops import intersect_pallas as ipl
        fp = jax.jit(lambda s, o, d: ipl.intersect_bvh_pallas(
            s, o, d, jnp.full(N, 1e30)))
        t0 = time.time()
        hp = fp(scene, o, d)
        hp.t.block_until_ready()
        log(f"rung4 pallas compile+run {time.time()-t0:.1f}s, "
            f"hits {int(hp.valid.sum())}")
        agree = int((np.asarray(hp.prim >= 0) ==
                     np.asarray(hit.prim >= 0)).sum())
        log(f"rung4 agreement with XLA: {agree}/{N}")
        t0 = time.time()
        for _ in range(10):
            hp = fp(scene, o, d)
        hp.t.block_until_ready()
        per = (time.time() - t0) / 10
        log(f"rung4 pallas warm: {per*1e3:.2f} ms -> {N/per/1e6:.1f} Mrays/s "
            f"(coherent primary rays)")
    except Exception as e:
        log(f"rung4 pallas FAILED: {type(e).__name__}: {e}")

    log("ladder complete")


if __name__ == "__main__":
    main()
