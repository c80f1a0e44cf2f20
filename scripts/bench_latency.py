"""Attribute the end-to-end render cost: per-device-call latency vs
kernel compute.  Times (a) a trivial jitted op round-trip, (b) one full
killeroo pass in scan mode vs staged mode, (c) the film add."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    log("devices:", jax.devices())

    # (a) per-call latency
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    f(x).block_until_ready()
    t0 = time.time()
    for _ in range(20):
        x = f(x)
    x.block_until_ready()
    log(f"trivial call latency (pipelined x20): {(time.time()-t0)/20*1e3:.2f} ms")
    t0 = time.time()
    for _ in range(20):
        f(x).block_until_ready()
    log(f"trivial call latency (sync each): {(time.time()-t0)/20*1e3:.2f} ms")

    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib

    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd.integrator.kind = "path"
    sd.integrator.max_depth = 5
    scene, cam = renderlib.build(sd)

    for staged in (True, False):
        cfg = renderlib.make_integrator_config(sd)._replace(
            staged=staged, use_pallas=True)
        run = renderlib.render_pass_fn(sd, cfg, chunk_rows=0)
        if not staged:
            run = jax.jit(run, static_argnums=())
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        try:
            L, jit_, aux = run(scene, cam, key, jnp.int32(0), jnp.int32(0))
            L.block_until_ready()
        except Exception as e:
            log(f"staged={staged}: FAILED {type(e).__name__}: {e}")
            continue
        log(f"staged={staged}: compile+first pass {time.time()-t0:.1f}s")
        t0 = time.time()
        reps = 3
        for p in range(1, reps + 1):
            L, jit_, aux = run(scene, cam, key, jnp.int32(p), jnp.int32(0))
        L.block_until_ready()
        dt = (time.time() - t0) / reps
        r = int(aux["rays"])
        log(f"staged={staged}: warm pass {dt*1e3:.0f} ms, {r} rays "
            f"-> {r/dt/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
