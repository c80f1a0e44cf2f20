"""Differential whole-pass attribution: time the full killeroo compact
pass under feature knockouts (depth sweep, NEE off) — end-to-end
differences attribute cost to bounces and to the NEE/shadow half
without isolating stages (each variant is the real pipeline).

Each variant = the exact bench.py measurement protocol (warm pass, then
timed synced passes)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.utils import image as imglib


def timed_pass(sd, cfg_mut=None, label="", n=3):
    cfg = renderlib.make_integrator_config(sd)
    cfg = cfg._replace(compact_schedule=(1.0, 1.0, 0.5, 0.25, 0.25, 0.125))
    if cfg_mut:
        cfg = cfg._replace(**cfg_mut)
    print(f"[{label}] building scene...", flush=True)
    scene, cam = renderlib.build(sd, with_clusters=True)
    run_fn = renderlib.render_pass_fn(sd, cfg)
    run = jax.jit(run_fn, static_argnums=(4,))
    key = jax.random.PRNGKey(0)
    print(f"[{label}] compiling...", flush=True)
    t0 = time.time()
    L, jit_, aux = run(scene, cam, key, 0, 0)
    float(jnp.sum(L))  # data-dependent sync (relay ACKs b_u_r early)
    print(f"[{label}] compiled+warm in {time.time() - t0:.0f}s", flush=True)
    best = 1e30
    for i in range(1, n + 1):
        t0 = time.time()
        L, jit_, aux = run(scene, cam, key, i, 0)
        float(jnp.sum(L))
        best = min(best, time.time() - t0)
    rays = int(aux["rays"]) if "rays" in aux else -1
    print(f"{label}: {best * 1e3:7.1f} ms/pass  rays={rays}", flush=True)
    return best


def main():
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd.integrator.kind = "path"

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    res = {}
    if which in ("all", "depth"):
        for md in (0, 1, 2, 3, 5):
            sd.integrator.max_depth = md
            res[f"d{md}"] = timed_pass(sd, label=f"pass depth={md}")
    if which in ("all", "nee"):
        sd.integrator.max_depth = 5
        res["nonee"] = timed_pass(sd, dict(nee=False),
                                  label="pass depth=5 NEE OFF")
    if "d5" in res and "nonee" in res:
        print(f"NEE+shadow total: {(res['d5'] - res['nonee']) * 1e3:.1f} ms",
              flush=True)
    if "d0" in res and "d1" in res:
        print(f"bounce-1 increment: {(res['d1'] - res['d0']) * 1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
