"""Weak-scaling overhead on the virtual CPU mesh (VERDICT r3 weak #6):
fixed per-device work, 1 vs 8 virtual devices.  The interesting number
is the sharded pass's parallel OVERHEAD (halo/collective/film-merge
structure), not CPU speed — on a virtual mesh all devices share the
host's cores, so the honest comparison is total WORK-normalized time:

  overhead% = (t_sharded(8 dev, 8x rows) / (8 * t_single(1x rows)) - 1)

on a CPU where the 8 "devices" serialize onto the same cores; values
near 0 mean the sharded program adds no structural cost beyond the
unsharded compute it contains.
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.parallel import mesh as meshlib
from pbrt_v3_iile_tpu.parallel import sharded as shardlib


def timed(fn, *args, n=3):
    fn(*args)
    best = 1e30
    for _ in range(n):
        t0 = time.time()
        r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    return best


def main():
    n_dev = len(jax.devices())
    assert n_dev == 8, n_dev
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd.integrator.kind = "path"
    sd.integrator.max_depth = 3
    # 8 rows per device; sharded image = 64 rows, single = 8 rows
    sd.film.x_resolution = 256
    sd.film.y_resolution = 64
    scene, cam = renderlib.build(sd, with_clusters=False)
    key = jax.random.PRNGKey(0)

    mesh = meshlib.make_mesh(n_dev)
    run_sh = shardlib.sharded_render_pass(sd, mesh)
    t_sh = timed(lambda: run_sh(scene, cam, key, 1))

    sd1 = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd1.integrator.kind = "path"
    sd1.integrator.max_depth = 3
    sd1.film.x_resolution = 256
    sd1.film.y_resolution = 64 // n_dev
    scene1, cam1 = renderlib.build(sd1, with_clusters=False)
    cfg1 = renderlib.make_integrator_config(sd1)
    run1 = jax.jit(renderlib.render_pass_fn(sd1, cfg1), static_argnums=(4,))
    t_1 = timed(lambda: run1(scene1, cam1, key, 1))

    overhead = t_sh / (n_dev * t_1) - 1.0
    print(f"sharded {n_dev}-device pass (64 rows): {t_sh*1e3:.0f} ms; "
          f"single-device pass (8 rows): {t_1*1e3:.0f} ms; "
          f"work-normalized overhead = {overhead*100:+.1f}%", flush=True)
    import json
    print(json.dumps({"n_devices": n_dev, "t_sharded_s": round(t_sh, 4),
                      "t_single_s": round(t_1, 4),
                      "weak_scaling_overhead": round(overhead, 4)}),
          flush=True)


if __name__ == "__main__":
    main()
