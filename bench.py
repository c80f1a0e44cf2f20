"""Benchmark: Mrays/s on killeroo-simple (path integrator) on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 100 — the BASELINE.md north-star target of
100 Mrays/s/chip forward (the reference publishes no rays/s figure; its
whole-frame numbers are an i7-4770 CPU, see BASELINE.md).

Measurement rules (VERDICT r1 weak #4/#7): the render runs in its
intended configuration — staged wavefront mode drives its own jitted
bounce steps, with NO outer jit around the host loop; a full warmup pass
is excluded from timing; the ray count includes shadow rays (path.py
counts both segment and occlusion rays).  A breakdown (primary-wave vs
full-path) goes to stderr; the driver consumes only the JSON line.
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

TARGET_MRAYS = 100.0


def _tpu_alive(timeout_s: int = 150) -> bool:
    """Probe the TPU in a subprocess (a wedged TPU relay can hang the
    whole interpreter at import time)."""
    code = ("import jax, jax.numpy as jnp;"
            "assert float((jnp.ones((64,64))@jnp.ones((64,64))).sum())>0")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # wait up to ~12 min for the chip; fall back to CPU (honestly slow)
    # rather than hanging the driver
    deadline = time.time() + float(os.environ.get("BENCH_TPU_WAIT_S", "720"))
    while not _tpu_alive():
        if time.time() > deadline:
            print("bench: TPU unavailable, falling back to CPU",
                  file=sys.stderr)
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)
            os.environ.pop("PYTHONPATH", None)
            break
        time.sleep(30)

    import jax

    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib

    scene_path = os.environ.get(
        "BENCH_SCENE", "/root/reference/scenes/killeroo-simple.pbrt")
    sd = apilib.load_scene(scene_path)
    sd.integrator.kind = "path"
    sd.integrator.max_depth = 5

    scene, cam = renderlib.build(sd)
    cfg = renderlib.make_integrator_config(sd)
    # the intended config, as renderlib.render drives it: staged mode is
    # a host loop over jitted bounce steps — never outer-jitted
    run = renderlib.render_pass_fn(sd, cfg)
    if not cfg.staged:
        run = jax.jit(run, static_argnums=(4,))
    key = jax.random.PRNGKey(0)
    H, W = sd.film.y_resolution, sd.film.x_resolution

    # warmup / compile (excluded from timing)
    L, jit_, aux0 = run(scene, cam, key, 0, 0)
    L.block_until_ready()

    spp = int(os.environ.get("BENCH_SPP", "8"))
    t0 = time.time()
    total_rays = 0
    outs = []
    for p in range(1, spp + 1):
        L, _, aux = run(scene, cam, key, p, 0)
        outs.append((L, aux["rays"]))
    for L, rays in outs:
        L.block_until_ready()
        total_rays += int(rays)
    dt = time.time() - t0
    mrays = total_rays / dt / 1e6
    primary = spp * H * W
    print(f"bench breakdown: {spp} passes in {dt:.3f}s; "
          f"{total_rays} rays traced ({primary} primary, "
          f"{total_rays - primary} secondary+shadow); "
          f"primary-wave rate {primary / dt / 1e6:.1f} Mrays/s; "
          f"full-path rate {mrays:.1f} Mrays/s "
          f"[staged={cfg.staged} pallas={cfg.use_pallas} "
          f"backend={jax.default_backend()}]",
          file=sys.stderr)

    print(json.dumps({
        "metric": "killeroo_path_mrays_per_s_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
