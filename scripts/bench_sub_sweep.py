"""Sweep the fused-kernel subgroup size on the chip.

For sub in {8, 16, 32, 64}: time full killeroo passes (compacted
wavefront, bench config) with a data-dependent scalar sync per pass.
sub=64 (= group) disables the pl.when batch skipping — the round-3
dense-bundle behavior — so the sweep directly measures what the
subgroup masking buys end-to-end.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib


def main():
    sd = apilib.load_scene(os.environ.get(
        "BENCH_SCENE", "/root/reference/scenes/killeroo-simple.pbrt"))
    sd.integrator.kind = "path"
    sd.integrator.max_depth = 5
    scene, cam = renderlib.build(sd)
    base = renderlib.make_integrator_config(sd)
    key = jax.random.PRNGKey(0)
    npass = int(os.environ.get("SWEEP_PASSES", "3"))

    subs = [int(x) for x in
            os.environ.get("SWEEP_SUBS", "8,16,32,64").split(",")]
    bks = [int(x) for x in os.environ.get("SWEEP_BKS", "2").split(",")]
    groups = [int(x) for x in
              os.environ.get("SWEEP_GROUPS", "64").split(",")]
    maxc_env = os.environ.get("SWEEP_MAXC")  # e.g. "64:192,128:256"
    maxc_of = {64: 192}
    if maxc_env:
        for kv in maxc_env.split(","):
            k, v = kv.split(":")
            maxc_of[int(k)] = int(v)
    combos = [(g, sub, bk) for g in groups for sub in subs for bk in bks
              if sub <= g]
    for g, sub, bk in combos:
        cfg = base._replace(
            compact_schedule=(1.0, 1.0, 0.5, 0.25, 0.25, 0.125),
            cluster_group=g, cluster_sub=sub, cluster_bk=bk,
            cluster_maxc=maxc_of.get(g, max(192, 2 * g)))
        run = renderlib.render_pass_fn(sd, cfg)
        if not cfg.staged:
            run = jax.jit(run, static_argnums=(4,))
        L, _, aux = run(scene, cam, key, 0, 0)   # compile + warmup
        L.block_until_ready()
        times = []
        for p in range(1, npass + 1):
            t0 = time.time()
            L, _, aux = run(scene, cam, key, p, 0)
            c = float(jnp.sum(L))
            times.append(time.time() - t0)
            assert c == c
        rays = int(aux["rays"])
        best = min(times)
        print(f"g={g:3d} sub={sub:3d} bk={bk} maxc={cfg.cluster_maxc}: "
              f"pass times "
              f"{[round(t, 3) for t in times]} "
              f"best {best:.3f}s = {rays / best / 1e6:.2f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    main()
