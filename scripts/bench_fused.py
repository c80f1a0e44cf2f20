"""Fused cluster kernel vs packet kernel on killeroo waves (TPU).

Times with data-dependent scalars; checks hit-t parity vs the packet
kernel on the same rays.  Run on the chip: python scripts/bench_fused.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.ops import intersect as isect


def timed(label, fn, *args, n=3):
    r = fn(*args)
    s = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = fn(*args)
        s = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
        ts.append(time.time() - t0)
    print(f"{label}: {min(ts):.4f} s (runs={['%.3f' % t for t in ts]}, "
          f"chk={s:.4e})", file=sys.stderr, flush=True)
    return r, min(ts)


def main():
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd.integrator.kind = "path"
    sd.integrator.max_depth = 5
    scene, cam = renderlib.build(sd, with_clusters=True)
    K = scene.clusters.aabb_min.shape[0]
    print(f"tris={scene.tri_p0.shape[0]} clusters={K} "
          f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    prep, _ = renderlib.make_wave_prep(sd)
    key = jax.random.PRNGKey(0)
    o, d, w, jitter, k, ctx, rtime = jax.jit(prep)(cam, key, 1, 0)
    N = o.shape[0]
    t_max = jnp.full((N,), 1e30)

    group = int(os.environ.get("FUSED_GROUP", "256"))
    maxc = int(os.environ.get("FUSED_MAXC", "64"))

    fused = jax.jit(lambda o, d, t: isect.intersect(
        scene, o, d, t, accel="clusters", cluster_group=group,
        cluster_maxc=maxc).t)
    packet = jax.jit(lambda o, d, t: isect.intersect(
        scene, o, d, t, use_pallas=True).t)
    fused_any = jax.jit(lambda o, d, t: isect.intersect(
        scene, o, d, t, accel="clusters", any_hit=True, cluster_group=group,
        cluster_maxc=maxc).t)

    (tf, _), dt_f = timed(f"fused closest (G={group},MAXC={maxc}), primary",
                          lambda *a: (fused(*a), 0), o, d, t_max)
    (tp, _), dt_p = timed("packet closest, primary",
                          lambda *a: (packet(*a), 0), o, d, t_max)
    rel = np.abs(np.asarray(tf) - np.asarray(tp)) / np.maximum(
        np.abs(np.asarray(tp)), 1.0)
    hit_f = np.asarray(tf) < 1e29
    hit_p = np.asarray(tp) < 1e29
    print(f"parity primary: hit agree={np.mean(hit_f == hit_p):.5f} "
          f"t rel err p99={np.quantile(rel[hit_f & hit_p], 0.99):.2e}",
          file=sys.stderr, flush=True)

    timed("fused any-hit, primary", lambda *a: (fused_any(*a), 0),
          o, d, t_max)

    kd = jax.random.PRNGKey(7)
    d2 = jax.random.permutation(kd, d, axis=0)
    (tf2, _), dt_f2 = timed("fused closest, shuffled dirs",
                            lambda *a: (fused(*a), 0), o, d2, t_max)
    (tp2, _), _ = timed("packet closest, shuffled dirs",
                        lambda *a: (packet(*a), 0), o, d2, t_max)
    hit_f2 = np.asarray(tf2) < 1e29
    hit_p2 = np.asarray(tp2) < 1e29
    print(f"parity shuffled: hit agree={np.mean(hit_f2 == hit_p2):.5f}",
          file=sys.stderr, flush=True)
    print(f"SUMMARY Mrays/s: fused primary={N / dt_f / 1e6:.1f} "
          f"packet primary={N / dt_p / 1e6:.1f} "
          f"fused shuffled={N / dt_f2 / 1e6:.1f}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
