"""Diagnose the fused-kernel candidate distribution on killeroo waves.

CPU-friendly (pure XLA cull math + packet-truth t from the XLA walker).
Reports: candidate count stats, overflow fraction, and the simulated
early-break stop index per group (needs true hit t).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.ops import intersect as isect
from pbrt_v3_iile_tpu.ops import clusters as cl


def stats(name, o, d, t_max, scene, G=256, MAXC=64):
    cp = scene.clusters
    N = o.shape[0]
    pad = (-N) % G
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))])
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[1.0, 0, 0]]),
                                         (pad, 1))])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0)])
    Np = N + pad
    key = cl.sort_key(o, d, scene.world_min, scene.world_max)
    key = jnp.where(t_max > 0, key, jnp.int32(0x7FFFFFFF))
    perm = jnp.argsort(key)
    os_, ds_, ts_ = o[perm], d[perm], t_max[perm]
    mask, tnear = cl.group_cull_tnear(os_, ds_, ts_, cp.aabb_min,
                                      cp.aabb_max, G)
    n_cand = np.asarray(jnp.sum(mask, 1))
    Gn = Np // G
    # true t from the XLA walker
    hit = isect.intersect_bvh(scene, os_, ds_, jnp.where(ts_ > 0, ts_,
                                                         -1.0))
    t_true = np.asarray(jnp.where(hit.valid, hit.t,
                                  jnp.where(ts_ > 0, 1e30, -3e38)))
    t_true = t_true.reshape(Gn, G)
    order_key = np.asarray(jnp.where(mask, tnear, 3.0e38))
    order = np.argsort(order_key, 1)[:, :MAXC]
    ctn = np.take_along_axis(order_key, order, 1)
    # simulated break: stop at first i where all t_true <= ctn[i+1]
    group_max_t = t_true.max(1)                      # (Gn,)
    stop = np.full(Gn, 0)
    for g in range(Gn):
        nc = min(n_cand[g], MAXC)
        s = nc
        for i in range(nc - 1):
            if group_max_t[g] <= ctn[g, i + 1]:
                s = i + 1
                break
        stop[g] = s
    ovf = (n_cand > MAXC).mean()
    live_groups = (np.asarray(ts_).reshape(Gn, G) > 0).any(1)
    print(f"{name}: groups={Gn} live={live_groups.mean():.2f} "
          f"n_cand mean={n_cand.mean():.1f} med={np.median(n_cand):.0f} "
          f"p90={np.quantile(n_cand, 0.9):.0f} max={n_cand.max()} "
          f"overflow={ovf:.3f}  stop mean={stop.mean():.1f} "
          f"med={np.median(stop):.0f} p90={np.quantile(stop, 0.9):.0f}",
          flush=True)
    # miss fraction per group
    miss = (t_true >= 1e29).mean()
    print(f"   miss-ray fraction: {miss:.3f}", flush=True)


def main():
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd.integrator.kind = "path"
    scene, cam = renderlib.build(sd, with_clusters=True)
    prep, _ = renderlib.make_wave_prep(sd)
    key = jax.random.PRNGKey(0)
    o, d, w, jitter, k, ctx, rtime = jax.jit(prep)(cam, key, 1, 0)
    N = o.shape[0]
    # subsample for CPU-walker affordability
    sel = jnp.arange(0, N, 4)
    o, d = o[sel], d[sel]
    t_max = jnp.full((o.shape[0],), 1e30)
    stats("primary/4", o, d, t_max, scene)
    kd = jax.random.PRNGKey(7)
    d2 = jax.random.permutation(kd, d, axis=0)
    stats("shuffled/4", o, d2, t_max, scene)


if __name__ == "__main__":
    main()
