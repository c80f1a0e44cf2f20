"""Where does a killeroo pass spend its time?  (round-3 scoping)

Times, with data-dependent scalars (relay-proof):
  - one full staged pass (warm)
  - one closest-hit traversal call on the primary wave (pallas + XLA)
  - one any-hit traversal call
  - the same on an incoherent (shuffled-direction) wave
Prints seconds per item to stderr; nothing else.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.ops import intersect as isect


def timed(label, fn, *args, n=2):
    # warmup
    r = fn(*args)
    s = float(jnp.sum(r if isinstance(r, jnp.ndarray) else r[0]))
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = fn(*args)
        s = float(jnp.sum(r if isinstance(r, jnp.ndarray) else r[0]))
        ts.append(time.time() - t0)
    print(f"{label}: {min(ts):.3f} s  (runs={['%.3f' % t for t in ts]}, "
          f"checksum={s:.3e})", file=sys.stderr, flush=True)
    return min(ts)


def main():
    scene_path = "/root/reference/scenes/killeroo-simple.pbrt"
    sd = apilib.load_scene(scene_path)
    sd.integrator.kind = "path"
    sd.integrator.max_depth = 5
    scene, cam = renderlib.build(sd)
    print(f"tris={scene.tri_p0.shape[0]} backend={jax.default_backend()}",
          file=sys.stderr, flush=True)

    cfg = renderlib.make_integrator_config(sd)
    run = renderlib.render_pass_fn(sd, cfg)
    key = jax.random.PRNGKey(0)

    def full_pass():
        L, _, aux = run(scene, cam, key, 1, 0)
        return L
    timed("full staged pass (pallas)", full_pass)

    # primary wave
    prep, _ = renderlib.make_wave_prep(sd)
    o, d, w, jitter, k, ctx, rtime = jax.jit(prep)(cam, key, 1, 0)
    N = o.shape[0]
    t_max = jnp.full((N,), 1e30)
    print(f"wave N={N}", file=sys.stderr, flush=True)

    pal_closest = jax.jit(lambda o, d, t: isect.intersect(
        scene, o, d, t, use_pallas=True).t)
    timed("pallas closest-hit, primary wave", pal_closest, o, d, t_max)

    pal_any = jax.jit(lambda o, d, t: isect.intersect(
        scene, o, d, t, any_hit=True, use_pallas=True).t)
    timed("pallas any-hit, primary wave", pal_any, o, d, t_max)

    xla_closest = jax.jit(lambda o, d, t: isect.intersect(
        scene, o, d, t, use_pallas=False).t)
    timed("XLA walker closest-hit, primary wave", xla_closest, o, d, t_max)

    # incoherent wave: shuffle directions
    kd = jax.random.PRNGKey(7)
    d2 = jax.random.permutation(kd, d, axis=0)
    timed("pallas closest-hit, shuffled dirs", pal_closest, o, d2, t_max)
    timed("XLA closest-hit, shuffled dirs", xla_closest, o, d2, t_max)

    # cluster pipeline as wired today
    if getattr(scene, "clusters", None) is not None:
        cl = jax.jit(lambda o, d, t: isect.intersect(
            scene, o, d, t, accel="clusters").t)
        timed("clusters (XLA grouped), primary wave", cl, o, d, t_max)


if __name__ == "__main__":
    main()
