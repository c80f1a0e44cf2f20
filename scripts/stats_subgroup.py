"""Offline (CPU) candidate statistics for the subgroup-masked kernel.

For a representative killeroo bounce wave: per 64-ray group, the
candidate union size (today's dense test volume), and for subgroup
sizes S in {8, 16}: the fraction of (subgroup, NB-bundle) tile batches
that have at least one needed cluster — the expected compute fraction
under pl.when batch skipping (1.0 = no saving)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
from pbrt_v3_iile_tpu.ops import intersect as isect
from pbrt_v3_iile_tpu.ops import clusters as cluster_lib
from pbrt_v3_iile_tpu.utils import vecmath as vm

NB = 4
G = 64


def wave_stats(label, o, d, t, scene, cp):
    sk = cluster_lib.sort_key6(o, d, scene.world_min, scene.world_max)
    p = jnp.argsort(sk)
    o, d, t = o[p], d[p], t[p]
    n = (o.shape[0] // G) * G
    o, d, t = o[:n], d[:n], t[:n]
    mask, tnear = cluster_lib.per_ray_cull(o, d, t, cp.aabb_min,
                                           cp.aabb_max, G)
    mask = np.asarray(mask)
    tnear = np.asarray(tnear)
    Gn, K = mask.shape
    union = mask.sum(1)
    nb = np.ceil(union / NB)
    print(f"[{label}] groups={Gn} union mean={union.mean():.1f} "
          f"p90={np.percentile(union, 90):.0f} "
          f"bundles mean={nb.mean():.2f}", flush=True)

    # per-ray masks at subgroup granularity
    for S in (8, 16):
        msub, _ = cluster_lib.per_ray_cull(o, d, t, cp.aabb_min,
                                           cp.aabb_max, S)
        msub = np.asarray(msub).reshape(Gn, G // S, K)
        # group-sorted candidate order (today's shared list)
        order = np.argsort(np.where(mask, tnear, 3e38), axis=1)
        maxc_eff = int(min(192, K))
        # pad bundles
        nbund = maxc_eff // NB
        sub_need = np.take_along_axis(
            msub, order[:, None, :maxc_eff], axis=2)       # (Gn, G/S, maxc)
        # only candidates within the group's union count matter
        valid = np.take_along_axis(
            mask, order[:, :maxc_eff], axis=1)[:, None, :]
        sub_need = sub_need & valid
        b = sub_need.reshape(Gn, G // S, nbund, NB).any(3)  # (Gn,G/S,nb)
        # count only bundles the group actually iterates (i < ceil(u/NB))
        it = (np.arange(nbund)[None, :] < nb[:, None])      # (Gn, nb)
        total = (it.sum(1) * (G // S)).sum()
        needed = (b & it[:, None, :]).sum()
        print(f"    S={S}: tile-batch need fraction = "
              f"{needed / max(total, 1):.3f}  (expected VPU ~{1.0 / max(needed / max(total, 1), 1e-9):.2f}x)",
              flush=True)


def main():
    sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
    sd.film.x_resolution = sd.film.y_resolution = 256
    sd.integrator.kind = "path"
    scene, cam = renderlib.build(sd, with_clusters=True)
    prep, _ = renderlib.make_wave_prep(sd)
    key = jax.random.PRNGKey(0)
    o, d, w, jit_, k, ctx, rt = jax.jit(prep)(cam, key, 1, 0)
    t = jnp.full((o.shape[0],), 1e30)
    cp = scene.clusters

    wave_stats("primary", o, d, t, scene, cp)

    # real bounce-1 wave: intersect primaries with the XLA walker, then
    # cosine-sample the hemisphere at the hits
    hit = isect.intersect(scene, o, d, t, accel="bvh")
    it_ = isect.make_interaction(scene, o, d, hit)
    ns = vm.face_forward(it_.ns, it_.ng)
    t1, t2 = vm.coordinate_system(ns)
    u = jax.random.uniform(jax.random.PRNGKey(3), (o.shape[0], 2))
    r = jnp.sqrt(u[:, 0])
    phi = 2 * jnp.pi * u[:, 1]
    wi = (r * jnp.cos(phi))[:, None] * t1 + (r * jnp.sin(phi))[:, None] * t2 \
        + jnp.sqrt(jnp.maximum(0, 1 - u[:, 0]))[:, None] * ns
    ob = vm.offset_ray_origin(it_.p, vm.face_forward(it_.ng, wi), wi)
    tb = jnp.where(hit.valid, 1e30, -1.0)
    wave_stats("bounce1", ob, wi, tb, scene, cp)

    # shadow wave: rays toward the sphere light sample point
    from pbrt_v3_iile_tpu.ops import samplers as smp_
    lk = jax.random.PRNGKey(9)
    ul = jax.random.uniform(lk, (o.shape[0], 3))
    from pbrt_v3_iile_tpu.ops import lights as lightlib
    ls = lightlib.sample_li(scene, jnp.zeros(o.shape[0], jnp.int32),
                            it_.p, ul)
    osh = vm.offset_ray_origin(it_.p, vm.face_forward(it_.ng, ls.wi), ls.wi)
    tsh = jnp.where(hit.valid, ls.dist * 0.999, -1.0)
    wave_stats("shadow", osh, ls.wi, tsh, scene, cp)


if __name__ == "__main__":
    main()
