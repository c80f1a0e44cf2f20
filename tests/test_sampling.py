"""Sampling warp tests (coverage model: src/tests/sampling.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_v3_iile_tpu.ops import sampling as smp


def _u(n, k, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, k))


def test_concentric_disk_in_unit_disk():
    d = smp.concentric_sample_disk(_u(4096, 2))
    r = np.linalg.norm(np.asarray(d), axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # area uniformity: mean radius of uniform disk = 2/3
    assert abs(r.mean() - 2.0 / 3.0) < 0.02


def test_cosine_hemisphere_distribution():
    w = smp.cosine_sample_hemisphere(_u(8192, 2))
    w = np.asarray(w)
    assert (w[:, 2] >= -1e-6).all()
    # E[cos theta] under pdf cos/pi = 2/3
    assert abs(w[:, 2].mean() - 2.0 / 3.0) < 0.02


def test_uniform_sphere_mean_zero():
    w = np.asarray(smp.uniform_sample_sphere(_u(8192, 2)))
    assert np.linalg.norm(np.asarray(w).mean(axis=0)) < 0.05
    assert np.allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)


def test_uniform_cone():
    cos_max = 0.8
    w = np.asarray(smp.uniform_sample_cone(_u(4096, 2), cos_max))
    assert (w[:, 2] >= cos_max - 1e-5).all()
    # pdf integrates to 1: solid angle * pdf = 1
    assert np.isclose(float(smp.uniform_cone_pdf(cos_max))
                      * 2 * np.pi * (1 - cos_max), 1.0, atol=1e-6)


def test_uniform_triangle_barycentrics():
    b = np.asarray(smp.uniform_sample_triangle(_u(4096, 2)))
    assert (b >= 0).all() and (b.sum(-1) <= 1 + 1e-6).all()
    # centroid of uniform triangle samples -> (1/3, 1/3)
    assert np.allclose(b.mean(axis=0), [1 / 3, 1 / 3], atol=0.02)


def test_power_heuristic():
    # (ref: sampling.h PowerHeuristic) f^2/(f^2+g^2)
    w = smp.power_heuristic(1.0, jnp.array([2.0]), 1.0, jnp.array([1.0]))
    assert np.isclose(float(w[0]), 4.0 / 5.0)
    w0 = smp.power_heuristic(1.0, jnp.array([0.0]), 1.0, jnp.array([0.0]))
    assert float(w0[0]) == 0.0


def test_rng_dim_tags_unique():
    # every DIM_* purpose tag must be a distinct stream (a collision
    # correlates two unrelated integration dimensions — e.g. the round-1
    # bug where shutter time and shadow ratio-tracking shared stream 10)
    from pbrt_v3_iile_tpu.ops import samplers as smplr
    tags = {k: v for k, v in vars(smplr).items() if k.startswith("DIM_")}
    assert len(set(tags.values())) == len(tags), tags


def test_scrambled_radical_inverse_high_dims():
    """Permuted radical inverses past dim 16 (ref: lowdiscrepancy.h
    ComputeRadicalInversePermutations): uniform in [0,1), stratified in
    the base, and the dynamic-dim version matches the static one."""
    from pbrt_v3_iile_tpu.ops import lds

    i = jnp.arange(1024, dtype=jnp.uint32)
    for dim in (17, 40, 100):
        v = np.asarray(lds.scrambled_radical_inverse(dim, i))
        assert (v >= 0).all() and (v < 1).all()
        assert abs(v.mean() - 0.5) < 0.05
        base = lds.PRIMES_FULL[dim]
        # the first min(n, base) samples land in distinct 1/base strata
        nb = min(1024, base)
        strata = np.floor(v[:nb] * base).astype(int)
        assert len(set(strata.tolist())) == nb
        vd = np.asarray(lds.scrambled_radical_inverse_dyn(
            jnp.uint32(dim), i))
        np.testing.assert_allclose(v, vd, atol=2e-5)


def test_maxmin_beats_sobol_min_distance():
    """The searched MaxMinDist matrices must beat plain sobol02's
    toroidal min distance (ref: maxmin.cpp CMaxMinDist role) for the
    pattern sizes the search covers."""
    from pbrt_v3_iile_tpu.ops import lds

    def min_d2(xs, ys):
        dx = np.abs(xs[:, None] - xs[None, :])
        dy = np.abs(ys[:, None] - ys[None, :])
        dx = np.minimum(dx, 1 - dx)
        dy = np.minimum(dy, 1 - dy)
        d2 = dx * dx + dy * dy
        np.fill_diagonal(d2, 9.0)
        return d2.min()

    for m in (4, 6):
        n = 1 << m
        i = jnp.arange(n, dtype=jnp.uint32)
        mx, my = lds.maxmin02(i, n)
        sx, sy = lds.sobol02(i)
        dm = min_d2(np.asarray(mx), np.asarray(my))
        ds = min_d2(np.asarray(sx), np.asarray(sy))
        assert dm > ds * 1.2, (m, dm, ds)
