"""BSDF correctness tests (coverage model: src/tests/bsdfs.cpp — sampling
consistency + energy conservation checks)."""

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_v3_iile_tpu.ops import bsdf as bsdflib
from pbrt_v3_iile_tpu.scene.api import (
    MAT_MATTE, MAT_PLASTIC, MAT_MIRROR, MAT_GLASS, MAT_METAL,
)


def _params(kind, n, **kw):
    d = dict(
        kind=jnp.full(n, kind, jnp.int32),
        kd=jnp.tile(jnp.array([[0.6, 0.4, 0.2]]), (n, 1)),
        ks=jnp.tile(jnp.array([[0.3, 0.3, 0.3]]), (n, 1)),
        kr=jnp.tile(jnp.array([[0.9, 0.9, 0.9]]), (n, 1)),
        kt=jnp.tile(jnp.array([[1.0, 1.0, 1.0]]), (n, 1)),
        alpha=jnp.full(n, 0.1),
        eta=jnp.full(n, 1.5),
        metal_eta=jnp.tile(jnp.array([[0.2, 0.92, 1.1]]), (n, 1)),
        metal_k=jnp.tile(jnp.array([[3.9, 2.45, 2.14]]), (n, 1)),
        sigma=jnp.zeros(n),
        aux=jnp.zeros((n, 8)),
    )
    d.update(kw)
    return bsdflib.BsdfParams(**d)


def _wo(n):
    return jnp.tile(jnp.asarray(
        np.array([[0.3, 0.1, 0.9]]) / np.linalg.norm([0.3, 0.1, 0.9]),
        jnp.float32), (n, 1))


def test_lambert_eval():
    p = _params(MAT_MATTE, 4)
    wo = _wo(4)
    wi = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    f, pdf = bsdflib.evaluate(p, wo, wi)
    assert np.allclose(np.asarray(f[0]), np.array([0.6, 0.4, 0.2]) / np.pi,
                       atol=1e-5)
    assert np.allclose(np.asarray(pdf[0]), 1.0 / np.pi, atol=1e-5)


def test_sample_eval_consistency_matte():
    """E[f*cos/pdf] over sampled directions == directional albedo == kd."""
    n = 8192
    key = jax.random.PRNGKey(0)
    p = _params(MAT_MATTE, n)
    wo = _wo(n)
    u1 = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2))
    s = bsdflib.sample(p, wo, u1, u2)
    est = np.asarray(s.f * (jnp.abs(s.wi[..., 2:3]))
                     / jnp.maximum(s.pdf, 1e-9)[..., None])
    est = np.where(np.asarray(s.valid)[:, None], est, 0.0)
    assert np.allclose(est.mean(axis=0), [0.6, 0.4, 0.2], atol=0.02)


def test_sample_matches_eval_pdf():
    """sample() f/pdf must agree with evaluate() at the sampled wi."""
    n = 512
    key = jax.random.PRNGKey(1)
    p = _params(MAT_PLASTIC, n)
    wo = _wo(n)
    u1 = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2))
    s = bsdflib.sample(p, wo, u1, u2)
    f2, pdf2 = bsdflib.evaluate(p, wo, s.wi)
    m = np.asarray(s.valid & ~s.is_specular)
    assert np.allclose(np.asarray(s.f)[m], np.asarray(f2)[m], atol=1e-4)
    assert np.allclose(np.asarray(s.pdf)[m], np.asarray(pdf2)[m], atol=1e-4)


def test_plastic_energy_conservation():
    """White-sky furnace: integral of f*cos over wi <= kd+ks."""
    n = 1 << 15
    key = jax.random.PRNGKey(2)
    p = _params(MAT_PLASTIC, n)
    wo = _wo(n)
    # uniform hemisphere MC of integral f cos dw
    u = jax.random.uniform(key, (n, 2))
    from pbrt_v3_iile_tpu.ops import sampling as smp
    wi = smp.uniform_sample_hemisphere(u)
    f, _ = bsdflib.evaluate(p, wo, wi)
    integral = np.asarray(f * wi[..., 2:3]).mean(axis=0) * 2 * np.pi
    assert (integral <= np.array([0.6, 0.4, 0.2])
            + np.array([0.3, 0.3, 0.3]) + 0.05).all()


def test_mirror_specular():
    n = 4
    p = _params(MAT_MIRROR, n)
    wo = _wo(n)
    s = bsdflib.sample(p, wo, jnp.full(n, 0.1), jnp.full((n, 2), 0.5))
    assert bool(s.is_specular.all())
    wi = np.asarray(s.wi)
    wo_n = np.asarray(wo)
    assert np.allclose(wi[:, :2], -wo_n[:, :2], atol=1e-5)
    assert np.allclose(wi[:, 2], wo_n[:, 2], atol=1e-5)
    # f * cos / pdf == kr
    thr = np.asarray(s.f)[0] * abs(wi[0, 2]) / float(s.pdf[0])
    assert np.allclose(thr, [0.9, 0.9, 0.9], atol=1e-4)


def test_glass_fresnel_split_energy():
    """Glass: E[f cos/pdf] == kr*F + kt*(1-F)*(1/eta_rel)^2 scaled; total
    radiance throughput should be <= 1 and > 0.9 for clear glass."""
    n = 1 << 14
    key = jax.random.PRNGKey(3)
    p = _params(MAT_GLASS, n)
    wo = _wo(n)
    u1 = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
    s = bsdflib.sample(p, wo, u1, jnp.full((n, 2), 0.5))
    est = np.asarray(s.f * jnp.abs(s.wi[..., 2:3])
                     / jnp.maximum(s.pdf, 1e-9)[..., None])
    est = np.where(np.asarray(s.valid)[:, None], est, 0.0)
    mean = est.mean(axis=0)
    # transmission carries the 1/eta_rel^2 radiance scale; energy (flux)
    # conservation holds after the inverse scale at exit — here we just
    # check sane range
    assert (mean > 0.5).all() and (mean < 2.5).all()


def test_metal_reflects_only():
    n = 4096
    key = jax.random.PRNGKey(4)
    p = _params(MAT_METAL, n)
    wo = _wo(n)
    u1 = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2))
    s = bsdflib.sample(p, wo, u1, u2)
    wi = np.asarray(s.wi)
    v = np.asarray(s.valid)
    assert (wi[v, 2] > 0).all()  # same hemisphere as wo


def _disney_aux(n, metallic=0.0, spec_tint=0.0, sheen=0.0, sheen_tint=0.5,
                clearcoat=0.0, cc_gloss=1.0, spec_trans=0.0, flat=0.0):
    row = jnp.array([metallic, spec_tint, sheen, sheen_tint, clearcoat,
                     cc_gloss, spec_trans, flat])
    return jnp.tile(row[None, :], (n, 1))


def test_disney_sample_matches_eval():
    """Disney smooth lobes: sample() agrees with evaluate() at wi."""
    from pbrt_v3_iile_tpu.scene.api import MAT_DISNEY
    n = 2048
    key = jax.random.PRNGKey(5)
    p = _params(MAT_DISNEY, n, alpha=jnp.full(n, 0.25),
                aux=_disney_aux(n, metallic=0.3, sheen=0.5, clearcoat=1.0))
    wo = _wo(n)
    u1 = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2))
    s = bsdflib.sample(p, wo, u1, u2)
    f2, pdf2 = bsdflib.evaluate(p, wo, s.wi)
    m = np.asarray(s.valid & ~s.is_specular)
    assert m.sum() > n // 2
    assert np.allclose(np.asarray(s.f)[m], np.asarray(f2)[m], atol=1e-4)
    assert np.allclose(np.asarray(s.pdf)[m], np.asarray(pdf2)[m], atol=1e-4)


def test_disney_energy_bounded():
    """White-sky integral of f*cos stays below 1 for a full-featured
    disney surface (the principled model is designed ~energy conserving)."""
    from pbrt_v3_iile_tpu.scene.api import MAT_DISNEY
    from pbrt_v3_iile_tpu.ops import sampling as smp
    n = 1 << 15
    key = jax.random.PRNGKey(6)
    p = _params(MAT_DISNEY, n, alpha=jnp.full(n, 0.25),
                kd=jnp.tile(jnp.array([[0.8, 0.8, 0.8]]), (n, 1)),
                aux=_disney_aux(n, metallic=0.2, sheen=0.3, clearcoat=0.5))
    wo = _wo(n)
    wi = smp.uniform_sample_hemisphere(jax.random.uniform(key, (n, 2)))
    f, _ = bsdflib.evaluate(p, wo, wi)
    integral = np.asarray(f * wi[..., 2:3]).mean(axis=0) * 2 * np.pi
    assert (integral < 1.15).all() and (integral > 0.05).all()


def test_disney_metallic_kills_diffuse():
    from pbrt_v3_iile_tpu.scene.api import MAT_DISNEY
    n = 16
    p = _params(MAT_DISNEY, n, alpha=jnp.full(n, 0.01),
                aux=_disney_aux(n, metallic=1.0))
    wo = _wo(n)
    # direction far from the mirror lobe: the microfacet term is ~0 there,
    # so any signal left would be a (wrong) diffuse floor
    wi = jnp.tile(jnp.array([[0.8, 0.0, 0.6]]), (n, 1))
    f, _ = bsdflib.evaluate(p, wo, wi)
    # pure metal: no lambertian floor — f is the microfacet lobe only,
    # which is tiny away from the mirror direction
    f_diffuse_scale = np.asarray(f).max()
    p2 = _params(MAT_DISNEY, n, alpha=jnp.full(n, 0.01),
                 aux=_disney_aux(n, metallic=0.0))
    f2, _ = bsdflib.evaluate(p2, wo, wi)
    assert np.asarray(f2).mean() > 5.0 * f_diffuse_scale


def test_disney_spectrans_transmits():
    from pbrt_v3_iile_tpu.scene.api import MAT_DISNEY
    n = 4096
    key = jax.random.PRNGKey(7)
    p = _params(MAT_DISNEY, n, aux=_disney_aux(n, spec_trans=1.0))
    wo = _wo(n)
    u1 = jax.random.uniform(jax.random.fold_in(key, 0), (n,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2))
    s = bsdflib.sample(p, wo, u1, u2)
    frac_t = float(jnp.mean((s.is_transmission & s.valid).astype(jnp.float32)))
    assert frac_t > 0.3  # most non-fresnel picks transmit at eta 1.5


def test_roughness_remap_monotonic():
    r = jnp.array([0.001, 0.01, 0.1, 0.5, 1.0])
    a = np.asarray(bsdflib.roughness_to_alpha(r))
    assert (np.diff(a) > 0).all()
