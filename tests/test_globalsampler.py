"""GlobalSampler (Owen-scrambled padded Sobol) tests: net structure is
preserved by the scramble, every integration dimension is LD-driven, and
the variance reduction vs iid sampling is measurable at equal spp
(VERDICT r1 item #4: 'Done = measured MSE improvement test')."""

import numpy as np
import jax
import jax.numpy as jnp


def test_owen_scramble_preserves_net():
    """Owen scrambling must keep the (0,m,1)-net property: the first 2^k
    scrambled van-der-Corput points have exactly one point per dyadic
    interval of width 2^-k."""
    from pbrt_v3_iile_tpu.ops import lds

    for k in (3, 4, 6):
        n = 1 << k
        i = jnp.arange(n, dtype=jnp.uint32)
        for seed in (1, 77, 123456):
            s = jnp.full((n,), seed, jnp.uint32)
            x = np.asarray(lds.scrambled_vdc(i, s))
            assert ((x >= 0) & (x < 1)).all()
            counts = np.bincount((x * n).astype(int), minlength=n)
            assert (counts == 1).all(), (k, seed, counts)


def test_owen_scramble_2d_net():
    """Scrambled (0,2)-sequence keeps one point per 2^-a x 2^-b box."""
    from pbrt_v3_iile_tpu.ops import lds

    n = 16
    i = jnp.arange(n, dtype=jnp.uint32)
    sx = jnp.full((n,), 42, jnp.uint32)
    sy = jnp.full((n,), 1337, jnp.uint32)
    x, y = lds.sobol02_owen(i, sx, sy)
    x, y = np.asarray(x), np.asarray(y)
    for a, b in ((4, 0), (0, 4), (2, 2), (1, 3)):
        ix = (x * (1 << a)).astype(int)
        iy = (y * (1 << b)).astype(int)
        flat = ix * (1 << b) + iy
        counts = np.bincount(flat, minlength=n)
        assert (counts == 1).all(), (a, b, counts)


def test_ctx_uniform_shapes_and_range():
    from pbrt_v3_iile_tpu.ops import samplers as smplr

    ctx = smplr.make_sample_ctx(jax.random.PRNGKey(0),
                                jnp.arange(64, dtype=jnp.uint32), 3)
    for shape in ((64,), (64, 2), (64, 3)):
        u = np.asarray(smplr.ctx_uniform(ctx, jax.random.PRNGKey(0), 1,
                                         smplr.DIM_BSDF_DIR, shape))
        assert u.shape == shape
        assert ((u >= 0) & (u < 1)).all()
    # threefry fallback path
    u = np.asarray(smplr.ctx_uniform(None, jax.random.PRNGKey(0), 1,
                                     smplr.DIM_BSDF_DIR, (64, 2)))
    assert u.shape == (64, 2)


def test_ctx_uniform_stratified_over_passes():
    """Per pixel, the samples of one decision across passes must be a
    (0,2)-net — the GlobalSampler semantics (every dim LD, not just the
    pixel jitter)."""
    from pbrt_v3_iile_tpu.ops import samplers as smplr

    key = jax.random.PRNGKey(0)
    pix = jnp.arange(8, dtype=jnp.uint32)
    n_pass = 16
    us = np.stack([
        np.asarray(smplr.ctx_uniform(
            smplr.make_sample_ctx(key, pix, p), key, 2,
            smplr.DIM_LIGHT_SAMPLE, (8, 2)))
        for p in range(n_pass)])                    # (16, 8, 2)
    for px in range(8):
        x = us[:, px, 0]
        counts = np.bincount((x * n_pass).astype(int), minlength=n_pass)
        assert (counts == 1).all(), (px, counts)


_SCENE = """
LookAt 0 1.5 -4  0 1 0  0 1 0
Camera "perspective" "float fov" [55]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "{kind}" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [3]
WorldBegin
AttributeBegin
  Material "matte" "color Kd" [0 0 0]
  AreaLightSource "area" "color L" [12 12 12]
  Translate 0 3.2 0
  Shape "trianglemesh" "point P" [-.8 0 -.8 .8 0 -.8 .8 0 .8 -.8 0 .8]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
Material "matte" "color Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "point P" [-5 0 -5 5 0 -5 5 0 5 -5 0 5]
  "integer indices" [0 1 2 2 3 0]
Material "matte" "color Kd" [0.6 0.2 0.2]
Shape "trianglemesh" "point P" [-5 0 2.5 5 0 2.5 5 5 2.5 -5 5 2.5]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def _render(kind, spp, seed=0):
    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib

    sd = apilib.load_scene_string(_SCENE.format(kind=kind))
    img, _ = renderlib.render(sd, spp=spp, seed=seed)
    return img


def test_sobol_reduces_mse_vs_random():
    """At equal spp, the Owen-scrambled GlobalSampler must beat iid
    threefry sampling in MSE against a converged reference."""
    ref = _render("random", 96, seed=7)
    img_rand = _render("random", 8, seed=0)
    img_sob = _render("sobol", 8, seed=0)
    mse_rand = float(((img_rand - ref) ** 2).mean())
    mse_sob = float(((img_sob - ref) ** 2).mean())
    # require a real, not marginal, improvement
    assert mse_sob < 0.8 * mse_rand, (mse_sob, mse_rand)
