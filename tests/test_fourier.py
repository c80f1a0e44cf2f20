"""FourierBSDF table tests (ref: src/core/reflection.cpp
FourierBSDFTable::Read/FourierBSDF::f, src/tests coverage gap — the
reference has no fourier tests; we add loader round-trip + analytic
Lambertian evaluation + lobe-fit sanity)."""

import os
import tempfile

import numpy as np

from pbrt_v3_iile_tpu.ops import fourierbsdf as fblib
from pbrt_v3_iile_tpu.scene import api as apilib


def test_bsdf_file_round_trip():
    t = fblib.make_lambertian_table(albedo=0.25, n_mu=12)
    f = tempfile.NamedTemporaryFile(suffix=".bsdf", delete=False)
    f.close()
    fblib.write_bsdf(f.name, t)
    t2 = fblib.read_bsdf(f.name)
    assert t2.n_channels == 1 and t2.m_max == 1
    assert np.allclose(t2.mu, t.mu, atol=1e-6)
    assert np.allclose(t2.a, t.a, atol=1e-6)
    assert np.array_equal(t2.m, t.m)
    os.unlink(f.name)


def test_lambertian_table_evaluates_to_albedo_over_pi():
    albedo = 0.6
    t = fblib.make_lambertian_table(albedo=albedo, n_mu=24)
    want = albedo / np.pi
    for mi, mo, cp in [(0.3, 0.7, 0.2), (0.9, 0.4, -0.8), (0.5, 0.5, 1.0)]:
        got = fblib.evaluate(t, -mi, mo, cp)   # reflection: muI < 0
        assert np.allclose(got, want, rtol=0.05), (mi, mo, got, want)


def test_lobe_fit_recovers_lambertian():
    t = fblib.make_lambertian_table(albedo=0.4, n_mu=24)
    kd, ks, alpha, eta, resid = fblib.fit_lobes(t)
    assert abs(float(np.mean(kd)) - 0.4) < 0.05, kd
    assert float(np.mean(ks)) < 0.05, ks
    assert resid < 1e-3


def test_fourier_material_parses_and_fits():
    t = fblib.make_lambertian_table(albedo=0.3, n_mu=16)
    f = tempfile.NamedTemporaryFile(suffix=".bsdf", delete=False)
    f.close()
    fblib.write_bsdf(f.name, t)
    sd = apilib.load_scene_string(f"""
    Camera "perspective" "float fov" [45]
    Film "image" "integer xresolution" [8] "integer yresolution" [8]
    Integrator "path"
    WorldBegin
    Material "fourier" "string bsdffile" "{f.name}"
    Shape "trianglemesh" "integer indices" [0 1 2]
      "point P" [0 0 0 1 0 0 0 1 0]
    WorldEnd
    """)
    m = sd.materials[-1]
    assert m.kind == apilib.MAT_FOURIER      # exact path kept
    assert m.fourier_table is not None
    assert abs(float(np.mean(m.kd)) - 0.3) < 0.05  # sampling proxy
    os.unlink(f.name)


def _glossy_test_table(n_mu=16, m=4):
    """Synthetic 3-channel multi-order table: ak with decaying azimuthal
    orders, channel-tinted (no analytic meaning — device/host parity
    fixture)."""
    t = fblib.FourierTable()
    t.eta = 1.2
    t.m_max = m
    t.n_channels = 3
    t.mu = np.linspace(-1.0, 1.0, n_mu)
    t.m = np.full((n_mu, n_mu), m, np.int32)
    t.a_offset = (np.arange(n_mu * n_mu, dtype=np.int64)
                  .reshape(n_mu, n_mu) * 3 * m)
    a = np.zeros(n_mu * n_mu * 3 * m)
    tint = [1.0, 0.8, 0.5]
    for i in range(n_mu):
        for j in range(n_mu):
            base = (i * n_mu + j) * 3 * m
            amp = 0.2 * abs(t.mu[i]) * (0.5 + 0.5 * abs(t.mu[j]))
            for c in range(3):
                for k in range(m):
                    a[base + c * m + k] = amp * tint[c] / (1.0 + k * k)
    t.a = a
    t.cdf = np.zeros((n_mu, n_mu))
    return t


def test_device_evaluation_matches_host():
    """evaluate_device (in-graph, dense) == evaluate (host, exact) on a
    multi-order 3-channel table across reflection and transmission."""
    import jax.numpy as jnp

    t = _glossy_test_table()
    dev = fblib.densify([t])
    rng = np.random.default_rng(3)
    n = 64
    # random directions, both hemispheres for wi
    def rand_dir(sign=None):
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        if sign is not None:
            v[:, 2] = np.abs(v[:, 2]) * sign
        return v
    wo = rand_dir(+1.0)
    wi = rng.normal(size=(n, 3))
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    fid = jnp.zeros(n, jnp.int32)
    got = np.asarray(fblib.evaluate_device(
        dev, fid, jnp.asarray(wo, jnp.float32), jnp.asarray(wi, jnp.float32)))
    for r in range(n):
        mu_i = -wi[r, 2]
        mu_o = wo[r, 2]
        ax, ay = -wi[r, 0], -wi[r, 1]
        bx, by = wo[r, 0], wo[r, 1]
        den = np.sqrt(max((ax * ax + ay * ay) * (bx * bx + by * by), 1e-20))
        cp = np.clip((ax * bx + ay * by) / den, -1, 1)
        want = fblib.evaluate(t, mu_i, mu_o, cp)
        assert np.allclose(got[r], want, rtol=2e-3, atol=2e-4), \
            (r, got[r], want)


def test_densify_truncation_keeps_energy_order():
    """m_cap truncation drops only azimuthal orders >= cap; order-0 stays
    exact."""
    t = _glossy_test_table(m=6)
    dev = fblib.densify([t], m_cap=2)
    assert dev.a.shape[3] == 2
    # a0 of pair (8,8) matches the host pool exactly
    off = int(t.a_offset[8, 8])
    assert np.isclose(float(dev.a[0, 8, 8, 0, 0]), t.a[off])


def test_fourier_render_matches_matte():
    """End-to-end: a Lambertian fourier table renders like the same-albedo
    matte (exact in-graph table evaluation through the wavefront)."""
    import tempfile as tf

    from pbrt_v3_iile_tpu.integrators import render as renderlib

    t = fblib.make_lambertian_table(albedo=0.5, n_mu=24)
    f = tf.NamedTemporaryFile(suffix=".bsdf", delete=False)
    f.close()
    fblib.write_bsdf(f.name, t)

    def scene_text(mat):
        return f"""
    LookAt 0 1.5 -3  0 0 0  0 1 0
    Camera "perspective" "float fov" [50]
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Integrator "path" "integer maxdepth" [2]
    WorldBegin
    LightSource "point" "rgb I" [10 10 10] "point from" [0 3 -1]
    {mat}
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-2 0 -2  2 0 -2  2 0 2  -2 0 2]
    WorldEnd
    """

    sd_f = apilib.load_scene_string(
        scene_text(f'Material "fourier" "string bsdffile" "{f.name}"'))
    sd_m = apilib.load_scene_string(
        scene_text('Material "matte" "rgb Kd" [0.5 0.5 0.5]'))
    img_f, _ = renderlib.render(sd_f, spp=8, seed=3)
    img_m, _ = renderlib.render(sd_m, spp=8, seed=3)
    img_f, img_m = np.asarray(img_f), np.asarray(img_m)
    assert np.isfinite(img_f).all()
    assert abs(img_f.mean() - img_m.mean()) < 0.03 * max(img_m.mean(), 1e-6)
    os.unlink(f.name)


def test_transmissive_fourier_proxy_samples_far_hemisphere():
    """A transmissive table (eta != 1) must get a transmission proxy
    lobe: BSDF sampling produces far-hemisphere directions with
    pdf > 0, so indirect transmitted paths are no longer lost
    (ADVICE r2: reflection-only proxy pdf)."""
    import jax
    import jax.numpy as jnp
    from pbrt_v3_iile_tpu.ops import bsdf as bsdflib
    from pbrt_v3_iile_tpu.integrators import render as renderlib

    t = fblib.make_lambertian_table(albedo=0.4, n_mu=12)
    t.eta = 1.33  # transmissive marker
    f = tempfile.NamedTemporaryFile(suffix=".bsdf", delete=False)
    f.close()
    fblib.write_bsdf(f.name, t)
    scene_text = f"""
    LookAt 0 1 -3  0 1 0  0 1 0
    Camera "perspective" "float fov" [60]
    Film "image" "integer xresolution" [8] "integer yresolution" [8]
    WorldBegin
    LightSource "point" "rgb I" [10 10 10]
    Material "fourier" "string bsdffile" ["{f.name}"]
    Shape "trianglemesh" "point P" [-3 0 2  3 0 2  3 3 2  -3 3 2]
      "integer indices" [0 2 1 0 3 2]
    WorldEnd
    """
    sd = apilib.load_scene_string(scene_text)
    scene, cam = renderlib.build(sd)
    assert float(scene.mat_kt[1].sum()) > 0 or \
        float(scene.mat_kt.sum()) > 0, "kt proxy must be set"

    N = 4096
    key = jax.random.PRNGKey(0)
    mat_id = jnp.ones((N,), jnp.int32) * int(np.argmax(
        np.asarray(scene.mat_kind) == apilib.MAT_FOURIER))
    params = bsdflib.gather_params(scene, mat_id)
    wo = jnp.tile(jnp.asarray([[0.3, 0.1, 0.95]]) /
                  np.linalg.norm([0.3, 0.1, 0.95]), (N, 1))
    u_lobe = jax.random.uniform(jax.random.fold_in(key, 1), (N,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 2), (N, 2))
    bs = bsdflib.sample(params, wo, u_lobe, u2)
    trans = np.asarray(bs.wi[:, 2] * wo[:, 2] < 0) & np.asarray(bs.valid)
    frac = trans.mean()
    assert frac > 0.1, f"no transmitted samples ({frac})"
    pdf_t = np.asarray(bs.pdf)[trans]
    assert (pdf_t > 0).all(), "transmitted samples need pdf > 0"
    os.unlink(f.name)
