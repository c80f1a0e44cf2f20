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
    assert m.kind == apilib.MAT_PLASTIC
    assert abs(float(np.mean(m.kd)) - 0.3) < 0.05
    os.unlink(f.name)
