"""Math/vec ops unit tests (coverage model: src/tests/{bitops,fp_tests,
bounds}.cpp for the reference)."""

import numpy as np
import jax.numpy as jnp

from pbrt_v3_iile_tpu.utils import vecmath as vm
from pbrt_v3_iile_tpu.utils import transforms as xf


def test_normalize_and_length():
    v = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
    n = vm.normalize(v)
    assert np.allclose(vm.length(n)[0], 1.0, atol=1e-6)
    assert np.allclose(np.asarray(n[1]), 0.0)  # degenerate stays zero


def test_coordinate_system_orthonormal():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(100, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.asarray(n, jnp.float32)
    t, b = vm.coordinate_system(n)
    assert np.allclose(np.asarray(vm.dot(t, n)), 0.0, atol=1e-5)
    assert np.allclose(np.asarray(vm.dot(b, n)), 0.0, atol=1e-5)
    assert np.allclose(np.asarray(vm.dot(t, b)), 0.0, atol=1e-5)
    assert np.allclose(np.asarray(vm.length(t)), 1.0, atol=1e-5)


def test_local_world_roundtrip():
    rng = np.random.default_rng(2)
    n = vm.normalize(jnp.asarray(rng.normal(size=(50, 3)), jnp.float32))
    t, b = vm.coordinate_system(n)
    v = vm.normalize(jnp.asarray(rng.normal(size=(50, 3)), jnp.float32))
    v_local = vm.to_local(v, t, b, n)
    v_back = vm.to_world(v_local, t, b, n)
    assert np.allclose(np.asarray(v), np.asarray(v_back), atol=1e-5)


def test_reflect_refract():
    n = jnp.array([[0.0, 0.0, 1.0]])
    wo = vm.normalize(jnp.array([[1.0, 0.0, 1.0]]))
    r = vm.reflect(wo, n)
    assert np.allclose(np.asarray(r), np.asarray(
        vm.normalize(jnp.array([[-1.0, 0.0, 1.0]]))), atol=1e-6)
    wt, ok = vm.refract(wo, n, jnp.array([1.0 / 1.5]))
    assert bool(ok[0])
    # Snell: sin_t = sin_i / 1.5
    sin_i = np.sqrt(0.5)
    sin_t = np.linalg.norm(np.asarray(wt)[0, :2])
    assert np.isclose(sin_t, sin_i / 1.5, atol=1e-5)


def test_face_forward():
    n = jnp.array([[0.0, 0.0, 1.0]])
    v = jnp.array([[0.0, 0.0, -1.0]])
    assert np.allclose(np.asarray(vm.face_forward(n, v)), [[0, 0, -1]])


def test_lookat_matches_pbrt_semantics():
    # camera at origin looking +x, up +z
    m = xf.look_at([0, 0, 0], [1, 0, 0], [0, 0, 1])
    # camera-space z (0,0,1) maps to world +x
    assert np.allclose(xf.apply_vector(m, [0, 0, 1]), [1, 0, 0], atol=1e-12)
    # camera-space y (up) maps to world +z
    assert np.allclose(xf.apply_vector(m, [0, 1, 0]), [0, 0, 1], atol=1e-12)


def test_rotate_translate_scale():
    m = xf.rotate(90, 0, 0, 1)
    assert np.allclose(xf.apply_point(m, [1, 0, 0]), [0, 1, 0], atol=1e-12)
    m = xf.translate(1, 2, 3)
    assert np.allclose(xf.apply_point(m, [0, 0, 0]), [1, 2, 3])
    assert np.allclose(xf.apply_vector(m, [1, 0, 0]), [1, 0, 0])
    m = xf.scale(2, 2, 2)
    assert np.allclose(xf.apply_point(m, [1, 1, 1]), [2, 2, 2])


def test_normal_transform_nonuniform_scale():
    m = xf.scale(1, 1, 4)
    # plane normal (0,0,1) under z-scale stays (0,0,~) but tangent scales:
    n = xf.apply_normal(m, [1.0, 0.0, 1.0])
    n = n / np.linalg.norm(n)
    # tangent (1,0,-1) -> (1,0,-4); normal must stay perpendicular
    t = xf.apply_vector(m, [1.0, 0.0, -1.0])
    assert abs(np.dot(n, t)) < 1e-10
