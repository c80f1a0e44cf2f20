"""Host-side 4x4 transform algebra (numpy, float64 internally).

Replaces the reference's Transform class (ref: src/core/transform.h:114) for
scene construction.  Device code never sees a Transform — geometry is
pre-transformed to world space at build time and cameras carry plain 4x4
matrices as jnp arrays.
"""

from __future__ import annotations

import numpy as np


def identity() -> np.ndarray:
    return np.eye(4, dtype=np.float64)


def translate(dx, dy, dz) -> np.ndarray:
    m = identity()
    m[0, 3], m[1, 3], m[2, 3] = dx, dy, dz
    return m


def scale(sx, sy, sz) -> np.ndarray:
    m = identity()
    m[0, 0], m[1, 1], m[2, 2] = sx, sy, sz
    return m


def rotate(angle_deg, x, y, z) -> np.ndarray:
    """Rotation about arbitrary axis (ref: transform.cpp Rotate)."""
    a = np.array([x, y, z], dtype=np.float64)
    a = a / np.linalg.norm(a)
    s = np.sin(np.deg2rad(angle_deg))
    c = np.cos(np.deg2rad(angle_deg))
    m = identity()
    m[0, 0] = a[0] * a[0] + (1 - a[0] * a[0]) * c
    m[0, 1] = a[0] * a[1] * (1 - c) - a[2] * s
    m[0, 2] = a[0] * a[2] * (1 - c) + a[1] * s
    m[1, 0] = a[0] * a[1] * (1 - c) + a[2] * s
    m[1, 1] = a[1] * a[1] + (1 - a[1] * a[1]) * c
    m[1, 2] = a[1] * a[2] * (1 - c) - a[0] * s
    m[2, 0] = a[0] * a[2] * (1 - c) - a[1] * s
    m[2, 1] = a[1] * a[2] * (1 - c) + a[0] * s
    m[2, 2] = a[2] * a[2] + (1 - a[2] * a[2]) * c
    return m


def look_at(eye, look, up) -> np.ndarray:
    """Camera-to-world transform (ref: transform.cpp LookAt).

    pbrt camera space: +z towards `look`, y = up.  Left-handed like pbrt.
    """
    eye = np.asarray(eye, dtype=np.float64)
    look = np.asarray(look, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    d = look - eye
    d = d / np.linalg.norm(d)
    right = np.cross(up / np.linalg.norm(up), d)
    rl = np.linalg.norm(right)
    if rl < 1e-12:
        raise ValueError("LookAt: up vector parallel to viewing direction")
    right /= rl
    new_up = np.cross(d, right)
    m = identity()
    m[0:3, 0] = right
    m[0:3, 1] = new_up
    m[0:3, 2] = d
    m[0:3, 3] = eye
    return m


def perspective(fov_deg: float, near: float, far: float) -> np.ndarray:
    """Projective camera-to-screen transform (ref: transform.cpp Perspective)."""
    persp = np.array(
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 0, far / (far - near), -far * near / (far - near)],
            [0, 0, 1, 0],
        ],
        dtype=np.float64,
    )
    inv_tan = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
    return scale(inv_tan, inv_tan, 1.0) @ persp


def apply_point(m: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Apply 4x4 to points (..., 3) with homogeneous divide."""
    p = np.asarray(p, dtype=np.float64)
    ph = p @ m[:3, :3].T + m[:3, 3]
    w = p @ m[3, :3].T + m[3, 3]
    return ph / w[..., None]


def apply_vector(m: np.ndarray, v: np.ndarray) -> np.ndarray:
    return np.asarray(v, dtype=np.float64) @ m[:3, :3].T


def apply_normal(m: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Normals transform by the inverse transpose (ref: transform.h:287)."""
    inv = np.linalg.inv(m)
    return np.asarray(n, dtype=np.float64) @ inv[:3, :3]


def inverse(m: np.ndarray) -> np.ndarray:
    return np.linalg.inv(m)


def swaps_handedness(m: np.ndarray) -> bool:
    """(ref: transform.h SwapsHandedness) — det of upper 3x3 < 0."""
    return bool(np.linalg.det(m[:3, :3]) < 0.0)
