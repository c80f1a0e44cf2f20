"""Camera ray generation (perspective, orthographic, environment,
hemispheric) for ray wavefronts.

Semantics: perspective/ortho follow the reference's projective cameras
(ref: src/cameras/perspective.cpp:GenerateRay, orthographic.cpp; screen
window + raster mapping from src/core/camera.h ProjectiveCamera).  The
hemispheric probe camera reproduces the IILE mapping exactly
(ref: src/cameras/hemispheric.cpp:15-41: theta = pi*y/h over film rows,
phi = pi*x/w over columns, camera-space dir = (sin t cos p, cos t,
sin t sin p) so the hemisphere pole is the camera z / surface normal).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..utils import transforms as xf
from ..utils import vecmath as vm
from . import sampling as smp


class Camera(NamedTuple):
    cam_to_world: jnp.ndarray    # (4,4)
    raster_to_camera: jnp.ndarray  # (4,4)
    lens_radius: jnp.ndarray     # ()
    focal_distance: jnp.ndarray  # ()
    resolution: jnp.ndarray      # (2,) i32 (x, y)


KIND = {"perspective": 0, "orthographic": 1, "environment": 2}


def make_camera(desc, film) -> Camera:
    xres, yres = film.x_resolution, film.y_resolution
    aspect = xres / yres
    if desc.screen_window is not None:
        x0, x1, y0, y1 = desc.screen_window
    elif aspect > 1.0:
        x0, x1, y0, y1 = -aspect, aspect, -1.0, 1.0
    else:
        x0, x1, y0, y1 = -1.0, 1.0, -1.0 / aspect, 1.0 / aspect
    # ScreenToRaster (ref: camera.h:216): note the y flip
    s2r = (
        xf.scale(xres, yres, 1.0)
        @ xf.scale(1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0)
        @ xf.translate(-x0, -y1, 0.0)
    )
    if desc.kind == "orthographic":
        c2s = np.eye(4)  # orthographic: z in [0,1] irrelevant for rays
    else:
        c2s = xf.perspective(desc.fov, 1e-2, 1000.0)
    r2c = xf.inverse(c2s) @ xf.inverse(s2r)
    return Camera(
        cam_to_world=jnp.asarray(desc.cam_to_world, jnp.float32),
        raster_to_camera=jnp.asarray(r2c, jnp.float32),
        lens_radius=jnp.float32(desc.lens_radius),
        focal_distance=jnp.float32(desc.focal_distance),
        resolution=jnp.asarray([xres, yres], jnp.int32),
    )


def _apply44_point(m, p):
    ph = p @ m[:3, :3].T + m[:3, 3]
    w = p @ m[3, :3].T + m[3, 3]
    return ph / w[..., None]


def _apply44_vector(m, v):
    return v @ m[:3, :3].T


def generate_rays(cam: Camera, p_film: jnp.ndarray, u_lens=None,
                  kind: int = 0):
    """p_film: (N,2) raster-space sample positions (x, y).

    kind is STATIC (0 perspective, 1 ortho, 2 environment) — pass it from
    the scene description, not from the (traced) camera pytree.
    Returns (o, d) world-space rays. (ref: perspective.cpp:GenerateRay)
    """
    N = p_film.shape[0]
    p_cam = _apply44_point(
        cam.raster_to_camera,
        jnp.concatenate([p_film, jnp.zeros((N, 1), p_film.dtype)], axis=-1),
    )
    if kind == 1:  # orthographic
        o_cam = p_cam
        d_cam = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (N, 3))
    elif kind == 2:  # environment (equirect full sphere)
        res = cam.resolution.astype(jnp.float32)
        theta = jnp.pi * p_film[:, 1] / res[1]
        phi = 2.0 * jnp.pi * p_film[:, 0] / res[0]
        d_cam = jnp.stack(
            [jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta),
             jnp.sin(theta) * jnp.sin(phi)], axis=-1)
        o_cam = jnp.zeros((N, 3))
    else:
        o_cam = jnp.zeros((N, 3))
        d_cam = vm.normalize(p_cam)

    if u_lens is not None:
        # thin lens depth of field (ref: perspective.cpp:244)
        p_lens = cam.lens_radius * smp.concentric_sample_disk(u_lens)
        ft = cam.focal_distance / jnp.maximum(d_cam[:, 2], 1e-6)
        p_focus = o_cam + ft[:, None] * d_cam
        o_lens = jnp.concatenate(
            [p_lens, jnp.zeros((N, 1), p_lens.dtype)], axis=-1)
        use = cam.lens_radius > 0.0
        o_cam = jnp.where(use, o_lens, o_cam)
        d_cam = jnp.where(use, vm.normalize(p_focus - o_lens), d_cam)

    o = _apply44_point(cam.cam_to_world, o_cam)
    d = vm.normalize(_apply44_vector(cam.cam_to_world, d_cam))
    return o, d


def camera_position(cam: Camera):
    """(ref: camera.cpp getCameraWorldPosition — IILE addition)."""
    return cam.cam_to_world[:3, 3]


# ---------------------------------------------------------------------------
# Hemispheric probe cameras (batched)
# ---------------------------------------------------------------------------

def hemi_frames(pos: jnp.ndarray, normal: jnp.ndarray):
    """LookAt frames for P probes (ref: hemispheric.cpp:108-158).

    Up = (0,0,1) unless the normal is the z axis, then (0,1,0).
    Returns (right, up, look) each (P,3): camera x, y, z axes in world.
    """
    d = vm.normalize(normal)
    pole = (jnp.abs(d[..., 0]) < 1e-9) & (jnp.abs(d[..., 1]) < 1e-9)
    up = jnp.where(
        pole[..., None],
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), d.shape),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), d.shape),
    )
    # pbrt LookAt: right = normalize(cross(normalize(up), dir))
    right = vm.normalize(jnp.cross(up, d))
    new_up = jnp.cross(d, right)
    return right, new_up, d


def hemi_directions(hemi_size: int, dtype=jnp.float32):
    """Camera-space direction for each probe pixel center, (H,W,3), plus
    sin(theta) weights (H,W).  theta over rows, phi over cols
    (ref: hemispheric.cpp:15-41; pixel centers at +0.5)."""
    ys = (jnp.arange(hemi_size, dtype=dtype) + 0.5) / hemi_size
    xs = (jnp.arange(hemi_size, dtype=dtype) + 0.5) / hemi_size
    theta = jnp.pi * ys[:, None]    # (H,1)
    phi = jnp.pi * xs[None, :]      # (1,W)
    sin_t = jnp.sin(theta)
    d = jnp.stack(
        [
            jnp.broadcast_to(sin_t * jnp.cos(phi), (hemi_size, hemi_size)),
            jnp.broadcast_to(jnp.cos(theta) * jnp.ones_like(phi),
                             (hemi_size, hemi_size)),
            jnp.broadcast_to(sin_t * jnp.sin(phi), (hemi_size, hemi_size)),
        ],
        axis=-1,
    )
    return d, jnp.broadcast_to(sin_t, (hemi_size, hemi_size))


def hemi_generate_rays(pos, normal, hemi_size: int, jitter=None):
    """Batched probe ray-gen: pos, normal (P,3) -> o, d (P,H,W,3).

    jitter: optional (P,H,W,2) in [0,1) for sub-pixel jitter.
    """
    P = pos.shape[0]
    right, up, look = hemi_frames(pos, normal)
    if jitter is None:
        d_cam, _ = hemi_directions(hemi_size, pos.dtype)
        d_cam = jnp.broadcast_to(d_cam[None], (P, hemi_size, hemi_size, 3))
    else:
        ys = (jnp.arange(hemi_size, dtype=pos.dtype)[None, :, None]
              + jitter[..., 1]) / hemi_size
        xs = (jnp.arange(hemi_size, dtype=pos.dtype)[None, None, :]
              + jitter[..., 0]) / hemi_size
        theta = jnp.pi * ys
        phi = jnp.pi * xs
        sin_t = jnp.sin(theta)
        d_cam = jnp.stack(
            [sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi)],
            axis=-1)
    d = (
        d_cam[..., 0:1] * right[:, None, None, :]
        + d_cam[..., 1:2] * up[:, None, None, :]
        + d_cam[..., 2:3] * look[:, None, None, :]
    )
    o = jnp.broadcast_to(pos[:, None, None, :], d.shape)
    return o, d


def hemi_dir_to_pixel(wi_world, right, up, look, hemi_size: int):
    """Inverse mapping: world direction -> probe pixel (x, y) + in-range
    mask (ref: hemispheric.cpp getLightSampleNn: theta = acos(y_cam),
    phi = atan2(z_cam, x_cam))."""
    x_c = vm.dot(wi_world, right)
    y_c = vm.dot(wi_world, up)
    z_c = vm.dot(wi_world, look)
    theta = jnp.arccos(jnp.clip(y_c, -1.0, 1.0))
    phi = jnp.arctan2(z_c, x_c)
    fx = hemi_size * phi / jnp.pi
    fy = hemi_size * theta / jnp.pi
    x = jnp.floor(fx).astype(jnp.int32)
    y = jnp.floor(fy).astype(jnp.int32)
    ok = (x >= 0) & (x < hemi_size) & (y >= 0) & (y < hemi_size)
    return x, y, ok
