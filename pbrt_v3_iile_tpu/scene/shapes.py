"""Shape -> world-space triangle soup conversion (host-side, numpy).

Replaces the reference's per-shape plugin classes (ref: src/shapes/*): on
TPU every surface is triangles in one flat array; quadrics are tessellated
at build time (analytic sphere *lights* stay analytic for cone sampling —
see scene/api.py).
"""

from __future__ import annotations

import os

import numpy as np

from ..utils import transforms as xf
from . import loopsubdiv, ply
from .paramset import ParamSet


def create_triangles(kind: str, ps: ParamSet, ctm, reverse_orientation: bool,
                     base_dir: str):
    """Returns (p (T,3,3), n (T,3,3) or None, uv (T,3,2) or None)."""
    if kind == "trianglemesh":
        mesh = _trianglemesh(ps)
    elif kind == "plymesh":
        fn = ps.find_one_string("filename", "")
        if not os.path.isabs(fn):
            fn = os.path.join(base_dir, fn)
        mesh = ply.load_ply(fn)
    elif kind == "loopsubdiv":
        p = ps.find_points("P")
        idx = ps.find_ints("indices").reshape(-1, 3)
        nlevels = ps.find_one_int("nlevels", ps.find_one_int("levels", 3))
        v, n, f = loopsubdiv.subdivide(p, idx, nlevels)
        mesh = {"p": v, "n": n, "indices": f}
    elif kind == "sphere":
        mesh = _tessellate_sphere(ps)
    elif kind == "disk":
        mesh = _tessellate_disk(ps)
    elif kind == "cylinder":
        mesh = _tessellate_cylinder(ps)
    elif kind in ("cone", "paraboloid", "hyperboloid", "curve", "nurbs",
                  "heightfield"):
        # Rare in target scenes; ignored with a warning for now.
        import sys
        print(f"warning: shape '{kind}' not supported yet, skipping",
              file=sys.stderr)
        return None
    else:
        import sys
        print(f"warning: unknown shape '{kind}', skipping", file=sys.stderr)
        return None

    if mesh is None:
        return None
    p = xf.apply_point(ctm, mesh["p"])
    n = None
    if mesh.get("n") is not None:
        n = xf.apply_normal(ctm, mesh["n"])
        ln = np.linalg.norm(n, axis=-1, keepdims=True)
        n = np.where(ln > 1e-20, n / np.maximum(ln, 1e-20), 0.0)
    idx = mesh["indices"]
    flip = reverse_orientation != xf.swaps_handedness(ctm)
    if flip and n is not None:
        n = -n
    tp = p[idx].astype(np.float32)                     # (T, 3, 3)
    tn = None if n is None else n[idx].astype(np.float32)
    tuv = None
    if mesh.get("uv") is not None:
        tuv = np.asarray(mesh["uv"])[idx].astype(np.float32)
    if flip:
        # swap winding so the geometric normal flips consistently
        tp = tp[:, [0, 2, 1], :]
        if tn is not None:
            tn = tn[:, [0, 2, 1], :]
        if tuv is not None:
            tuv = tuv[:, [0, 2, 1], :]
    return tp, tn, tuv


def _trianglemesh(ps: ParamSet):
    p = ps.find_points("P")
    idx = ps.find_ints("indices")
    if p is None or idx is None:
        return None
    mesh = {"p": p, "indices": idx.reshape(-1, 3)}
    n = ps.find_points("N")
    if n is not None:
        mesh["n"] = n
    uv = ps.find_floats("uv")
    if uv is None:
        uv = ps.find_floats("st")
    if uv is not None:
        mesh["uv"] = uv.reshape(-1, 2)
    return mesh


def _tessellate_sphere(ps: ParamSet, n_theta: int = 32, n_phi: int = 64):
    """Lat-long tessellation with per-vertex exact normals; a tessellated
    sphere with smooth normals is visually equivalent to the analytic
    quadric (ref: src/shapes/sphere.cpp) at these densities."""
    r = ps.find_one_float("radius", 1.0)
    zmin = ps.find_one_float("zmin", -r)
    zmax = ps.find_one_float("zmax", r)
    theta_min = np.arccos(np.clip(zmax / r, -1, 1))
    theta_max = np.arccos(np.clip(zmin / r, -1, 1))
    phi_max = np.deg2rad(ps.find_one_float("phimax", 360.0))
    t = np.linspace(theta_min, theta_max, n_theta + 1)
    ph = np.linspace(0.0, phi_max, n_phi + 1)
    tt, pp = np.meshgrid(t, ph, indexing="ij")
    x = np.sin(tt) * np.cos(pp)
    y = np.sin(tt) * np.sin(pp)
    z = np.cos(tt)
    verts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    nrm = verts.copy()
    p = verts * r
    uv = np.stack([pp / max(phi_max, 1e-9),
                   (tt - theta_min) / max(theta_max - theta_min, 1e-9)],
                  axis=-1).reshape(-1, 2)
    idx = []
    W = n_phi + 1
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * W + j
            b = a + 1
            c = a + W
            d = c + 1
            idx.append([a, d, b])
            idx.append([a, c, d])
    return {"p": p, "n": nrm, "uv": uv, "indices": np.asarray(idx)}


def _tessellate_disk(ps: ParamSet, n: int = 64):
    r = ps.find_one_float("radius", 1.0)
    ir = ps.find_one_float("innerradius", 0.0)
    h = ps.find_one_float("height", 0.0)
    phi_max = np.deg2rad(ps.find_one_float("phimax", 360.0))
    ph = np.linspace(0.0, phi_max, n + 1)
    outer = np.stack([r * np.cos(ph), r * np.sin(ph), np.full_like(ph, h)], axis=-1)
    if ir > 0:
        inner = np.stack([ir * np.cos(ph), ir * np.sin(ph), np.full_like(ph, h)],
                         axis=-1)
        verts = np.concatenate([outer, inner], axis=0)
        idx = []
        for j in range(n):
            a, b = j, j + 1
            c, d = n + 1 + j, n + 1 + j + 1
            idx.append([a, b, d])
            idx.append([a, d, c])
    else:
        center = np.array([[0.0, 0.0, h]])
        verts = np.concatenate([outer, center], axis=0)
        idx = [[n + 1, j, j + 1] for j in range(n)]
    nrm = np.tile(np.array([[0.0, 0.0, 1.0]]), (verts.shape[0], 1))
    return {"p": verts, "n": nrm, "indices": np.asarray(idx)}


def _tessellate_cylinder(ps: ParamSet, n: int = 64):
    r = ps.find_one_float("radius", 1.0)
    zmin = ps.find_one_float("zmin", -1.0)
    zmax = ps.find_one_float("zmax", 1.0)
    phi_max = np.deg2rad(ps.find_one_float("phimax", 360.0))
    ph = np.linspace(0.0, phi_max, n + 1)
    bottom = np.stack([r * np.cos(ph), r * np.sin(ph), np.full_like(ph, zmin)],
                      axis=-1)
    top = np.stack([r * np.cos(ph), r * np.sin(ph), np.full_like(ph, zmax)],
                   axis=-1)
    verts = np.concatenate([bottom, top], axis=0)
    nrm = np.concatenate(
        [np.stack([np.cos(ph), np.sin(ph), np.zeros_like(ph)], axis=-1)] * 2,
        axis=0,
    )
    idx = []
    for j in range(n):
        a, b = j, j + 1
        c, d = n + 1 + j, n + 1 + j + 1
        idx.append([a, b, d])
        idx.append([a, d, c])
    return {"p": verts, "n": nrm, "indices": np.asarray(idx)}
