"""Generate scenes/atrium.pbrt — the repo's interior benchmark scene.

Role: stand-in for the reference's whiteroom/mbed1 interiors
(ref: tools/progressive_iile_render.py:11-15 — those scenes are not
redistributable), exercising what IILE exists for: indirect-dominated
interiors with occluded emitters.

Layout: two rooms joined by a doorway.  Room A has two window openings
through which a bright sun (distant light) and sky (infinite light)
enter; room B has no window and only an UP-facing shaded lamp — both
rooms are lit almost entirely by bounce light.  Furniture (lathed
vases, a table, shelf, seat) is procedurally tessellated to ~90k
triangles, written as binary PLY (scene/ply.py reads them back).

Usage: python scripts/make_atrium.py  (writes scenes/atrium.pbrt + PLYs)
"""

import os
import struct
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "scenes")


def write_ply(path, verts, faces):
    """Minimal binary-little-endian PLY writer (x y z nx ny nz)."""
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int32)
    # vertex normals = area-weighted face normals
    n = np.zeros_like(v)
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    for k in range(3):
        np.add.at(n, f[:, k], fn)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(ln, 1e-12)
    with open(path, "wb") as fh:
        fh.write(b"ply\nformat binary_little_endian 1.0\n")
        fh.write(f"element vertex {len(v)}\n".encode())
        fh.write(b"property float x\nproperty float y\nproperty float z\n")
        fh.write(b"property float nx\nproperty float ny\nproperty float nz\n")
        fh.write(f"element face {len(f)}\n".encode())
        fh.write(b"property list uchar int vertex_indices\nend_header\n")
        inter = np.hstack([v, n]).astype("<f4")
        fh.write(inter.tobytes())
        hdr = np.full((len(f), 1), 3, np.uint8)
        body = b"".join(struct.pack("<B3i", 3, *ff) for ff in f)
        fh.write(body)


def lathe(profile_rz, segments=96, cap=True):
    """Surface of revolution around +y: profile [(r, z)] -> (verts, faces)."""
    pr = np.asarray(profile_rz, np.float64)
    P = len(pr)
    th = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    verts = np.zeros((P * segments, 3))
    for i, (r, z) in enumerate(pr):
        verts[i * segments:(i + 1) * segments, 0] = r * np.cos(th)
        verts[i * segments:(i + 1) * segments, 2] = r * np.sin(th)
        verts[i * segments:(i + 1) * segments, 1] = z
    faces = []
    for i in range(P - 1):
        for j in range(segments):
            j2 = (j + 1) % segments
            a = i * segments + j
            b = i * segments + j2
            c = (i + 1) * segments + j2
            d = (i + 1) * segments + j
            faces.append([a, b, c])
            faces.append([a, c, d])
    return np.asarray(verts), np.asarray(faces, np.int64)


def grid_patch(x0, x1, z0, z1, y_fn, nx=64, nz=64):
    """Height-field patch y = y_fn(x, z)."""
    xs = np.linspace(x0, x1, nx)
    zs = np.linspace(z0, z1, nz)
    gx, gz = np.meshgrid(xs, zs)
    gy = y_fn(gx, gz)
    verts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], 1)
    faces = []
    for i in range(nz - 1):
        for j in range(nx - 1):
            a = i * nx + j
            b = a + 1
            c = a + nx + 1
            d = a + nx
            faces.append([a, b, c])
            faces.append([a, c, d])
    return verts, np.asarray(faces, np.int64)


def box(cx, cy, cz, sx, sy, sz):
    """Axis-aligned box as an inline trianglemesh string pair."""
    x0, x1 = cx - sx / 2, cx + sx / 2
    y0, y1 = cy - sy / 2, cy + sy / 2
    z0, z1 = cz - sz / 2, cz + sz / 2
    P = [(x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0),
         (x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1)]
    I = [0, 2, 1, 0, 3, 2,  4, 5, 6, 4, 6, 7,
         0, 1, 5, 0, 5, 4,  3, 6, 2, 3, 7, 6,
         0, 7, 3, 0, 4, 7,  1, 2, 6, 1, 6, 5]
    pts = " ".join(f"{c:g}" for p in P for c in p)
    idx = " ".join(str(i) for i in I)
    return (f'Shape "trianglemesh" "point P" [{pts}] '
            f'"integer indices" [{idx}]\n')


def wall_with_holes(x0, x1, y0, y1, z, holes, flip=False, nx=48, ny=48):
    """A z=const wall tessellated on a grid, skipping quads inside any
    hole (xmin,xmax,ymin,ymax).  Tessellation keeps the tri count up and
    gives the probe grid geometry to latch onto."""
    xs = np.linspace(x0, x1, nx)
    ys = np.linspace(y0, y1, ny)
    verts = []
    faces = []
    vid = {}

    def vget(i, j):
        if (i, j) not in vid:
            vid[(i, j)] = len(verts)
            verts.append([xs[j], ys[i], z])
        return vid[(i, j)]

    for i in range(ny - 1):
        for j in range(nx - 1):
            cxm = 0.5 * (xs[j] + xs[j + 1])
            cym = 0.5 * (ys[i] + ys[i + 1])
            if any(hx0 <= cxm <= hx1 and hy0 <= cym <= hy1
                   for hx0, hx1, hy0, hy1 in holes):
                continue
            a = vget(i, j)
            b = vget(i, j + 1)
            c = vget(i + 1, j + 1)
            d = vget(i + 1, j)
            if flip:
                faces.append([a, c, b])
                faces.append([a, d, c])
            else:
                faces.append([a, b, c])
                faces.append([a, c, d])
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def main():
    os.makedirs(OUT, exist_ok=True)
    plys = {}

    # --- furniture meshes ---
    vase_prof = [(0.001, 0.0), (0.16, 0.02), (0.22, 0.25), (0.12, 0.55),
                 (0.16, 0.75), (0.20, 0.92), (0.17, 1.0), (0.145, 0.96),
                 (0.10, 0.78), (0.085, 0.55), (0.15, 0.28), (0.11, 0.06),
                 (0.001, 0.04)]
    plys["vase"] = lathe(vase_prof, segments=160)

    bowl_prof = [(0.001, 0.0), (0.28, 0.02), (0.34, 0.10), (0.36, 0.22),
                 (0.33, 0.24), (0.30, 0.12), (0.05, 0.05), (0.001, 0.045)]
    plys["bowl"] = lathe(bowl_prof, segments=128)

    lamp_prof = [(0.001, 0.0), (0.22, 0.01), (0.06, 0.05), (0.03, 0.7),
                 (0.24, 0.85), (0.30, 1.05), (0.001, 1.02)]
    plys["lamp"] = lathe(lamp_prof, segments=96)

    # crumpled rug: displaced height-field
    rng = np.random.default_rng(7)
    ph = rng.uniform(0, 2 * np.pi, 8)

    def rug_y(x, z):
        y = 0.012 * np.ones_like(x)
        for k in range(8):
            y += 0.004 * np.sin((k + 2) * 1.7 * x + ph[k]) * \
                np.cos((k + 1) * 1.3 * z + ph[7 - k])
        return y
    plys["rug"] = grid_patch(-1.2, 1.2, -0.8, 0.8, rug_y, nx=181, nz=121)

    # seat cushion
    def cushion_y(x, z):
        return 0.45 + 0.10 * np.exp(-((x / 0.45) ** 4 + (z / 0.4) ** 4))
    plys["cushion"] = grid_patch(-0.55, 0.55, -0.45, 0.45, cushion_y,
                                 nx=121, nz=101)

    # --- walls ---
    # Room A: x in [-4, 0], Room B: x in [0, 4]; z in [-3, 3]; y in [0, 3]
    # window wall (z=-3, room A): two windows
    wall_files = {}
    w, f = wall_with_holes(-4, 0, 0, 3, -3,
                           holes=[(-3.4, -2.2, 0.9, 2.4),
                                  (-1.6, -0.4, 0.9, 2.4)], nx=97, ny=73)
    plys["wall_win"] = (w, f)
    # dividing wall at x=0 with doorway
    wd, fd = wall_with_holes(-3, 3, 0, 3, 0,
                             holes=[(-0.7, 0.7, 0.0, 2.2)], nx=97, ny=73)
    # wall_with_holes builds in (x,y,z) with z const; remap to x=0 plane
    wd = wd[:, [2, 1, 0]]  # (z->x, y, x->z)
    plys["wall_div"] = (wd, fd)

    total = 0
    for name, (v, fc) in plys.items():
        write_ply(os.path.join(OUT, f"atrium_{name}.ply"), v, fc)
        total += len(fc)
    print(f"PLY meshes: {total} triangles")

    scene = f"""# atrium.pbrt — interior benchmark scene (generated by
# scripts/make_atrium.py; regenerate rather than editing the PLYs).
# Two rooms; sun+sky enter room A through two windows, room B is lit by
# bounce light and a shaded up-facing lamp.  The whiteroom/mbed1 role
# (ref: tools/progressive_iile_render.py:11-15).
LookAt -2.2 1.5 2.45   0.8 1.15 -0.6   0 1 0
Camera "perspective" "float fov" [68]
Film "image" "integer xresolution" [512] "integer yresolution" [512]
    "string filename" ["atrium.exr"]
Sampler "sobol" "integer pixelsamples" [16]
Integrator "path" "integer maxdepth" [6]

WorldBegin

# ---- sun + sky through the windows ----
LightSource "distant" "rgb L" [18 16.2 13.5]
    "point from" [-30 40 -60] "point to" [0 0 0]
LightSource "infinite" "rgb L" [1.1 1.35 1.8]

# ---- room B lamp: bright disk facing the ceiling under a shade ----
AttributeBegin
  Material "matte" "rgb Kd" [0 0 0]
  AreaLightSource "area" "rgb L" [60 52 38]
  Translate 2.8 1.62 -1.9
  Shape "trianglemesh" "point P" [-0.14 0 -0.14  0.14 0 -0.14  0.14 0 0.14  -0.14 0 0.14]
      "integer indices" [0 2 1 0 3 2]
AttributeEnd
AttributeBegin
  Material "metal" "float roughness" [0.08]
  Translate 2.8 0.6 -1.9
  Shape "plymesh" "string filename" ["atrium_lamp.ply"]
AttributeEnd

# ---- shell ----
Material "matte" "rgb Kd" [0.72 0.70 0.66]
# floor
Shape "trianglemesh" "point P" [-4 0 -3  4 0 -3  4 0 3  -4 0 3]
    "integer indices" [0 2 1 0 3 2]
# ceiling
Shape "trianglemesh" "point P" [-4 3 -3  4 3 -3  4 3 3  -4 3 3]
    "integer indices" [0 1 2 0 2 3]
# back wall z=+3
Material "matte" "rgb Kd" [0.70 0.62 0.50]
Shape "trianglemesh" "point P" [-4 0 3  4 0 3  4 3 3  -4 3 3]
    "integer indices" [0 2 1 0 3 2]
# room-B window-side wall z=-3 (solid)
Shape "trianglemesh" "point P" [0 0 -3  4 0 -3  4 3 -3  0 3 -3]
    "integer indices" [0 1 2 0 2 3]
# end walls
Material "matte" "rgb Kd" [0.30 0.42 0.55]
Shape "trianglemesh" "point P" [-4 0 -3  -4 0 3  -4 3 3  -4 3 -3]
    "integer indices" [0 1 2 0 2 3]
Material "matte" "rgb Kd" [0.55 0.36 0.28]
Shape "trianglemesh" "point P" [4 0 -3  4 0 3  4 3 3  4 3 -3]
    "integer indices" [0 2 1 0 3 2]
# window wall (room A, two openings)
Material "matte" "rgb Kd" [0.75 0.73 0.70]
Shape "plymesh" "string filename" ["atrium_wall_win.ply"]
# dividing wall with doorway
Shape "plymesh" "string filename" ["atrium_wall_div.ply"]

# ---- furniture, room A ----
Material "plastic" "rgb Kd" [0.10 0.35 0.48] "rgb Ks" [0.35 0.35 0.35]
    "float roughness" [0.06]
AttributeBegin
  Translate -1.9 0.001 0.4
  Shape "plymesh" "string filename" ["atrium_rug.ply"]
AttributeEnd
Material "uber" "rgb Kd" [0.46 0.33 0.22] "rgb Ks" [0.18 0.18 0.18]
    "float roughness" [0.12]
{box(-1.9, 0.62, 0.4, 1.5, 0.06, 0.9)}{box(-2.5, 0.3, 0.1, 0.07, 0.6, 0.07)}{box(-1.3, 0.3, 0.1, 0.07, 0.6, 0.07)}{box(-2.5, 0.3, 0.7, 0.07, 0.6, 0.07)}{box(-1.3, 0.3, 0.7, 0.07, 0.6, 0.07)}
AttributeBegin
  Material "glass" "float eta" [1.5]
  Translate -2.2 0.652 0.35
  Scale 0.55 0.55 0.55
  Shape "plymesh" "string filename" ["atrium_vase.ply"]
AttributeEnd
AttributeBegin
  Material "metal" "float roughness" [0.02]
  Translate -1.55 0.652 0.5
  Scale 0.5 0.5 0.5
  Shape "plymesh" "string filename" ["atrium_bowl.ply"]
AttributeEnd
# seat by the window
Material "matte" "rgb Kd" [0.58 0.20 0.16]
{box(-0.9, 0.225, -2.2, 1.2, 0.45, 1.0)}AttributeBegin
  Translate -0.9 0.0 -2.2
  Shape "plymesh" "string filename" ["atrium_cushion.ply"]
AttributeEnd

# ---- furniture, room B ----
Material "uber" "rgb Kd" [0.40 0.40 0.42] "rgb Ks" [0.2 0.2 0.2]
    "float roughness" [0.2]
{box(2.4, 0.45, 1.8, 1.8, 0.9, 0.7)}{box(2.4, 1.35, 2.05, 1.8, 0.9, 0.2)}
Material "matte" "rgb Kd" [0.66 0.60 0.34]
AttributeBegin
  Translate 2.0 0.902 1.75
  Scale 0.45 0.45 0.45
  Shape "plymesh" "string filename" ["atrium_vase.ply"]
AttributeEnd
Material "matte" "rgb Kd" [0.24 0.40 0.24]
{box(1.2, 0.35, -0.6, 0.7, 0.7, 0.7)}
WorldEnd
"""
    with open(os.path.join(OUT, "atrium.pbrt"), "w") as fh:
        fh.write(scene)
    print(f"wrote {os.path.join(OUT, 'atrium.pbrt')}")


if __name__ == "__main__":
    main()
