"""Ptex per-face texture tests (ref: src/textures/ptex.{h,cpp}; the
reference wraps the external Ptex lib — here scene/ptex.py implements
the container + a flat per-face device pool)."""

import os

import numpy as np
import jax.numpy as jnp

from pbrt_v3_iile_tpu.scene import ptex as ptexlib


def test_ptx_round_trip(tmp_path):
    p = str(tmp_path / "t.ptx")
    pf = ptexlib.make_test_ptx(p, n_faces=5, res_log2=3)
    back = ptexlib.read_ptx(p)
    assert back.meshtype == pf.meshtype
    assert back.nchannels == 3
    assert len(back.faces) == 5
    for a, b in zip(pf.faces, back.faces):
        assert a.shape == b.shape
        assert np.allclose(a, b, atol=1e-6)
    assert np.array_equal(back.res, pf.res)
    assert np.array_equal(back.adjfaces, pf.adjfaces)


def test_ptx_round_trip_uint8(tmp_path):
    p = str(tmp_path / "t8.ptx")
    pf = ptexlib.PtexFile()
    pf.res = np.full((2, 2), 2, np.int32)
    pf.adjfaces = np.full((2, 4), -1, np.int32)
    pf.adjedges = np.zeros(2, np.uint32)
    pf.const = np.zeros((2, 3), np.float32)
    pf.faces = [np.full((4, 4, 3), 0.5, np.float32),
                np.full((4, 4, 3), 0.25, np.float32)]
    ptexlib.write_ptx(p, pf, datatype=0)
    back = ptexlib.read_ptx(p)
    assert np.allclose(back.faces[0], 0.5, atol=1 / 255.0)
    assert np.allclose(back.faces[1], 0.25, atol=1 / 255.0)


def test_ptx_rejects_garbage(tmp_path):
    p = tmp_path / "bad.ptx"
    p.write_bytes(b"not a ptex file at all........")
    try:
        ptexlib.read_ptx(str(p))
        assert False, "should have raised"
    except ValueError:
        pass


def test_face_tables_and_eval(tmp_path):
    """Flat pool build + device bilinear lookup selects the right face."""
    from pbrt_v3_iile_tpu.scene import textures as texlib

    pf = ptexlib.PtexFile()
    nf = 3
    pf.res = np.full((nf, 2), 1, np.int32)
    pf.adjfaces = np.full((nf, 4), -1, np.int32)
    pf.adjedges = np.zeros(nf, np.uint32)
    pf.const = np.zeros((nf, 3), np.float32)
    colors = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]
    pf.faces = [np.full((2, 2, 3), c, np.float32) for c in colors]
    bases, (off, ru, rv, pool) = ptexlib.build_face_tables([pf])
    assert bases == [0]
    assert pool.shape == (nf * 16, 3)   # (2+2)x(2+2) padded per face

    tt = texlib.empty_table()._replace(
        kind=jnp.asarray([texlib.TEX_PTEX], jnp.int32),
        ptex_base=jnp.asarray([0], jnp.int32),
        ptex_off=jnp.asarray(off), ptex_resu=jnp.asarray(ru),
        ptex_resv=jnp.asarray(rv), ptex_texels=jnp.asarray(pool))
    uv = jnp.full((3, 2), 0.5, jnp.float32)
    p = jnp.zeros((3, 3), jnp.float32)
    face = jnp.arange(3, dtype=jnp.int32)
    tid = jnp.zeros(3, jnp.int32)
    out = np.asarray(texlib.eval_texture(tt, tid, uv, p, face=face))
    assert np.allclose(out, colors, atol=1e-6), out


def test_ptex_render_end_to_end(tmp_path):
    """Scene with a 2-quad mesh + faceIndices and a 2-face ptex: each
    half of the floor picks its own face color through the wavefront."""
    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib

    ptx = str(tmp_path / "faces.ptx")
    pf = ptexlib.PtexFile()
    pf.res = np.full((2, 2), 2, np.int32)
    pf.adjfaces = np.full((2, 4), -1, np.int32)
    pf.adjedges = np.zeros(2, np.uint32)
    pf.const = np.zeros((2, 3), np.float32)
    pf.faces = [np.full((4, 4, 3), (0.9, 0.05, 0.05), np.float32),
                np.full((4, 4, 3), (0.05, 0.05, 0.9), np.float32)]
    ptexlib.write_ptx(ptx, pf)

    scene = tmp_path / "s.pbrt"
    scene.write_text(f"""
LookAt 0 3 0  0 0 0  0 0 1
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Integrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "distant" "rgb L" [3 3 3] "point from" [0 5 0] "point to" [0 0 0]
Texture "faces" "color" "ptex" "string filename" "{ptx}" "float gamma" [1]
Material "matte" "texture Kd" "faces"
Shape "trianglemesh"
  "integer indices" [0 1 2 0 2 3  4 5 6 4 6 7]
  "integer faceIndices" [0 0 1 1]
  "point P" [-2 0 -2  0 0 -2  0 0 2  -2 0 2
             0 0 -2  2 0 -2  2 0 2  0 0 2]
WorldEnd
""")
    sd = apilib.load_scene(str(scene))
    img, _ = renderlib.render(sd, spp=4, seed=1)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    h, w = img.shape[:2]
    left = img[:, : w // 3]     # x < 0 half: face 0 (red)
    right = img[:, -w // 3:]    # x > 0 half: face 1 (blue)
    assert left[..., 0].mean() > 3.0 * left[..., 2].mean()
    assert right[..., 2].mean() > 3.0 * right[..., 0].mean()


def test_ptex_cross_face_border_continuity():
    """Bilinear filtering must be continuous ACROSS a shared face edge
    (ref: textures/ptex.cpp:91 PtexFilter): two adjacent faces with
    different constant colors blend linearly through the boundary
    instead of clamping to their own color."""
    from pbrt_v3_iile_tpu.scene import textures as texlib

    pf = ptexlib.PtexFile()
    pf.res = np.full((2, 2), 2, np.int32)       # 4x4 faces
    # face 0's right edge (e=1) touches face 1's left edge (e=3)
    pf.adjfaces = np.asarray([[-1, 1, -1, -1],
                              [-1, -1, -1, 0]], np.int32)
    pf.adjedges = np.asarray([3 << 2, 1 << 6], np.uint32)
    pf.const = np.zeros((2, 3), np.float32)
    pf.faces = [np.full((4, 4, 3), 0.2, np.float32),
                np.full((4, 4, 3), 0.8, np.float32)]
    bases, (off, ru, rv, pool) = ptexlib.build_face_tables([pf])

    tt = texlib.empty_table()._replace(
        kind=jnp.asarray([texlib.TEX_PTEX], jnp.int32),
        ptex_base=jnp.asarray([0], jnp.int32),
        ptex_off=jnp.asarray(off), ptex_resu=jnp.asarray(ru),
        ptex_resv=jnp.asarray(rv), ptex_texels=jnp.asarray(pool))

    # walk u across face 0 toward the shared edge and into face 1:
    # samples u=7/8 (last texel center, pure 0.2), u=1.0 on face 0
    # (midpoint 0.5), u=0.0 on face 1 (midpoint 0.5), u=1/8 (pure 0.8)
    uv = jnp.asarray([[7 / 8, 0.5], [1.0, 0.5], [0.0, 0.5], [1 / 8, 0.5]],
                     jnp.float32)
    face = jnp.asarray([0, 0, 1, 1], jnp.int32)
    tid = jnp.zeros(4, jnp.int32)
    p = jnp.zeros((4, 3), jnp.float32)
    out = np.asarray(texlib.eval_texture(tt, tid, uv, p, face=face))[:, 0]
    assert abs(out[0] - 0.2) < 1e-5, out
    assert abs(out[3] - 0.8) < 1e-5, out
    # at the shared edge both faces see the same 50/50 blend
    assert abs(out[1] - 0.5) < 1e-5, out
    assert abs(out[2] - 0.5) < 1e-5, out
    # monotone ramp through the border
    assert out[0] < out[1] <= out[2] < out[3]


def test_ptex_open_edge_clamps():
    """Faces with no neighbor keep the old clamp behavior exactly."""
    from pbrt_v3_iile_tpu.scene import textures as texlib

    pf = ptexlib.PtexFile()
    pf.res = np.full((1, 2), 2, np.int32)
    pf.adjfaces = np.full((1, 4), -1, np.int32)
    pf.adjedges = np.zeros(1, np.uint32)
    pf.const = np.zeros((1, 3), np.float32)
    rng = np.random.default_rng(3)
    pf.faces = [rng.uniform(0, 1, (4, 4, 3)).astype(np.float32)]
    bases, (off, ru, rv, pool) = ptexlib.build_face_tables([pf])
    tt = texlib.empty_table()._replace(
        kind=jnp.asarray([texlib.TEX_PTEX], jnp.int32),
        ptex_base=jnp.asarray([0], jnp.int32),
        ptex_off=jnp.asarray(off), ptex_resu=jnp.asarray(ru),
        ptex_resv=jnp.asarray(rv), ptex_texels=jnp.asarray(pool))
    uv = jnp.asarray([[0.0, 0.5], [1.0, 0.5], [0.5, 0.0], [0.5, 1.0]],
                     jnp.float32)
    face = jnp.zeros(4, jnp.int32)
    tid = jnp.zeros(4, jnp.int32)
    p = jnp.zeros((4, 3), jnp.float32)
    out = np.asarray(texlib.eval_texture(tt, tid, uv, p, face=face))
    f = pf.faces[0]
    exp = np.stack([0.5 * (f[1, 0] + f[2, 0]), 0.5 * (f[1, 3] + f[2, 3]),
                    0.5 * (f[0, 1] + f[0, 2]), 0.5 * (f[3, 1] + f[3, 2])])
    np.testing.assert_allclose(out, exp, atol=1e-5)


def test_ptx_tiled_roundtrip(tmp_path):
    """A 256x256 f32 face (768 KB) exceeds the 64 KiB tile threshold and
    must round-trip through the enc_tiled face layout of the Ptex v1
    container (the real format's big-face path)."""
    from pbrt_v3_iile_tpu.scene import ptex as ptexlib
    import numpy as np

    pf = ptexlib.PtexFile()
    pf.nchannels = 3
    pf.res = np.asarray([[8, 8]], np.int32)
    pf.adjfaces = np.full((1, 4), -1, np.int32)
    pf.adjedges = np.zeros(1, np.uint32)
    r = 256
    u = np.linspace(0, 1, r)[None, :, None]
    v = np.linspace(0, 1, r)[:, None, None]
    face = np.concatenate([u + 0 * v, v + 0 * u, 0.5 * (u + v)],
                          axis=-1).astype(np.float32)
    pf.faces = [face]
    pf.const = face.mean(axis=(0, 1))[None]
    path = str(tmp_path / "big.ptx")
    ptexlib.write_ptx(path, pf)
    pf2 = ptexlib.read_ptx(path)
    np.testing.assert_allclose(pf2.faces[0], face, rtol=0, atol=1e-6)


def test_ptx_u8_diffzipped_roundtrip(tmp_path):
    """u8 faces use the diff-zipped encoding (PtexUtils
    encodeDifference); values must survive the delta coding."""
    from pbrt_v3_iile_tpu.scene import ptex as ptexlib
    import numpy as np

    rng = np.random.default_rng(1)
    pf = ptexlib.PtexFile()
    pf.nchannels = 3
    pf.res = np.asarray([[4, 3]], np.int32)
    pf.adjfaces = np.full((1, 4), -1, np.int32)
    pf.adjedges = np.zeros(1, np.uint32)
    face = rng.uniform(0, 1, (8, 16, 3)).astype(np.float32)
    pf.faces = [face]
    pf.const = face.mean(axis=(0, 1))[None]
    path = str(tmp_path / "u8.ptx")
    ptexlib.write_ptx(path, pf, datatype=0)
    pf2 = ptexlib.read_ptx(path)
    np.testing.assert_allclose(pf2.faces[0], face, atol=1.0 / 255 + 1e-6)
