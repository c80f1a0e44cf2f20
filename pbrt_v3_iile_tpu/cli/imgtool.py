"""imgtool — offline image manipulation CLI.

Parity target: the reference's src/tools/imgtool.cpp (commands
assemble, cat, convert, diff, info, makesky — usage at
imgtool.cpp:32-85).  Pure numpy re-implementation:

- assemble: merge EXR crops (each file written with a data window)
  into one full image.  Our EXRs are always full-frame, so crops are
  passed as ``file:x0,y0`` offsets instead of embedded windows.
- cat: dump pixel values as text (``--sort`` by luminance,
  imgtool.cpp:288-335 semantics).
- convert: flipy / scale / repeatpix / tonemap (Reinhard photographic
  operator, imgtool.cpp tonemap path) / --preservecolors /
  --maxluminance / despike (median-of-3x3 above a luminance) /
  bloom (threshold + blurred add, imgtool.cpp:380-470 semantics).
- diff: mean-relative difference with --difftol gate and optional
  absolute-difference output image (imgtool.cpp:338-470).
- info: resolution, min/max/avg per channel (imgtool.cpp:476-560).
- makesky: latitude-longitude sun+sky environment map.  The reference
  vendors the Hosek-Wilkie model (ext/ArHosekSkyModel); we synthesize
  the map with the Preetham analytic sky (same inputs: turbidity,
  albedo-free luminance scaling, sun elevation; same output layout:
  equirect, 2R x R, EXR) — a documented model substitution, not a
  port.

Usage: python -m pbrt_v3_iile_tpu.cli.imgtool <command> [options] files...
"""

from __future__ import annotations

import sys

import numpy as np


def _load(path):
    from ..utils import image as imglib

    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "pfm":
        return imglib.read_pfm(path)
    if ext == "exr":
        return imglib.read_exr(path)
    if ext == "png":
        return imglib.read_png(path).astype(np.float32) / 255.0
    if ext == "tga":
        return imglib.read_tga(path).astype(np.float32) / 255.0
    if ext == "npy":
        return np.load(path)
    raise SystemExit(f"imgtool: unknown input format {path}")


def _save(path, img):
    from ..utils import image as imglib

    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "pfm":
        imglib.write_pfm(path, img)
    elif ext == "exr":
        imglib.write_exr(path, img)
    elif ext == "png":
        imglib.write_png(path, np.clip(img, 0.0, 1.0))
    elif ext == "npy":
        np.save(path, img)
    else:
        raise SystemExit(f"imgtool: unknown output format {path}")


def _lum(img):
    img = np.atleast_3d(img)
    if img.shape[-1] < 3:
        return img[..., 0]
    return (0.212671 * img[..., 0] + 0.715160 * img[..., 1]
            + 0.072169 * img[..., 2])


def _pop_flag(argv, name):
    if name in argv:
        argv.remove(name)
        return True
    return False


def _pop_opt(argv, name, default=None, cast=float):
    for i, a in enumerate(argv):
        if a == name or a == "-" + name.lstrip("-"):
            if i + 1 >= len(argv):
                raise SystemExit(f"imgtool: missing value after {name}")
            v = argv[i + 1]
            del argv[i:i + 2]
            return cast(v)
    return default


def cmd_info(argv):
    for path in argv:
        img = np.atleast_3d(_load(path))
        h, w, c = img.shape
        print(f"{path}: resolution ({w}, {h}), {c} channels")
        for ci in range(c):
            ch = img[..., ci]
            print(f"  channel {ci}: min {ch.min():.6g} max {ch.max():.6g} "
                  f"avg {ch.mean():.6g}")
    return 0


def cmd_cat(argv):
    do_sort = _pop_flag(argv, "--sort") or _pop_flag(argv, "-sort")
    for path in argv:
        img = np.atleast_3d(_load(path))
        h, w, _ = img.shape
        ys, xs = np.mgrid[0:h, 0:w]
        rows = list(zip(ys.ravel(), xs.ravel(),
                        img.reshape(h * w, -1), _lum(img).ravel()))
        if do_sort:
            rows.sort(key=lambda r: r[3])
        for y, x, px, _ in rows:
            vals = " ".join(f"{v:.9g}" for v in px)
            print(f"({x}, {y}): {vals}")
    return 0


def cmd_assemble(argv):
    outfile = _pop_opt(argv, "--outfile", cast=str)
    if not outfile:
        raise SystemExit('imgtool: --outfile not provided for "assemble"')
    if not argv:
        raise SystemExit('imgtool: no filenames provided to "assemble"')
    tiles = []
    for spec in argv:
        if ":" in spec and not spec.endswith(":"):
            path, off = spec.rsplit(":", 1)
            x0, y0 = (int(v) for v in off.split(","))
        else:
            path, x0, y0 = spec, 0, 0
        tiles.append((np.atleast_3d(_load(path)), x0, y0))
    W = max(x0 + t.shape[1] for t, x0, _ in tiles)
    H = max(y0 + t.shape[0] for t, _, y0 in tiles)
    C = tiles[0][0].shape[-1]
    out = np.zeros((H, W, C), np.float32)
    seen = np.zeros((H, W), bool)
    for t, x0, y0 in tiles:
        h, w, _ = t.shape
        if seen[y0:y0 + h, x0:x0 + w].any():
            print("imgtool: warning: overlapping crop windows", file=sys.stderr)
        out[y0:y0 + h, x0:x0 + w] = t
        seen[y0:y0 + h, x0:x0 + w] = True
    if not seen.all():
        print("imgtool: warning: assembled image has unset pixels",
              file=sys.stderr)
    _save(outfile, out)
    print(f"wrote {outfile}")
    return 0


def _despike(img, thresh):
    lum = _lum(img)
    pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    stack = np.stack([pad[dy:dy + img.shape[0], dx:dx + img.shape[1]]
                      for dy in range(3) for dx in range(3)], axis=0)
    med = np.median(stack, axis=0)
    return np.where((lum > thresh)[..., None], med, img)


def _bloom(img, level, width, scale, iters):
    mask = np.where((img > level).any(axis=-1, keepdims=True), img, 0.0)
    radius = max(1, int(width) // 2)
    k = np.exp(-0.5 * (np.arange(-radius, radius + 1) / (radius / 2.0)) ** 2)
    k /= k.sum()
    blur = mask
    for _ in range(max(1, iters)):
        blur = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 0, blur)
        blur = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 1, blur)
    return img + scale * blur


def cmd_convert(argv):
    flipy = _pop_flag(argv, "--flipy") or _pop_flag(argv, "-flipy")
    tonemap = _pop_flag(argv, "--tonemap") or _pop_flag(argv, "-tonemap")
    preserve = (_pop_flag(argv, "--preservecolors")
                or _pop_flag(argv, "-preservecolors"))
    max_lum = _pop_opt(argv, "--maxluminance", 1.0)
    repeat = int(_pop_opt(argv, "--repeatpix", 1))
    scale = _pop_opt(argv, "--scale", 1.0)
    despike = _pop_opt(argv, "--despike", np.inf)
    bloom_level = _pop_opt(argv, "--bloomlevel", np.inf)
    bloom_width = int(_pop_opt(argv, "--bloomswidth", 15))
    bloom_scale = _pop_opt(argv, "--bloomscale", 0.3)
    bloom_iters = int(_pop_opt(argv, "--bloomiters", 5))
    if len(argv) != 2:
        raise SystemExit('imgtool: convert needs <input> <output>')
    img = np.atleast_3d(_load(argv[0])).astype(np.float32)

    if np.isfinite(bloom_level):
        img = _bloom(img, bloom_level, bloom_width, bloom_scale, bloom_iters)
    if np.isfinite(despike):
        img = _despike(img, despike)
    img = img * scale
    if tonemap:
        # Reinhard photographic operator, as in imgtool.cpp convert:
        # Ld = L (1 + L/maxL^2) / (1 + L)
        lum = _lum(img)
        ld = (1.0 + lum / (max_lum * max_lum)) / (1.0 + lum)
        img = img * ld[..., None]
    if preserve:
        m = img.max(axis=-1, keepdims=True)
        img = np.where(m > 1.0, img / np.maximum(m, 1e-9), img)
    if repeat > 1:
        img = np.repeat(np.repeat(img, repeat, axis=0), repeat, axis=1)
    if flipy:
        img = img[::-1]
    _save(argv[1], img)
    print(f"wrote {argv[1]}")
    return 0


def cmd_diff(argv):
    outfile = _pop_opt(argv, "--outfile", cast=str)
    tol = _pop_opt(argv, "--difftol", 0.0)
    if len(argv) != 2:
        raise SystemExit('imgtool: diff needs exactly two filenames')
    a = np.atleast_3d(_load(argv[0]))
    b = np.atleast_3d(_load(argv[1]))
    if a.shape != b.shape:
        raise SystemExit(f"imgtool: image size mismatch {a.shape} vs {b.shape}")
    d = np.abs(a - b)
    sum_a, sum_b = float(a.sum()), float(b.sum())
    avg = 0.5 * (sum_a + sum_b)
    rel = 100.0 * abs(sum_a - sum_b) / avg if avg != 0 else 0.0
    n_diff = int((d.sum(axis=-1) > 0).sum())
    if outfile:
        _save(outfile, d)
    if rel > tol:
        mse = float((d * d).mean())
        print(f"images differ: {rel:.6g}% ({n_diff} pixels), MSE {mse:.6g}")
        return 1
    return 0


# -- makesky: Preetham analytic sky (substitute for the vendored
#    Hosek-Wilkie tables; ref behavior: imgtool.cpp makesky writes a
#    2R x R lat-long EXR of sky radiance for given turbidity/elevation).
_PERErr = {
    "Y": ((0.1787, -1.4630), (-0.3554, 0.4275), (-0.0227, 5.3251),
          (0.1206, -2.5771), (-0.0670, 0.3703)),
    "x": ((-0.0193, -0.2592), (-0.0665, 0.0008), (-0.0004, 0.2125),
          (-0.0641, -0.8989), (-0.0033, 0.0452)),
    "y": ((-0.0167, -0.2608), (-0.0950, 0.0092), (-0.0079, 0.2102),
          (-0.0441, -1.6537), (-0.0109, 0.0529)),
}


def _perez(coef, theta, gamma):
    A, B, C, D, E = coef
    return ((1.0 + A * np.exp(B / np.maximum(np.cos(theta), 1e-3)))
            * (1.0 + C * np.exp(D * gamma) + E * np.cos(gamma) ** 2))


def _zenith(T, theta_s):
    chi = (4.0 / 9.0 - T / 120.0) * (np.pi - 2.0 * theta_s)
    Yz = ((4.0453 * T - 4.9710) * np.tan(chi) - 0.2155 * T + 2.4192)
    ts, t2, t3 = theta_s, theta_s ** 2, theta_s ** 3
    Tv = np.array([T * T, T, 1.0])
    xz = Tv @ np.array([[0.00166, -0.00375, 0.00209, 0.0],
                        [-0.02903, 0.06377, -0.03202, 0.00394],
                        [0.11693, -0.21196, 0.06052, 0.25886]]) @ \
        np.array([t3, t2, ts, 1.0])
    yz = Tv @ np.array([[0.00275, -0.00610, 0.00317, 0.0],
                        [-0.04214, 0.08970, -0.04153, 0.00516],
                        [0.15346, -0.26756, 0.06670, 0.26688]]) @ \
        np.array([t3, t2, ts, 1.0])
    return max(Yz, 0.0), xz, yz


def cmd_makesky(argv):
    outfile = _pop_opt(argv, "--outfile", "sky.exr", cast=str)
    albedo = _pop_opt(argv, "--albedo", 0.5)
    turbidity = _pop_opt(argv, "--turbidity", 3.0)
    elevation = _pop_opt(argv, "--elevation", 10.0)
    res = int(_pop_opt(argv, "--resolution", 2048))
    if not (1.7 <= turbidity <= 10.0):
        raise SystemExit("imgtool: --turbidity must be between 1.7 and 10.")
    if not (0.0 <= elevation <= 90.0):
        raise SystemExit("imgtool: --elevation must be between 0. and 90.")
    if not (0.0 <= albedo <= 1.0):
        raise SystemExit("imgtool: --albedo must be between 0 and 1")

    T = turbidity
    theta_s = np.deg2rad(90.0 - elevation)
    sun = np.array([np.sin(theta_s), 0.0, np.cos(theta_s)])  # z = up

    H, W = res, 2 * res
    v = (np.arange(H) + 0.5) / H
    u = (np.arange(W) + 0.5) / W
    theta = np.pi * v[:, None] * np.ones((1, W))         # 0..pi from zenith
    phi = 2.0 * np.pi * u[None, :] * np.ones((H, 1))
    dirs = np.stack([np.sin(theta) * np.cos(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(theta)], axis=-1)
    cos_g = np.clip(dirs @ sun, -1.0, 1.0)
    gamma = np.arccos(cos_g)
    th = np.minimum(theta, np.pi / 2.0 - 1e-3)          # below-horizon clamp

    coefs = {k: tuple(a * T + b for a, b in cs) for k, cs in _PERErr.items()}
    Yz, xz, yz = _zenith(T, theta_s)
    out = {}
    for k, zen in (("Y", Yz), ("x", xz), ("y", yz)):
        c = coefs[k]
        num = _perez(c, th, gamma)
        den = _perez(c, np.zeros(()), theta_s)
        out[k] = zen * num / max(float(den), 1e-9)
    Y, x, y = out["Y"], out["x"], out["y"]
    # ground albedo bounce: below the horizon return albedo * mean sky
    below = theta > np.pi / 2.0
    # xyY -> XYZ -> linear sRGB
    Y_lin = Y / 25.0                                     # kcd/m^2 -> HDR scale
    X = x / np.maximum(y, 1e-6) * Y_lin
    Z = (1.0 - x - y) / np.maximum(y, 1e-6) * Y_lin
    rgb = np.stack([
        3.240479 * X - 1.537150 * Y_lin - 0.498535 * Z,
        -0.969256 * X + 1.875991 * Y_lin + 0.041556 * Z,
        0.055648 * X - 0.204043 * Y_lin + 1.057311 * Z,
    ], axis=-1)
    rgb = np.maximum(rgb, 0.0)
    mean_sky = rgb[~below].mean(axis=0) if (~below).any() else rgb.mean((0, 1))
    rgb[below] = albedo * mean_sky
    # solar disk (~0.545 deg wide, scaled with zenith attenuation)
    disk = gamma < np.deg2rad(0.2725)
    sun_scale = 400.0 * max(np.cos(theta_s), 0.05) * (10.0 / T)
    rgb[disk] = np.maximum(rgb[disk], sun_scale * np.array([1.0, 0.94, 0.88]))
    _save(outfile, rgb.astype(np.float32))
    print(f"wrote {outfile}")
    return 0


COMMANDS = {
    "assemble": cmd_assemble,
    "cat": cmd_cat,
    "convert": cmd_convert,
    "diff": cmd_diff,
    "info": cmd_info,
    "makesky": cmd_makesky,
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in COMMANDS:
        print(__doc__, file=sys.stderr)
        print("commands: " + ", ".join(COMMANDS), file=sys.stderr)
        return 1
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
