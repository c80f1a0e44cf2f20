"""cyhair2pbrt — CyHair (.hair) to .pbrt curve converter.

Parity target: src/tools/cyhair2pbrt.cpp (HAIR binary layout read at
cyhair2pbrt.cpp:211-296; Catmull-Rom -> cubic Bezier conversion and
"curve" shape emission in its main()).  The binary format:

  128-byte header: magic "HAIR", u32 num_strands, u32 total_points,
  u32 flags (bit0 segments array, bit1 points, bit2 thickness,
  bit3 transparency, bit4 color), u32 default_segments,
  f32 default_thickness, f32 default_transparency,
  3x f32 default_color, 88-byte info string.
  Then optional arrays: u16 segments[num_strands], f32 points[3N],
  f32 thickness[N], f32 transparency[N], f32 color[3N].

Each strand's polyline is converted to chained cubic Bezier segments
via the standard Catmull-Rom to Bezier control-point construction and
emitted as ``Shape "curve" "string type" "cylinder"`` statements with
per-curve width0/width1 taken from the thickness array.

Usage: python -m pbrt_v3_iile_tpu.cli.cyhair2pbrt in.hair out.pbrt \
           [max_strands] [thickness_scale]
"""

from __future__ import annotations

import struct
import sys

import numpy as np

HAS_SEGMENTS = 1 << 0
HAS_POINTS = 1 << 1
HAS_THICKNESS = 1 << 2
HAS_TRANSPARENCY = 1 << 3
HAS_COLOR = 1 << 4


def load_cyhair(path):
    with open(path, "rb") as f:
        header = f.read(128)
        if len(header) != 128 or header[:4] != b"HAIR":
            raise SystemExit(f"cyhair2pbrt: {path} is not a CyHair file")
        (num_strands, total_points, flags, default_segments,
         default_thickness, default_transparency,
         dc_r, dc_g, dc_b) = struct.unpack_from("<IIIIfffff", header, 4)
        if flags & HAS_SEGMENTS:
            segments = np.frombuffer(f.read(2 * num_strands), "<u2")
        else:
            segments = np.full(num_strands, default_segments, np.uint32)
        if not flags & HAS_POINTS:
            raise SystemExit("cyhair2pbrt: file has no points array")
        pts = np.frombuffer(f.read(12 * total_points),
                            "<f4").reshape(-1, 3)
        if flags & HAS_THICKNESS:
            thick = np.frombuffer(f.read(4 * total_points), "<f4")
        else:
            thick = np.full(total_points, default_thickness, np.float32)
        if flags & HAS_TRANSPARENCY:
            f.read(4 * total_points)
        if flags & HAS_COLOR:
            colors = np.frombuffer(f.read(12 * total_points),
                                   "<f4").reshape(-1, 3)
        else:
            colors = None
    return segments.astype(np.int64), pts, thick, colors, \
        np.array([dc_r, dc_g, dc_b])


def catmull_rom_to_bezier(p):
    """Polyline (K,3) -> list of cubic Bezier control quads, matching the
    reference's per-segment tangent construction (cyhair2pbrt.cpp main):
    tangents from neighboring points, endpoints clamped."""
    k = p.shape[0]
    if k == 2:
        return [np.stack([p[0], (2 * p[0] + p[1]) / 3.0,
                          (p[0] + 2 * p[1]) / 3.0, p[1]])]
    prev = np.concatenate([p[:1], p[:-1]], axis=0)
    nxt = np.concatenate([p[1:], p[-1:]], axis=0)
    tan = 0.5 * (nxt - prev)
    segs = []
    for i in range(k - 1):
        segs.append(np.stack([
            p[i], p[i] + tan[i] / 3.0, p[i + 1] - tan[i + 1] / 3.0, p[i + 1]
        ]))
    return segs


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    in_path, out_path = argv[0], argv[1]
    max_strands = int(argv[2]) if len(argv) > 2 else -1
    tscale = float(argv[3]) if len(argv) > 3 else 1.0

    segments, pts, thick, colors, default_color = load_cyhair(in_path)
    n = len(segments) if max_strands < 0 else min(max_strands, len(segments))

    with open(out_path, "w") as out:
        out.write(f'# converted from "{in_path}" by cyhair2pbrt\n')
        if colors is None:
            r, g, b = (float(x) for x in default_color)
            out.write(f'Material "hair" "color color" [{r:.6g} {g:.6g} '
                      f'{b:.6g}]\n')
        off = 0
        n_curves = 0
        for s in range(len(segments)):
            k = int(segments[s]) + 1  # points in this strand
            if s >= n:
                off += k
                continue
            strand = pts[off:off + k]
            tw = thick[off:off + k] * tscale
            if colors is not None:
                c = colors[off:off + k].mean(axis=0)
                out.write(f'Material "hair" "color color" '
                          f'[{c[0]:.6g} {c[1]:.6g} {c[2]:.6g}]\n')
            beziers = catmull_rom_to_bezier(strand)
            for i, cp in enumerate(beziers):
                w0 = float(tw[min(i, k - 1)])
                w1 = float(tw[min(i + 1, k - 1)])
                p_str = " ".join(f"{v:.6g}" for v in cp.ravel())
                out.write(
                    f'Shape "curve" "string type" "cylinder" '
                    f'"point P" [{p_str}] "integer splitdepth" [1] '
                    f'"float width0" [{w0:.6g}] "float width1" [{w1:.6g}]\n')
                n_curves += 1
            off += k
        print(f"converted {n} strands ({n_curves} curve segments) "
              f"-> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
