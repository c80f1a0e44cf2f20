"""Offline tool CLIs: metrics, tonemap, benchmark driver.

Replaces the reference's tool scripts:
- `metrics`   = tools/ssim_cmd.py + pfm.py metrics (SSIM/PSNR/L1/entropy)
- `tonemap`   = tools/cpfm (PFM->LDR with auto/manual exposure) +
                tools/pfm_to_png.py
- `benchmark` = tools/progressive_iile_render.py /
                progressive_path_render.py (render a scene at increasing
                task counts / spp, record wall time + quality)

Usage: python -m pbrt_v3_iile_tpu.cli.tools <metrics|tonemap|benchmark> ...
"""

from __future__ import annotations

import argparse
import json
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
    if ext == "npy":
        return np.load(path)
    raise ValueError(f"unknown image format {path}")


def cmd_metrics(argv):
    from ..utils import metrics as m

    ap = argparse.ArgumentParser(prog="tools metrics")
    ap.add_argument("image")
    ap.add_argument("reference")
    args = ap.parse_args(argv)
    a = _load(args.image)
    b = _load(args.reference)
    print(json.dumps({
        "l1": m.l1(a, b),
        "mse": m.mse(a, b),
        "psnr_db": m.psnr(a, b),
        "ssim": m.ssim(a, b),
        "entropy_kb": m.compressed_entropy_kb(a),
    }))


def cmd_tonemap(argv):
    from ..utils import image as imglib

    ap = argparse.ArgumentParser(prog="tools tonemap")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--exposure", type=float, default=None,
                    help="stops; default auto (ref: tools/cpfm autoexposure)")
    ap.add_argument("--gamma", type=float, default=2.2)
    args = ap.parse_args(argv)
    img = _load(args.input)
    if args.exposure is None:
        # auto exposure: map the 90th percentile to 0.8 (cpfm-style)
        p90 = float(np.percentile(img, 90))
        scale = 0.8 / max(p90, 1e-9)
    else:
        scale = 2.0 ** args.exposure
    ldr = np.clip(img * scale, 0.0, 1.0) ** (1.0 / args.gamma)
    imglib.write_png(args.output, ldr)
    print(f"wrote {args.output}")


def cmd_convert(argv):
    """Image format conversion (imgtool-convert equivalent,
    ref: src/tools/imgtool.cpp convert)."""
    from ..utils import image as imglib

    ap = argparse.ArgumentParser(prog="tools convert")
    ap.add_argument("input")
    ap.add_argument("output")
    args = ap.parse_args(argv)
    img = _load(args.input)
    ext = args.output.rsplit(".", 1)[-1].lower()
    if ext == "pfm":
        imglib.write_pfm(args.output, img)
    elif ext == "exr":
        imglib.write_exr(args.output, img)
    elif ext == "png":
        imglib.write_png_tonemapped(args.output, img)
    elif ext == "npy":
        np.save(args.output, img)
    else:
        raise SystemExit(f"unknown output format {ext}")
    print(f"wrote {args.output}")


def cmd_benchmark(argv):
    import time

    from ..scene import api as apilib
    from ..integrators import render as renderlib
    from ..utils import metrics as m

    ap = argparse.ArgumentParser(prog="tools benchmark")
    ap.add_argument("scene")
    ap.add_argument("--mode", choices=["path", "iile"], default="path")
    ap.add_argument("--spp-list", default="1,4,16,64")
    ap.add_argument("--tasks-list", default="0,1,8,16,64")
    ap.add_argument("--ref-spp", type=int, default=256)
    ap.add_argument("--out", default="bench_results.json")
    args = ap.parse_args(argv)

    sd = apilib.load_scene(args.scene)
    results = []
    if args.mode == "path":
        ref_img, _ = renderlib.render(sd, spp=args.ref_spp)
        for spp in [int(x) for x in args.spp_list.split(",")]:
            t0 = time.time()
            img, stats = renderlib.render(sd, spp=spp)
            results.append(dict(spp=spp, seconds=time.time() - t0,
                                psnr_db=m.psnr(img, ref_img),
                                entropy_kb=m.compressed_entropy_kb(img),
                                mrays_per_s=stats["mrays_per_s"]))
            print(json.dumps(results[-1]), flush=True)
    else:
        from ..integrators import iispt as iisptlib
        for tasks in [int(x) for x in args.tasks_list.split(",")]:
            t0 = time.time()
            combined, _, _, stats = iisptlib.render_iile(
                sd, indirect_tasks=tasks, direct_samples=16)
            results.append(dict(tasks=tasks, seconds=time.time() - t0,
                                entropy_kb=m.compressed_entropy_kb(combined)))
            print(json.dumps(results[-1]), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    cmd, rest = argv[0], argv[1:]
    if cmd == "metrics":
        return cmd_metrics(rest)
    if cmd == "tonemap":
        return cmd_tonemap(rest)
    if cmd == "convert":
        return cmd_convert(rest)
    if cmd == "benchmark":
        return cmd_benchmark(rest)
    print(f"unknown tool {cmd}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
