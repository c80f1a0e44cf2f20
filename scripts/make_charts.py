"""Render the quality-vs-time chart from QUALITY_r*.json.

The analogue of the reference's chart generators
(ref: tools/charts_whiteroom.py / charts_mbed1.py — PSNR-vs-render-time
curves for IILE task counts against path spp counts), except the data
comes from a measured JSON instead of being hard-coded.

Usage: python scripts/make_charts.py [QUALITY_r03.json ...]
Writes docs/quality_<name>.png next to each input.
"""

import json
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def chart(path):
    with open(path) as f:
        data = json.load(f)
    fig, ax = plt.subplots(figsize=(7, 4.5), dpi=130)
    px = [e["seconds"] for e in data["path"]]
    py = [e["psnr"] for e in data["path"]]
    ax.plot(px, py, "o-", color="#355d8a", label="path (1..%d spp)" %
            data["path"][-1]["spp"])
    ix = [e["seconds"] for e in data["iile"]]
    iy = [e["psnr"] for e in data["iile"]]
    ax.plot(ix, iy, "s-", color="#b0562c",
            label="IILE (1..%d indirect tasks)" % data["iile"][-1]["tasks"])
    for e in data["path"]:
        ax.annotate(str(e["spp"]), (e["seconds"], e["psnr"]),
                    textcoords="offset points", xytext=(4, -10),
                    fontsize=7, color="#355d8a")
    for e in data["iile"]:
        ax.annotate(str(e["tasks"]), (e["seconds"], e["psnr"]),
                    textcoords="offset points", xytext=(4, 5),
                    fontsize=7, color="#b0562c")
    ax.set_xscale("log")
    ax.set_xlabel("render time (s, one chip)")
    ax.set_ylabel("PSNR vs %d-spp reference (dB)" % data["ref_spp"])
    ax.set_title("%s @ %dx%d — quality vs time" %
                 (data["scene"], data["res"], data["res"]))
    ax.grid(alpha=0.25)
    ax.legend()
    fig.text(0.99, 0.01,
             "first point of each curve includes jit compilation",
             ha="right", fontsize=6, color="#777777")
    name = os.path.splitext(os.path.basename(path))[0].lower()
    name = name.replace("quality_", "")
    out = os.path.join(ROOT, "docs", f"quality_{name}.png")
    fig.tight_layout()
    fig.savefig(out)
    print("wrote", out)


def main():
    paths = sys.argv[1:] or [os.path.join(ROOT, "QUALITY_r03.json")]
    for p in paths:
        chart(p)


if __name__ == "__main__":
    main()
