"""Render the oracle parity-fixture MATRIX through the reference binary.

Drives /tmp/oracle/pbrt (built by build_oracle.sh) over a matrix of
(scene x integrator x spp), box-downsamples each EXR and commits the
result as tests/golden/<name>.npy for tests/test_oracle_parity.py.
Run AFTER any long ground-truth render finishes (2-core host; renders
are sequential on purpose).

Usage: python scripts/oracle/render_fixtures.py [only-name ...]
"""
import os
import re
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
ORACLE = os.environ.get("ORACLE_BIN", "/tmp/oracle/pbrt")
WORK = os.environ.get("ORACLE_WORK", "/tmp/oracle/fixtures")
GOLDEN = os.path.join(ROOT, "tests", "golden")

# (name, scene, integrator-line, spp, render-res, fixture-res)
MATRIX = [
    ("killeroo_ref_direct64_175",
     "/root/reference/scenes/killeroo-simple.pbrt",
     'Integrator "directlighting" "integer maxdepth" [5]', 64, 700, 175),
    ("killeroo_ref_bdpt32_175",
     "/root/reference/scenes/killeroo-simple.pbrt",
     'Integrator "bdpt" "integer maxdepth" [5]', 32, 700, 175),
    ("atrium_ref_path96_128",
     os.path.join(ROOT, "scenes", "atrium.pbrt"),
     'Integrator "path" "integer maxdepth" [6]', 96, 256, 128),
    ("atrium_ref_direct96_128",
     os.path.join(ROOT, "scenes", "atrium.pbrt"),
     'Integrator "directlighting" "integer maxdepth" [6]', 96, 256, 128),
    ("interior1_ref_path96_128",
     os.path.join(ROOT, "scenes", "interior_v1.pbrt"),
     'Integrator "path" "integer maxdepth" [6]', 96, 256, 128),
]


def render_one(name, scene, integ_line, spp, res, fres):
    os.makedirs(WORK, exist_ok=True)
    s = open(scene).read()
    s = re.sub(r'Integrator\s+"\w+"[^\n]*', integ_line, s, count=1)
    s = re.sub(r'"integer pixelsamples" \[\d+\]',
               f'"integer pixelsamples" [{spp}]', s)
    s = re.sub(r'"integer xresolution" \[\d+\]',
               f'"integer xresolution" [{res}]', s)
    s = re.sub(r'"integer yresolution" \[\d+\]',
               f'"integer yresolution" [{res}]', s)
    out_exr = os.path.join(WORK, name + ".exr")
    spath = os.path.join(WORK, name + ".pbrt")
    with open(spath, "w") as f:
        f.write(s)
    # pbrt resolves Include/ply paths relative to the INPUT file's dir
    # (SetSearchDirectory) — symlink the scene's assets into WORK
    sdir = os.path.dirname(os.path.abspath(scene))
    for entry in os.listdir(sdir):
        if entry.endswith(".ply") or entry == "geometry":
            dst = os.path.join(WORK, entry)
            if not os.path.lexists(dst):
                os.symlink(os.path.join(sdir, entry), dst)
    subprocess.run([ORACLE, "--outfile", out_exr, spath], check=True,
                   cwd=WORK)
    from pbrt_v3_iile_tpu.utils import image as imglib
    img = np.asarray(imglib.read_exr(out_exr), np.float32)[..., :3]
    k = res // fres
    img = img[: fres * k, : fres * k].reshape(
        fres, k, fres, k, 3).mean((1, 3))
    np.save(os.path.join(GOLDEN, name + ".npy"), img.astype(np.float32))
    print(f"{name}: {img.shape} mean {img.mean():.4f} -> committed")


def main():
    only = set(sys.argv[1:])
    for row in MATRIX:
        if only and row[0] not in only:
            continue
        render_one(*row)


if __name__ == "__main__":
    main()
