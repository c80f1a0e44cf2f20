"""Feature gallery: renders a set of small scenes exercising materials,
textures, lights, media and integrators end-to-end; writes PNGs + a
JSON summary.  A smoke harness for feature combinations (no reference
analogue — their coverage was manual).

Usage: python scripts/gallery.py [outdir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENES = {
    "materials": """
LookAt 0 3 -9  0 1 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [96] "integer yresolution" [64]
Sampler "sobol" "integer pixelsamples" [8]
Integrator "path" "integer maxdepth" [5]
WorldBegin
LightSource "point" "color I" [60 60 60] "point from" [0 6 -4]
LightSource "infinite" "color L" [0.2 0.25 0.3]
Material "matte" "color Kd" [0.6 0.6 0.6]
Shape "trianglemesh" "point P" [-12 0 -12 12 0 -12 12 0 12 -12 0 12]
  "integer indices" [0 1 2 2 3 0]
Material "matte" "color Kd" [0.7 0.2 0.2]
AttributeBegin
Translate -4 1 0
Shape "sphere" "float radius" [1]
AttributeEnd
Material "plastic" "color Kd" [0.2 0.3 0.6] "color Ks" [0.5 0.5 0.5] "float roughness" [0.02]
AttributeBegin
Translate -1.3 1 0
Shape "sphere" "float radius" [1]
AttributeEnd
Material "mirror"
AttributeBegin
Translate 1.3 1 0
Shape "sphere" "float radius" [1]
AttributeEnd
Material "metal" "float roughness" [0.05]
AttributeBegin
Translate 4 1 0
Shape "sphere" "float radius" [1]
AttributeEnd
WorldEnd
""",
    "textures": """
LookAt 0 4 -8  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [96] "integer yresolution" [64]
Integrator "path" "integer maxdepth" [3]
WorldBegin
LightSource "distant" "color L" [2.5 2.5 2.5] "point from" [3 8 -4] "point to" [0 0 0]
Texture "checks" "color" "checkerboard" "color tex1" [0.9 0.9 0.9]
  "color tex2" [0.15 0.15 0.2] "float uscale" [8] "float vscale" [8]
Material "matte" "texture Kd" "checks"
Shape "trianglemesh" "point P" [-6 0 -6 6 0 -6 6 0 6 -6 0 6]
  "integer indices" [0 1 2 2 3 0] "float uv" [0 0 1 0 1 1 0 1]
Texture "noise" "color" "fbm" "integer octaves" [4]
Material "matte" "texture Kd" "noise"
AttributeBegin
Translate 0 1.2 0
Shape "sphere" "float radius" [1.2]
AttributeEnd
WorldEnd
""",
    "glass_caustic": """
LookAt 0 2 -6  0 0.8 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [96] "integer yresolution" [64]
Integrator "path" "integer maxdepth" [8]
WorldBegin
AttributeBegin
  Material "matte" "color Kd" [0 0 0]
  AreaLightSource "area" "color L" [120 120 120]
  Translate 0 6 -2
  Shape "sphere" "float radius" [0.3]
AttributeEnd
Material "matte" "color Kd" [0.65 0.6 0.55]
Shape "trianglemesh" "point P" [-8 0 -8 8 0 -8 8 0 8 -8 0 8]
  "integer indices" [0 1 2 2 3 0]
Material "glass" "float eta" [1.5]
AttributeBegin
Translate 0 1 0
Shape "sphere" "float radius" [0.9]
AttributeEnd
WorldEnd
""",
    "fog": """
LookAt 0 1.6 -7  0 1 2  0 1 0
Camera "perspective" "float fov" [50]
Film "image" "integer xresolution" [96] "integer yresolution" [64]
Integrator "volpath" "integer maxdepth" [6]
MakeNamedMedium "fog" "string type" "homogeneous"
  "color sigma_a" [0.02 0.02 0.02] "color sigma_s" [0.08 0.09 0.1] "float g" [0.3]
MediumInterface "" "fog"
WorldBegin
LightSource "spot" "color I" [220 210 190] "point from" [2 5 1]
  "point to" [0 0 1] "float coneangle" [22]
Material "matte" "color Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "point P" [-8 0 -8 8 0 -8 8 0 10 -8 0 10]
  "integer indices" [0 1 2 2 3 0]
Material "matte" "color Kd" [0.7 0.3 0.2]
AttributeBegin
Translate 0 1 2
Shape "sphere" "float radius" [1]
AttributeEnd
WorldEnd
""",
    "ao": """
LookAt 0 3 -6  0 0.8 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [96] "integer yresolution" [64]
Integrator "ambientocclusion"
WorldBegin
Material "matte" "color Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "point P" [-8 0 -8 8 0 -8 8 0 8 -8 0 8]
  "integer indices" [0 1 2 2 3 0]
AttributeBegin
Translate 0 1 0
Shape "sphere" "float radius" [1]
AttributeEnd
AttributeBegin
Translate 2.2 0.6 -0.8
Shape "sphere" "float radius" [0.6]
AttributeEnd
WorldEnd
""",
}


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "gallery_out"
    os.makedirs(outdir, exist_ok=True)
    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib
    from pbrt_v3_iile_tpu.utils import image as imglib
    import numpy as np

    summary = {}
    for name, text in SCENES.items():
        t0 = time.time()
        sd = apilib.load_scene_string(text)
        img, stats = renderlib.render(sd, use_native_bvh=True)
        p90 = float(np.percentile(img, 90))
        imglib.write_png_tonemapped(
            os.path.join(outdir, f"{name}.png"), img / max(p90, 1e-6) * 0.8)
        summary[name] = dict(
            seconds=round(time.time() - t0, 2),
            mean=float(img.mean()), finite=bool(np.isfinite(img).all()),
            nonzero=bool((img > 0).any()))
        print(name, summary[name], flush=True)
    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
