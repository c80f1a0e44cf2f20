"""Render killeroo on the TPU (staged pallas path) and compare against
the CPU XLA-walker render — guards the fast path's numerics on real
hardware (the CI golden tests only exercise the CPU backend)."""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def render_once(platform, out):
    code = f"""
import os, sys, json
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
{'os.environ["JAX_PLATFORMS"] = "cpu"; os.environ.pop("PALLAS_AXON_POOL_IPS", None)' if platform == 'cpu' else ''}
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import numpy as np
from pbrt_v3_iile_tpu.scene import api as apilib
from pbrt_v3_iile_tpu.integrators import render as renderlib
sd = apilib.load_scene("/root/reference/scenes/killeroo-simple.pbrt")
sd.integrator.kind = "path"; sd.integrator.max_depth = 5
sd.film.x_resolution = 200; sd.film.y_resolution = 200
img, st = renderlib.render(sd, spp=4)
np.save({out!r}, img)
print("mean", float(img.mean()), st)
"""
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1200)
    print(f"[{platform}] {time.time()-t0:.0f}s rc={r.returncode}")
    print(r.stdout.strip()[-500:])
    if r.returncode:
        print(r.stderr[-2000:])
        sys.exit(1)


def main():
    render_once("tpu", "/tmp/kill_tpu.npy")
    render_once("cpu", "/tmp/kill_cpu.npy")
    a = np.load("/tmp/kill_tpu.npy")
    b = np.load("/tmp/kill_cpu.npy")
    # same seed stream -> identical sampling decisions; platform math may
    # differ at ULP level so compare statistically
    diff = np.abs(a - b)
    rel = diff.sum() / max(b.sum(), 1e-9)
    mse = float(((a - b) ** 2).mean())
    psnr = 10 * np.log10(max(a.max(), b.max()) ** 2 / max(mse, 1e-20))
    print(f"means: tpu {a.mean():.5f} cpu {b.mean():.5f}; "
          f"relative L1 {rel:.4f}; PSNR {psnr:.1f} dB")
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-9) < 0.02, "mean mismatch"
    assert rel < 0.10, "pixelwise mismatch too large"
    print("OK: TPU fast path matches CPU reference walker")


if __name__ == "__main__":
    main()
