"""IILE pipeline wall-time benchmark (the flagship mode).

Reference anchor (BASELINE.md): whiteroom-daytime full IILE render at
{0,1,8,16,64,512} indirect tasks took {35,45,56,75,202,1578} s on an
i7-4770; killeroo-simple is the only redistributable scene, so this
measures killeroo at a comparable setting and reports seconds +
probes/s.  Run on the TPU chip: python scripts/bench_iile.py
[--tasks N] [--direct N] [--res R]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", type=int, default=16)
    ap.add_argument("--direct", type=int, default=16)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--hemi", type=int, default=32)
    ap.add_argument("--scene", default="/root/reference/scenes/"
                                       "killeroo-simple.pbrt")
    args = ap.parse_args()

    import jax
    import numpy as np

    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import iispt as iisptlib

    print(f"[{time.strftime('%H:%M:%S')}] devices: {jax.devices()}",
          flush=True)
    sd = apilib.load_scene(args.scene)
    sd.film.x_resolution = args.res
    sd.film.y_resolution = args.res
    sd.integrator.kind = "iispt"

    t0 = time.time()
    combined, direct, indirect, stats = iisptlib.render_iile(
        sd, seed=0, indirect_tasks=args.tasks,
        direct_samples=args.direct, hemi_size=args.hemi)
    dt = time.time() - t0
    combined = np.asarray(combined)
    tasks_done = int(stats.get("tasks", 0)) if isinstance(stats, dict) else 0
    print(f"[{time.strftime('%H:%M:%S')}] IILE {args.res}x{args.res} "
          f"tasks={args.tasks} direct={args.direct} hemi={args.hemi}: "
          f"{dt:.1f} s total (incl. compile), mean {combined.mean():.4f}, "
          f"schedule tasks={tasks_done}", flush=True)
    # reference anchor: whiteroom @16 tasks = 75 s on a 2013 4-core CPU
    print(f"vs reference whiteroom@16tasks=75s (different scene, "
          f"indicative only): {75.0 / dt:.1f}x", flush=True)


if __name__ == "__main__":
    main()
