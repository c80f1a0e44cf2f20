"""Quality-vs-time: IILE vs path on the atrium interior.

The analogue of the reference's headline measurement
(ref: tools/charts_whiteroom.py:7-48, charts_mbed1.py — PSNR/entropy of
IILE at T indirect tasks vs path at N spp against a converged render).
Writes QUALITY_r{round}.json at the repo root and prints a summary.

Run on the chip:  python scripts/bench_quality.py [--res 256]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def psnr(img, ref):
    mse = float(np.mean((img - ref) ** 2))
    if mse <= 0:
        return 99.0
    peak = float(ref.max())
    return 10.0 * np.log10(peak * peak / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--scene", default=os.path.join(ROOT, "scenes",
                                                    "atrium.pbrt"))
    ap.add_argument("--ref-spp", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(ROOT, "QUALITY_r05.json"))
    ap.add_argument("--ref-cache", default="/tmp/atrium_quality_ref.npz")
    ap.add_argument("--oracle-ref", default="/tmp/oracle/atrium_gt.exr",
                    help="EXR rendered by the REFERENCE renderer (oracle "
                         "build) to use as the PSNR ground truth — quality "
                         "is then measured against the reference renderer "
                         "itself, not against our own converged render "
                         "(VERDICT r4 #2).  Falls back to a self-render "
                         "when the file is missing.")
    args = ap.parse_args()

    import jax
    from pbrt_v3_iile_tpu.scene import api as apilib
    from pbrt_v3_iile_tpu.integrators import render as renderlib
    from pbrt_v3_iile_tpu.integrators import iispt as iisptlib
    from pbrt_v3_iile_tpu.utils import metrics as metlib

    def load_sd():
        sd = apilib.load_scene(args.scene)
        sd.film.x_resolution = sd.film.y_resolution = args.res
        return sd

    backend = jax.default_backend()
    print("backend:", backend, flush=True)

    # ---- converged reference ----
    # preferred: the ORACLE's render (the reference C++ renderer itself)
    ref = None
    ref_kind = "self"
    if args.oracle_ref and os.path.exists(args.oracle_ref):
        from pbrt_v3_iile_tpu.utils import image as imglib
        ref = np.asarray(imglib.read_exr(args.oracle_ref),
                         np.float32)[..., :3]
        if ref.shape[0] != args.res:
            k = ref.shape[0] // args.res
            assert k * args.res == ref.shape[0], (ref.shape, args.res)
            ref = ref.reshape(args.res, k, args.res, k, 3).mean((1, 3))
        ref_kind = f"oracle:{os.path.basename(args.oracle_ref)}"
        print(f"reference: {ref_kind} mean={ref.mean():.4f}", flush=True)
    key_cfg = f"{args.scene}:{args.res}:{args.ref_spp}"
    if ref is None and os.path.exists(args.ref_cache):
        z = np.load(args.ref_cache, allow_pickle=True)
        if str(z.get("cfg")) == key_cfg:
            ref = z["img"]
            print("reference: cached", flush=True)
    if ref is None:
        sd = load_sd()
        sd.integrator.kind = "path"
        t0 = time.time()
        ref, _ = renderlib.render(sd, spp=args.ref_spp)
        print(f"reference render: {args.ref_spp} spp in "
              f"{time.time() - t0:.0f}s", flush=True)
        np.savez_compressed(args.ref_cache, img=ref, cfg=key_cfg)

    results = dict(scene=os.path.basename(args.scene), res=args.res,
                   ref_spp=args.ref_spp, backend=backend,
                   ref_kind=ref_kind, path=[], iile=[])

    # ---- path curve: ONE compiled pass fn, cumulative passes (a real
    # progressive render) — rebuilding render() per spp recompiled the
    # whole pipeline every entry (~4 min each at 512^2), polluting the
    # equal-time story
    sd = load_sd()
    sd.integrator.kind = "path"
    scene, cam = renderlib.build(sd)
    pcfg = renderlib.make_integrator_config(sd)
    if pcfg.accel == "clusters" and not pcfg.staged:
        pcfg = pcfg._replace(
            compact_schedule=(1.0, 1.0, 0.5, 0.25, 0.25, 0.125))
    prun = renderlib.render_pass_fn(sd, pcfg)
    if not pcfg.staged:
        prun = jax.jit(prun, static_argnums=(4,))
    pkey = jax.random.PRNGKey(11)
    L0, _, _ = prun(scene, cam, pkey, 0, 0)   # compile + warm
    L0.block_until_ready()
    print("path warmup done", flush=True)
    acc = None
    done_p = 0
    t_accum = 0.0
    for spp in (1, 2, 4, 8, 16, 32, 64):
        t0 = time.time()
        while done_p < spp:
            Lp, _, _ = prun(scene, cam, pkey, done_p + 1, 0)
            acc = Lp if acc is None else acc + Lp
            done_p += 1
        img = np.asarray(acc) / done_p
        t_accum += time.time() - t0
        entry = dict(spp=spp, seconds=round(t_accum, 2),
                     psnr=round(psnr(img, ref), 2),
                     ssim=round(float(metlib.ssim(img, ref)), 4))
        results["path"].append(entry)
        print("path", entry, flush=True)

    # ---- IILE curve ----
    # pre-warm compiles OUTSIDE the timed region (the round-3 sweep's
    # tasks=1 entry recorded 214 s of compile time; VERDICT r3 weak #3)
    # constant direct_samples across the sweep (the reference's chart
    # methodology sweeps TASKS at fixed --iileDirect, and a varying
    # direct count recompiled the direct pass for every entry)
    DIRECT = 4
    sd = load_sd()
    sd.integrator.kind = "iispt"
    iisptlib.render_iile(sd, indirect_tasks=1, direct_samples=DIRECT,
                         radius_start=max(16.0, args.res / 5.0))
    print("iile warmup done", flush=True)
    # warm EVERY task count once before timing: each count introduces
    # fresh tile sizes whose pixel/probe stages compile on first sight
    for tasks in (1, 2, 4, 8, 16, 32, 48):
        sd = load_sd()
        sd.integrator.kind = "iispt"
        iisptlib.render_iile(sd, indirect_tasks=tasks,
                             direct_samples=1,
                             radius_start=max(16.0, args.res / 5.0))
        print(f"warm tasks={tasks} done", flush=True)
    for tasks in (1, 2, 4, 8, 16, 32, 48):
        sd = load_sd()
        sd.integrator.kind = "iispt"
        t0 = time.time()
        comb, direct, indirect, st = iisptlib.render_iile(
            sd, indirect_tasks=tasks, direct_samples=DIRECT,
            radius_start=max(16.0, args.res / 5.0))
        dt = time.time() - t0
        entry = dict(tasks=tasks, direct=DIRECT, seconds=round(dt, 2),
                     psnr=round(psnr(comb, ref), 2),
                     ssim=round(float(metlib.ssim(comb, ref)), 4))
        results["iile"].append(entry)
        print("iile", entry, flush=True)

    # ---- equal-time comparison: best path PSNR at <= t for each IILE t
    summary = []
    for e in results["iile"]:
        t = e["seconds"]
        best_path = max((p for p in results["path"]
                         if p["seconds"] <= t * 1.05),
                        key=lambda p: p["psnr"], default=None)
        # no path point fits the budget -> path produces NOTHING in this
        # time; any finite IILE image wins the equal-time comparison
        wins = (e["psnr"] > best_path["psnr"]) if best_path             else (e["psnr"] > 0)
        summary.append(dict(
            seconds=t, iile_psnr=e["psnr"],
            path_psnr_at_time=(best_path or {}).get("psnr"),
            iile_wins=bool(wins)))
    results["equal_time"] = summary

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out, flush=True)
    for s in summary:
        print(s, flush=True)


if __name__ == "__main__":
    main()
