"""Prediction-quality statistics (ref: ml/main_compute_test_statistics.py
+ Doc.md "P values using kruskal"): compare three estimators of the
ground-truth hemisphere — the raw 1spp render, a gaussian-blurred 1spp
render, and the CNN prediction — by per-example L1 and SSIM, and test
the differences for significance with Kruskal-Wallis.
"""

from __future__ import annotations

import numpy as np

from ..utils import metrics as metricslib


def _blur_batch(imgs: np.ndarray) -> np.ndarray:
    """Per-channel separable gaussian blur of (P, H, W, 3) maps (the
    reference compares against a gaussian-filtered 1spp baseline)."""
    r = min(5, imgs.shape[1] // 2 - 1)
    k = metricslib._gaussian_kernel(radius=max(r, 1))
    return np.stack([
        np.stack([metricslib._blur(im[..., c], k)
                  for c in range(im.shape[-1])], axis=-1)
        for im in imgs])


def compare_predictions(raw: dict, net, net_vars) -> dict:
    """raw: dict from ml.dataset.generate_examples (maps p/d/n/z, valid).

    Returns {groups: {low,blur,pred: {l1: [...], ssim: [...]}},
             means, p_values} — p_values mirror the reference's
    low-vs-pred / blur-vs-pred Kruskal comparisons."""
    import jax.numpy as jnp
    from scipy import stats as sstats

    from ..models import transforms as nnx

    valid = np.asarray(raw["valid"])
    gt = np.asarray(raw["p"])[valid]
    low = np.asarray(raw["d"])[valid]
    blur = _blur_batch(low)

    x_in, aux = nnx.probe_to_network_input(
        jnp.asarray(low), jnp.asarray(raw["n"])[valid],
        jnp.asarray(raw["z"])[valid])
    y = net.apply(net_vars, x_in, train=False)
    pred = np.asarray(nnx.network_output_to_radiance(y, aux))

    groups = {}
    for name, est in (("low", low), ("blur", blur), ("pred", pred)):
        groups[name] = dict(
            l1=[metricslib.l1(e, g) for e, g in zip(est, gt)],
            ssim=[metricslib.ssim(e, g) for e, g in zip(est, gt)],
        )

    out = dict(groups=groups, means={}, p_values={})
    for metric in ("l1", "ssim"):
        out["means"][metric] = {k: float(np.mean(v[metric]))
                                for k, v in groups.items()}
        for a, b in (("low", "pred"), ("blur", "pred"), ("low", "blur")):
            xa, xb = groups[a][metric], groups[b][metric]
            if len(xa) >= 2 and (np.ptp(xa) > 0 or np.ptp(xb) > 0):
                h, p = sstats.kruskal(xa, xb)
            else:
                h, p = 0.0, 1.0
            out["p_values"][f"{metric}:{a}_vs_{b}"] = float(p)
    return out


def report(stats: dict) -> str:
    lines = ["Prediction quality statistics (Kruskal-Wallis):"]
    for metric, means in stats["means"].items():
        row = "  ".join(f"{k}={v:.4f}" for k, v in means.items())
        lines.append(f"  {metric:5s} means: {row}")
    for k, p in stats["p_values"].items():
        lines.append(f"  p[{k}] = {p:.3e}")
    return "\n".join(lines)
