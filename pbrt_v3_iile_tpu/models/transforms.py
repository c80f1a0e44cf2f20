"""Normalization transforms shared by training AND inference.

The reference keeps two hand-synchronized implementations — C++
(iisptrenderrunner.cpp:1041-1136 normalizeMapsDownstream /
transformMapsUpstream, imagefilm.cpp positiveLog*) and Python
(ml/iispt_transforms.py IntensityDownstream{Full,Half}Sequence,
IntensityUpstreamSequence, DistanceDownstreamSequence).  Here there is
exactly ONE implementation (SURVEY §7 hard part 5), used by the probe
pipeline, the trainer, and the dataset generator.
"""

from __future__ import annotations

import jax.numpy as jnp


def positive_log(x):
    """log(clip(x+1, 1, inf)) (ref: imagefilm.cpp positiveLog /
    iispt_transforms.npLog)."""
    return jnp.log(jnp.maximum(x + 1.0, 1.0))


def positive_log_inverse(y):
    """(ref: imagefilm.cpp positiveLogInverse / LogInvTransform)."""
    return jnp.exp(jnp.maximum(y, 0.0)) - 1.0


def _safe_div(x, d):
    return jnp.where(d > 0.0, x / jnp.where(d > 0.0, d, 1.0), x)


def intensity_downstream_half(x, mean):
    """p ground truth / CNN prediction space: divide by 10*mean, log
    (ref: iispt_transforms.py IntensityDownstreamHalfSequence)."""
    return positive_log(_safe_div(x, 10.0 * mean))


def intensity_downstream_full(x, mean):
    """d probe intensity input: ... then subtract 0.1
    (ref: IntensityDownstreamFullSequence; iisptrenderrunner.cpp:1041)."""
    return intensity_downstream_half(x, mean) - 0.1


def intensity_upstream(y, mean):
    """Invert half-sequence (ref: IntensityUpstreamSequence)."""
    return positive_log_inverse(y) * (10.0 * mean)


def distance_downstream(z, mean):
    """z map: +1, /(10*(mean+1)), log, -0.1
    (ref: DistanceDownstreamSequence; iisptrenderrunner.cpp:1080-1094)."""
    d = 10.0 * (mean + 1.0)
    d = jnp.where(d == 0.0, 1.0, d)
    return positive_log((z + 1.0) / d) - 0.1


def normals_downstream(n):
    """Normals into [-1,1] (ref: imagefilm.cpp normalize(-1,1))."""
    return jnp.clip(n, -1.0, 1.0)


def probe_to_network_input(intensity, normals, distance):
    """Full downstream pipeline for a batch of probes.

    intensity (..., H, W, 3) raw radiance; normals (..., H, W, 3)
    camera-space; distance (..., H, W, 1).
    Returns (x (..., H, W, 7), aux) where aux carries the per-probe
    channel means needed by the upstream transform
    (ref: iisptrenderrunner.cpp normalizeMapsDownstream outputs
    rmean/gmean/bmean + overall mean)."""
    red_axes = tuple(range(intensity.ndim - 3, intensity.ndim))
    chan_means = jnp.mean(intensity, axis=red_axes[:-1])       # (..., 3)
    overall = jnp.mean(intensity, axis=red_axes)                # (...,)
    om = overall[..., None, None, None]
    x_int = intensity_downstream_full(intensity, om)
    x_nrm = normals_downstream(normals)
    zmean = jnp.mean(distance, axis=red_axes)[..., None, None, None]
    x_dst = distance_downstream(distance, zmean)
    x = jnp.concatenate([x_int, x_nrm, x_dst], axis=-1)
    return x, dict(chan_means=chan_means, overall_mean=overall)


def network_output_to_radiance(y, aux):
    """Upstream: positiveLogInverse then per-channel mean matching
    (ref: iisptrenderrunner.cpp transformMapsUpstream:1097-1136)."""
    lin = positive_log_inverse(y)                     # (..., H, W, 3)
    red_axes = tuple(range(lin.ndim - 3, lin.ndim - 1))
    actual = jnp.mean(lin, axis=red_axes)             # (..., 3)
    target = aux["chan_means"]
    mul = jnp.where(actual > 1e-10, target / jnp.maximum(actual, 1e-10), 0.0)
    return lin * mul[..., None, None, :]
