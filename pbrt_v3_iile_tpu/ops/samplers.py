"""Counter-based sample generation for wavefronts.

Replaces the reference's stateful per-thread Sampler clones (ref:
src/core/sampler.h:50, samplers/random.cpp, stratified.cpp) with
jax.random threefry keys folded by (pass, bounce, purpose): deterministic
and reproducible under any sharding (SURVEY P6 mapping).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# purpose tags so independent decisions never share a stream
DIM_PIXEL_JITTER = 0
DIM_LENS = 1
DIM_LIGHT_SELECT = 2
DIM_LIGHT_SAMPLE = 3
DIM_BSDF_LOBE = 4
DIM_BSDF_DIR = 5
DIM_RR = 6
DIM_HEMI = 7
DIM_PROBE = 8


def wave_key(base_key, pass_idx, bounce, purpose):
    k = jax.random.fold_in(base_key, pass_idx)
    k = jax.random.fold_in(k, bounce)
    return jax.random.fold_in(k, purpose)


def uniform(key, shape):
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def stratified_pixel_jitter(key, n, spp_index=0, strata=1):
    """Jitter within the pixel; with strata>1, stratify over passes."""
    u = uniform(key, (n, 2))
    if strata > 1:
        sx = spp_index % strata
        sy = (spp_index // strata) % strata
        u = (u + jnp.array([sx, sy], dtype=u.dtype)) / strata
    return u
