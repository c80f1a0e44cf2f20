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
DIM_MEDIUM_TRACK = 9   # grid-media delta tracking steps
DIM_TIME = 10          # camera shutter time (motion blur)
DIM_MEDIUM_TR = 11     # grid-media shadow ratio tracking steps
DIM_SSS_PROBE = 12     # BSSRDF probe: axis/channel/radius/phi
DIM_SSS_EXIT = 13      # BSSRDF exit direction (cosine hemisphere)
DIM_SSS_NEE = 14       # BSSRDF exit-vertex light sample
DIM_COMPACT = 15       # wavefront-compaction russian roulette


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


def pixel_samples(kind: str, key, pixel_idx, pass_idx, spp: int):
    """In-pixel 2D sample for each pixel of a pass, by sampler kind.

    Semantics map of the reference samplers (src/samplers/*):
    - random: iid uniform (random.cpp)
    - stratified: pass-indexed stratum + jitter (stratified.cpp)
    - halton: radical-inverse bases 2/3 of the pass index with
      per-pixel Cranley-Patterson rotation (halton.cpp's per-pixel
      scrambling role)
    - sobol / lowdiscrepancy / 02sequence / maxmindist: (0,2)-sequence
      with per-pixel digit scramble (sobol.cpp, zerotwosequence.cpp)
    pixel_idx: (N,) flat pixel ids; pass_idx: scalar.
    """
    from . import lds

    n = pixel_idx.shape[0]
    if kind == "stratified":
        strata = max(1, int(spp ** 0.5))
        return stratified_pixel_jitter(key, n, pass_idx, strata)
    if kind in ("halton", "halton-global"):
        i = jnp.full((n,), pass_idx, jnp.uint32)
        hx = lds.radical_inverse(2, i)
        hy = lds.radical_inverse(3, i)
        rot = lds.hash_u32(pixel_idx).astype(jnp.float32) / 4294967296.0
        rot2 = lds.hash_u32(pixel_idx ^ jnp.uint32(0x9E3779B9)).astype(
            jnp.float32) / 4294967296.0
        return jnp.stack([jnp.mod(hx + rot, 1.0),
                          jnp.mod(hy + rot2, 1.0)], axis=-1)
    if kind == "maxmindist":
        # searched max-min-distance (0,2) pattern (ref: maxmin.cpp
        # MaxMinDistSampler; matrices computed in ops/lds.py, not
        # copied) — no longer an alias of sobol02
        i = jnp.full((n,), pass_idx, jnp.uint32)
        sx = lds.hash_u32(pixel_idx)
        sy = lds.hash_u32(pixel_idx ^ jnp.uint32(0x85EBCA77))
        x, y = lds.maxmin02(i, max(int(spp), 2), sx, sy)
        return jnp.stack([x, y], axis=-1)
    if kind in ("sobol", "lowdiscrepancy", "02sequence",
                "zerotwosequence"):
        i = jnp.full((n,), pass_idx, jnp.uint32)
        sx = lds.hash_u32(pixel_idx)
        sy = lds.hash_u32(pixel_idx ^ jnp.uint32(0x85EBCA77))
        x, y = lds.sobol02(i, sx, sy)
        return jnp.stack([x, y], axis=-1)
    return uniform(key, (n, 2))


# ---------------------------------------------------------------------------
# GlobalSampler: low-discrepancy samples for EVERY integration dimension
# ---------------------------------------------------------------------------

from typing import NamedTuple


LD_KINDS = ("sobol", "lowdiscrepancy", "02sequence", "zerotwosequence",
            "maxmindist", "halton", "halton-global")


class SampleCtx(NamedTuple):
    """Per-wavefront sampling context for GlobalSampler semantics (ref:
    src/core/sampler.h:106 GlobalSampler + lowdiscrepancy.h:59-229): when
    present, every integration dimension (light select/sample, BSDF lobe/
    direction, RR, medium) is drawn from an Owen-scrambled (0,2)-sequence
    indexed by the pass number, with an independent scramble per
    (pixel, bounce, purpose) — "padded" low-discrepancy sampling.  The
    pad decorrelates dimension pairs while each pair keeps its net
    stratification over passes, which is what drives the variance win.

    pixel: (N,) u32 flat pixel id of each wavefront lane.
    index: scalar u32 sample index (pass number).
    salt:  scalar u32 derived from the render seed.
    """
    pixel: "jnp.ndarray"
    index: "jnp.ndarray"
    salt: "jnp.ndarray"


class HaltonCtx(SampleCtx):
    """SampleCtx whose dimensions come from high-dimension permuted
    radical inverses (ref: lowdiscrepancy.h ComputeRadicalInverse
    Permutations / ScrambledRadicalInverse with 1000 prime bases; here
    lds.N_HALTON_DIMS generated bases) instead of padded sobol02 —
    the halton.cpp GlobalSampler semantics past dim 16.  The subclass
    type lives in the pytree treedef, so jitted consumers can branch on
    isinstance at trace time.

    OPT-IN (kind="halton-global"), not the default for halton scenes:
    one radical-inverse value per pass is shared by every pixel (only
    the Cranley-Patterson rotation differs), so image-mean variance at
    low spp is governed by a single small lattice subset — measured
    5-8% image-mean deviation at 32 spp where the per-pixel
    Owen-scrambled padding sits at ~1% (the reference's halton has the
    same pixel-correlation weakness; pbrt decorrelates with per-pixel
    sequence offsets, a gather-heavy construction that cost 3.5x the
    whole render pass here)."""


def make_sample_ctx(key, pixel_idx, pass_idx,
                    kind: str = "sobol") -> SampleCtx:
    from . import lds

    salt = jax.random.randint(jax.random.fold_in(key, 0x5D5),
                              (), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32).astype(jnp.uint32)
    cls = HaltonCtx if kind == "halton-global" else SampleCtx
    return cls(pixel=pixel_idx.astype(jnp.uint32),
               index=jnp.asarray(pass_idx, jnp.uint32),
               salt=salt)


def _dim_seed(ctx: SampleCtx, bounce, purpose, k):
    from . import lds

    code = (jnp.uint32(bounce) * jnp.uint32(64)
            + jnp.uint32(purpose) * jnp.uint32(4) + jnp.uint32(k))
    return lds.hash_u32(ctx.pixel
                        ^ (code * jnp.uint32(0x9E3779B9))
                        ^ ctx.salt)


def ctx_uniform(ctx, key, bounce, purpose, shape):
    """Uniform samples for one integration decision.

    ctx None -> plain threefry stream (wave_key(key, 0, bounce, purpose)).
    ctx set  -> Owen-scrambled padded Sobol02: dims are drawn in pairs
    from independent scrambles, so any trailing dimensionality works.
    shape: (N,) or (N, k) with k <= 4.
    """
    from . import lds

    if ctx is None:
        return uniform(wave_key(key, 0, bounce, purpose), shape)
    N = shape[0]
    k = 1 if len(shape) == 1 else shape[1]
    i = jnp.broadcast_to(ctx.index, (N,))
    cols = []
    if isinstance(ctx, HaltonCtx):
        # permuted radical inverse at the global dimension index
        # (2 + per-bounce layout), decorrelated per pixel with a
        # Cranley-Patterson rotation (halton.cpp per-pixel role).
        # ctx.index is ONE scalar for the whole wavefront, so the
        # 32-digit inverse runs on a single element and broadcasts —
        # running it lane-wise cost 3.5x the whole render pass.
        for kk in range(k):
            code = (jnp.uint32(bounce) * jnp.uint32(64)
                    + jnp.uint32(purpose) * jnp.uint32(4)
                    + jnp.uint32(kk))
            dim = jnp.uint32(2) + code
            x1 = lds.scrambled_radical_inverse_dyn(
                dim, jnp.reshape(ctx.index, (1,)))[0]
            rot = lds.hash_u32(
                ctx.pixel ^ (code * jnp.uint32(0x9E3779B9)) ^ ctx.salt
            ).astype(jnp.float32) / 4294967296.0
            cols.append(jnp.mod(x1 + rot, 1.0))
    else:
        for pair in range((k + 1) // 2):
            sx = _dim_seed(ctx, bounce, purpose, 2 * pair)
            sy = _dim_seed(ctx, bounce, purpose, 2 * pair + 1)
            x, y = lds.sobol02_owen(i, sx, sy)
            cols.extend([x, y])
    if len(shape) == 1:
        return cols[0]
    return jnp.stack(cols[:k], axis=-1)
