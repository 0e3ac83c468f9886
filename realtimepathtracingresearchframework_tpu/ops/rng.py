"""RNG pointsets — uniform (LCG) variant.

Matches the reference pointset contract (rendering/defaults.glsl:22-67):
``get_rng(sample_index, shot_offset, pixel, dims)`` seeds a per-path state;
``random_float1/2(state, dim)`` draw dimension-indexed samples; dimensions
follow the path-space map (rendering/pathspace.h). The LCG variant hashes
(shot, pixel-linear, sample) with MurmurHash3 finalization and steps a
32-bit LCG (rendering/pointsets/lcg_rng.glsl:28-39, hashing.glsl:11-39);
the LCG consumes state sequentially, so the `dim` argument is ignored —
exactly like the reference. Sobol/Z-Sobol/blue-noise variants live in
ops/sobol.py and dispatch via the same contract.

All math in uint32; works under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x).astype(_U32)


def murmur_hash3_mix(h, k):
    """(hashing.glsl:11-28)"""
    c1 = _U32(0xCC9E2D51)
    c2 = _U32(0x1B873593)
    h = _u32(h)
    k = _u32(k)
    k = k * c1
    k = (k << _U32(15)) | (k >> _U32(17))
    k = k * c2
    h = h ^ k
    h = ((h << _U32(13)) | (h >> _U32(19))) * _U32(5) + _U32(0xE6546B64)
    return h


def murmur_hash3_finalize(h):
    """(hashing.glsl:30-39)"""
    h = _u32(h)
    h = h ^ (h >> _U32(16))
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> _U32(13))
    h = h * _U32(0xC2B2AE35)
    h = h ^ (h >> _U32(16))
    return h


# LCG constants (lcg_rng.glsl:16-18, from OSPRay)
_LCG_M = _U32(1664525)
_LCG_N = _U32(1013904223)


def lcg_seed(sample_index, shot, pixel_x, pixel_y, width):
    """get_lcg_rng (lcg_rng.glsl:28-39): state for one path."""
    linear = _u32(pixel_x) + _u32(pixel_y) * _u32(width)
    state = murmur_hash3_mix(_u32(shot), linear)
    state = murmur_hash3_mix(state, _u32(sample_index))
    return murmur_hash3_finalize(state)


def lcg_step(state):
    return state * _LCG_M + _LCG_N


def lcg_float(state):
    """Returns (new_state, float in [0,1)) — ldexp(float(u32), -32)."""
    state = lcg_step(state)
    return state, state.astype(jnp.float32) * jnp.float32(2.0**-32)


def lcg_float2(state):
    state, a = lcg_float(state)
    state, b = lcg_float(state)
    return state, jnp.stack([a, b], axis=-1)
