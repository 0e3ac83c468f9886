"""Sobol low-discrepancy sequences (host-side matrix generation + device eval).

Capability port of the reference's pointsets (rendering/pointsets/):
- SOBOL: per-pixel scrambled Sobol with per-dimension advance
  (sobol.glsl:81-213),
- Z_SBL: Morton-order pixel/sample interleaving with Owen-style index
  shuffling (sobol.glsl:92-157 + sample_order.glsl),
- BN: screen-space dithered Sobol (bn_rng.glsl:11-74; the reference ships
  Heitz-Belcour 128^2 scrambling/ranking tiles — we dither by a
  void-and-cluster blue-noise mask generated at build time instead).

Instead of shipping the reference's ~35k-line generated tables, direction
matrices are generated at import from primitive polynomials over GF(2)
found programmatically (first dimension = van der Corput), with
deterministic odd initial direction numbers. Output-digit randomization is
Laine-Karras-style hash-based Owen scrambling, so sequence quality rests on
the scramble rather than hand-tuned initial numbers (standard practice).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

SOBOL_BITS = 32
SOBOL_DIMS = 128


# ---------------------------------------------------------------------------
# GF(2) primitive polynomial search (host, cached)
# ---------------------------------------------------------------------------


def _poly_mulmod(a: int, b: int, mod: int, deg: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a >> deg & 1:
            a ^= mod
    return r


def _is_primitive(poly: int, deg: int) -> bool:
    """poly: bitmask including x^deg term. Primitive iff x has order 2^deg-1
    in GF(2)[x]/poly."""
    order = (1 << deg) - 1
    # must be irreducible and x's order == order; check x^order == 1 and
    # x^(order/p) != 1 for prime divisors p
    def powx(e):
        result = 1
        base = 2  # x
        while e:
            if e & 1:
                result = _poly_mulmod(result, base, poly, deg)
            base = _poly_mulmod(base, base, poly, deg)
            e >>= 1
        return result

    if powx(order) != 1:
        return False
    n = order
    ps = []
    d = 2
    while d * d <= n:
        if n % d == 0:
            ps.append(d)
            while n % d == 0:
                n //= d
        d += 1
    if n > 1:
        ps.append(n)
    return all(powx(order // p) != 1 for p in ps)


@functools.lru_cache(maxsize=None)
def _primitive_polys(count: int):
    """First `count` primitive polynomials by degree (excluding x+1 handled
    as dimension 0). Returns list of (degree, a) where `a` packs the interior
    coefficients a_1..a_{s-1} like the Joe-Kuo convention."""
    polys = []
    deg = 1
    while len(polys) < count:
        for interior in range(1 << max(deg - 1, 0)):
            # poly = x^deg + (interior coeffs) + 1
            poly = (1 << deg) | 1
            for i in range(deg - 1):
                if interior >> i & 1:
                    poly |= 1 << (i + 1)
            if _is_primitive(poly, deg):
                polys.append((deg, interior))
                if len(polys) >= count:
                    break
        deg += 1
    return polys


@functools.lru_cache(maxsize=None)
def sobol_matrices(dims: int = SOBOL_DIMS) -> np.ndarray:
    """(dims, 32) uint32 direction vectors v_k (MSB-aligned)."""
    rng = np.random.default_rng(0x50B0)
    mats = np.zeros((dims, SOBOL_BITS), np.uint32)
    # dimension 0: van der Corput
    for k in range(SOBOL_BITS):
        mats[0, k] = 1 << (31 - k)
    polys = _primitive_polys(dims - 1)
    for d in range(1, dims):
        s, interior = polys[d - 1]
        # deterministic odd initial direction numbers m_i < 2^i
        m = np.zeros(SOBOL_BITS, np.uint64)
        for i in range(s):
            m[i] = (rng.integers(0, 1 << i) * 2 + 1) if i > 0 else 1
        for i in range(s, SOBOL_BITS):
            mi = m[i - s] ^ ((1 << s) * m[i - s])
            for k in range(1, s):
                if interior >> (k - 1) & 1:
                    mi ^= (1 << k) * m[i - k]
            m[i] = mi
        for k in range(SOBOL_BITS):
            mats[d, k] = np.uint32(m[k] << np.uint64(31 - k))
    return mats


# ---------------------------------------------------------------------------
# Device evaluation
# ---------------------------------------------------------------------------

_U = jnp.uint32


def _lk_hash(x, seed):
    """Laine-Karras permutation-style hash (reversed-bit Owen scramble)."""
    x = x.astype(_U)
    seed = seed.astype(_U) if hasattr(seed, "astype") else _U(seed)
    x = x + seed
    x = x ^ (x * _U(0x6C50B47C))
    x = x ^ (x * _U(0xB82F1E52))
    x = x ^ (x * _U(0xC7AFE638))
    x = x ^ (x * _U(0x8D22F6E6))
    return x


def _reverse_bits(x):
    x = x.astype(_U)
    x = ((x & _U(0x55555555)) << _U(1)) | ((x & _U(0xAAAAAAAA)) >> _U(1))
    x = ((x & _U(0x33333333)) << _U(2)) | ((x & _U(0xCCCCCCCC)) >> _U(2))
    x = ((x & _U(0x0F0F0F0F)) << _U(4)) | ((x & _U(0xF0F0F0F0)) >> _U(4))
    x = ((x & _U(0x00FF00FF)) << _U(8)) | ((x & _U(0xFF00FF00)) >> _U(8))
    x = (x << _U(16)) | (x >> _U(16))
    return x


def owen_scramble(x, seed):
    """Hash-based Owen scrambling of a radical-inverse value (u32)."""
    return _reverse_bits(_lk_hash(_reverse_bits(x), seed))


def morton2d(x, y):
    """Interleave two 16-bit ints -> 32-bit Morton code (u32 arrays)."""

    def expand(v):
        v = v.astype(_U) & _U(0xFFFF)
        v = (v | (v << _U(8))) & _U(0x00FF00FF)
        v = (v | (v << _U(4))) & _U(0x0F0F0F0F)
        v = (v | (v << _U(2))) & _U(0x33333333)
        v = (v | (v << _U(1))) & _U(0x55555555)
        return v

    return expand(x) | (expand(y) << _U(1))


import jax  # noqa: E402


def sobol_value(matrices: jnp.ndarray, index, dim):
    """u32 Sobol sample: XOR of matrix columns selected by index bits.

    matrices: (D, 32) u32 device array; index (N,) u32; dim () i32 scalar.
    """
    col = jax.lax.dynamic_slice(matrices, (dim.astype(jnp.int32), 0), (1, SOBOL_BITS))[0]
    val = jnp.zeros_like(index, dtype=_U)
    for k in range(SOBOL_BITS):
        bit = (index >> _U(k)) & _U(1)
        val = val ^ (col[k] * bit)
    return val


def u32_to_float(x):
    return x.astype(jnp.float32) * jnp.float32(2.0**-32)
