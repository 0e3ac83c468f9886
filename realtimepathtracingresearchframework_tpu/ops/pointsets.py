"""RNG pointset contract + variant dispatch.

The uniform pointset interface of the reference (rendering/defaults.glsl:
22-67): a per-path RANDOM_STATE seeded from (sample index, shot offset,
pixel, dims), drawn from with explicit path-space dimensions
(rendering/pathspace.h). Variants (render_params.glsl.h:34-43):

- UNIFORM: murmur-seeded LCG (ops/rng.py; bit-exact with the reference),
- SOBOL: Owen-scrambled Sobol, per-pixel decorrelation via hashed digit
  scrambling (the reference LCG-scrambles digits, sobol.glsl:81-213),
- Z_SBL: one global Sobol stream indexed in Morton pixel order with
  Owen-shuffled indices (sample_order.glsl semantics),
- BN: Sobol dithered by a generated void-and-cluster blue-noise mask
  (standing in for the reference's shipped Heitz-Belcour tiles,
  bn_rng.glsl:11-74).

State is a pair of u32 arrays; dimension indices follow pathspace.h:
camera = dims 0-1 (simplified camera), bounce b uses
2 + 8b + {sel:0, pos:2, dir:4, lobe:6, rr:7}.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from realtimepathtracingresearchframework_tpu.backend.params import (
    RNG_VARIANT_BN,
    RNG_VARIANT_SOBOL,
    RNG_VARIANT_UNIFORM,
    RNG_VARIANT_Z_SBL,
)
from realtimepathtracingresearchframework_tpu.ops import rng as lcg
from realtimepathtracingresearchframework_tpu.ops import sobol as sobol_mod

_U = jnp.uint32


class RngBuffers(NamedTuple):
    """Constant tables needed by the active pointset (pytree member of
    DeviceScene-adjacent state; dummy-sized for the LCG variant).

    When the REFERENCE tables are loaded (tools/convert_pointset_tables),
    ``sobol_invert`` is (256, 256) and the Sobol/Z-Sobol/BN variants
    switch to the reference's exact table-driven sampling
    (ops/pointsets_tables.py) — image parity with the reference GPU
    sequences. With dummy tables the self-generated variants apply."""

    matrices: jnp.ndarray  # (D, 32) u32 sobol direction vectors
    bn_mask: jnp.ndarray  # (64, 64, 8) f32 blue-noise dither offsets
    sobol_invert: jnp.ndarray = jnp.zeros((1, 1), jnp.uint32)  # (256,256)
    bn_sobol: jnp.ndarray = jnp.zeros((1, 1), jnp.uint32)  # (256,256)
    bn_scrambling: jnp.ndarray = jnp.zeros((1,), jnp.uint32)  # (128*128*8,)

    @property
    def reference_tables(self) -> bool:
        return self.sobol_invert.shape[0] == 256


class RngState(NamedTuple):
    s0: jnp.ndarray  # u32: LCG state / sobol index
    s1: jnp.ndarray  # u32: pixel scramble key


@functools.lru_cache(maxsize=1)
def _blue_noise_mask_np(size: int = 64, channels: int = 8) -> np.ndarray:
    """Void-and-cluster blue-noise ranks in [0,1), toroidal. Generated once
    (deterministic); independent channels via toroidal shifts of one mask."""
    rng = np.random.default_rng(0xB10E)
    n = size * size

    yy, xx = np.mgrid[0:size, 0:size]

    def energy_kernel():
        d2 = np.minimum(xx, size - xx) ** 2 + np.minimum(yy, size - yy) ** 2
        return np.exp(-d2 / (2.0 * 1.9**2))

    kern = energy_kernel()
    kern_f = np.fft.rfft2(kern)

    def filt(binary):
        return np.fft.irfft2(np.fft.rfft2(binary) * kern_f, s=(size, size))

    # initial pattern: 10% random, spread via void-and-cluster swaps
    count = n // 10
    binary = np.zeros((size, size), bool)
    idx = rng.choice(n, count, replace=False)
    binary.reshape(-1)[idx] = True
    for _ in range(2000):
        e = filt(binary.astype(np.float64))
        cluster = np.unravel_index(np.where(binary, e, -np.inf).argmax(), e.shape)
        binary[cluster] = False
        e = filt(binary.astype(np.float64))
        void = np.unravel_index(np.where(binary, np.inf, e).argmin(), e.shape)
        if void == cluster:
            binary[cluster] = True
            break
        binary[void] = True

    rank = np.zeros((size, size), np.int64)
    work = binary.copy()
    # ranks below count: remove tightest cluster repeatedly
    for r in range(count - 1, -1, -1):
        e = filt(work.astype(np.float64))
        c = np.unravel_index(np.where(work, e, -np.inf).argmax(), e.shape)
        work[c] = False
        rank[c] = r
    # ranks above: fill largest void repeatedly
    work = binary.copy()
    for r in range(count, n):
        e = filt(work.astype(np.float64))
        v = np.unravel_index(np.where(work, np.inf, e).argmin(), e.shape)
        work[v] = True
        rank[v] = r

    base = (rank.astype(np.float64) + 0.5) / n
    chans = []
    for c in range(channels):
        sx, sy = rng.integers(0, size, 2)
        chans.append(np.roll(np.roll(base, sx, 0), sy, 1))
    return np.stack(chans, axis=-1).astype(np.float32)


def build_rng_buffers(variant: int, tables: str = "auto") -> RngBuffers:
    """``tables``: "auto" uses the reference pointset tables when the
    data file exists (parity default), "never" forces the self-generated
    variants, "always" errors if the tables are missing."""
    from realtimepathtracingresearchframework_tpu.ops import (
        pointsets_tables as ptab,
    )

    if variant == RNG_VARIANT_UNIFORM:
        return RngBuffers(
            matrices=jnp.zeros((1, 32), jnp.uint32),
            bn_mask=jnp.zeros((1, 1, 1), jnp.float32),
        )
    use_ref = tables == "always" or (
        tables == "auto" and ptab.tables_available()
    )
    if use_ref:
        t = ptab._tables_np()
        if variant == RNG_VARIANT_BN:
            return RngBuffers(
                matrices=jnp.zeros((1, 32), jnp.uint32),
                bn_mask=jnp.zeros((1, 1, 1), jnp.float32),
                sobol_invert=jnp.asarray(t["sobol_invert"]),
                bn_sobol=jnp.asarray(t["bn_sobol"]),
                bn_scrambling=jnp.asarray(t["bn_scrambling_1spp"]),
            )
        return RngBuffers(
            matrices=jnp.asarray(t["sobol_matrix"]),
            bn_mask=jnp.zeros((1, 1, 1), jnp.float32),
            sobol_invert=jnp.asarray(t["sobol_invert"]),
        )
    mats = sobol_mod.sobol_matrices()
    mask = (
        _blue_noise_mask_np()
        if variant == RNG_VARIANT_BN
        else np.zeros((1, 1, 1), np.float32)
    )
    return RngBuffers(matrices=jnp.asarray(mats), bn_mask=jnp.asarray(mask))


def make_state(variant: int, sample_index, shot, px, py, width,
               bufs: "RngBuffers" = None) -> RngState:
    """GET_RNG analogue (defaults.glsl:34-40). Pass ``bufs`` to enable the
    reference table-driven state derivation (no-op for LCG/generated)."""
    px = px.astype(_U)
    py = py.astype(_U)
    if variant == RNG_VARIANT_UNIFORM:
        return RngState(
            s0=lcg.lcg_seed(sample_index, shot, px, py, width),
            s1=jnp.zeros_like(px),
        )
    if bufs is not None and bufs.reference_tables:
        return _make_state_ref(variant, sample_index, shot, px, py, width, bufs)
    pixel_linear = px + py * _U(width)
    if variant == RNG_VARIANT_Z_SBL:
        # global Morton stream: Owen-shuffled (pixel, sample) index
        log_spp = _U(12)
        base = (sobol_mod.morton2d(px, py) << log_spp) | (
            jnp.asarray(sample_index).astype(_U) & ((_U(1) << log_spp) - _U(1))
        )
        idx = sobol_mod._reverse_bits(
            sobol_mod._lk_hash(sobol_mod._reverse_bits(base), _U(0x55) ^ shot)
        )
        return RngState(s0=idx, s1=jnp.broadcast_to(shot, px.shape).astype(_U))
    # SOBOL / BN: per-pixel stream
    key = lcg.murmur_hash3_finalize(
        lcg.murmur_hash3_mix(jnp.asarray(shot).astype(_U), pixel_linear)
    )
    return RngState(
        s0=jnp.broadcast_to(jnp.asarray(sample_index).astype(_U), px.shape),
        s1=key,
    )


def _make_state_ref(variant, sample_index, shot, px, py, width, bufs):
    """Reference table-driven GET_RNG (sobol.glsl:160-186, bn_rng.glsl:
    84-95). State stays 2 x u32, the reference's own PACK_RNG layout."""
    from realtimepathtracingresearchframework_tpu.ops import (
        pointsets_tables as ptab,
    )

    shot_u = jnp.asarray(shot).astype(_U)
    sample_u = jnp.asarray(sample_index).astype(_U)
    if variant == RNG_VARIANT_BN:
        # get_bnd_rng: pixelID in a 128^2 tile, sampleID = index + frame*13
        i = px & _U(ptab.BN_TILE - 1)
        j = py & _U(ptab.BN_TILE - 1)
        pixel_id = i + j * _U(ptab.BN_TILE)
        sample_id = (sample_u + shot_u * _U(13)) & _U(0xFFFF)
        return RngState(
            s0=sample_id | (pixel_id << _U(16)), s1=jnp.zeros_like(px)
        )
    if variant == RNG_VARIANT_Z_SBL:
        # Z_ORDER_SHUFFLING (sobol.glsl:169-178): shuffled tile-local
        # sample index + per-tile scrambling stream
        index = ptab.sobol_sample_id_z(
            bufs.matrices, bufs.sobol_invert, sample_index, px, py
        )
        tile_x = px >> _U(ptab.SOBOL_TILE_BITS)
        tile_y = py >> _U(ptab.SOBOL_TILE_BITS)
        tile_w = _U(width) >> _U(ptab.SOBOL_TILE_BITS)
        linear = tile_x + tile_y * tile_w
    else:  # RNG_VARIANT_SOBOL: per-pixel scrambling stream
        index = jnp.broadcast_to(sample_u, px.shape)
        linear = px + py * _U(width)
    # scramble = get_lcg_rng(frame_id, 0, linear) (sobol.glsl:166,183)
    scr = lcg.murmur_hash3_mix(_U(0), linear)
    scr = lcg.murmur_hash3_mix(scr, jnp.broadcast_to(shot_u, px.shape))
    scr = lcg.murmur_hash3_finalize(scr)
    return RngState(s0=index, s1=scr)


def _sobol_dim(bufs, variant, state: RngState, dim, px_key_extra):
    val = sobol_mod.sobol_value(bufs.matrices, state.s0, dim)
    if variant == RNG_VARIANT_Z_SBL:
        seed = sobol_mod._lk_hash(dim.astype(_U), _U(0x9E3779B9))
    else:
        seed = sobol_mod._lk_hash(
            state.s1 ^ dim.astype(_U) * _U(0x9E3779B9), _U(0xA511E9B3)
        )
    return sobol_mod.owen_scramble(val, seed)


def draw1(variant: int, bufs: RngBuffers, state: RngState, dim):
    """One float; dim is a traced scalar (ignored by the LCG)."""
    if variant == RNG_VARIANT_UNIFORM:
        s0, x = lcg.lcg_float(state.s0)
        return RngState(s0=s0, s1=state.s1), x
    dim = jnp.asarray(dim, jnp.int32)
    if bufs.reference_tables:
        from realtimepathtracingresearchframework_tpu.ops import (
            pointsets_tables as ptab,
        )

        if variant == RNG_VARIANT_BN:
            x = ptab.sample_bnd(
                bufs.bn_sobol, bufs.bn_scrambling,
                state.s0 >> _U(16), state.s0 & _U(0xFFFF), dim,
            )
            return state, x
        # sobol_randomf: the per-draw scramble ADVANCES the LCG stream
        s1 = lcg.lcg_step(state.s1)
        v = ptab.sobol_point(
            bufs.matrices, state.s0, dim, s1,
            z_shuffling=variant == RNG_VARIANT_Z_SBL,
        )
        return RngState(s0=state.s0, s1=s1), sobol_mod.u32_to_float(v)
    v = _sobol_dim(bufs, variant, state, dim, None)
    x = sobol_mod.u32_to_float(v)
    if variant == RNG_VARIANT_BN:
        x = jnp.mod(x + _bn_offset(bufs, state, dim), 1.0)
    return state, x


def draw2t(variant: int, bufs: RngBuffers, state: RngState, dim):
    """Two floats at (dim, dim+1) -> (state, (x, y)) as a TUPLE of 1-D
    arrays — the SoA fast path (no stack/slice round-trip, ops/vec3.py)."""
    if variant == RNG_VARIANT_UNIFORM:
        s0, x = lcg.lcg_float(state.s0)
        s0, y = lcg.lcg_float(s0)
        return RngState(s0=s0, s1=state.s1), (x, y)
    state, x = draw1(variant, bufs, state, dim)
    state, y = draw1(variant, bufs, state, jnp.asarray(dim, jnp.int32) + 1)
    return state, (x, y)


def draw2(variant: int, bufs: RngBuffers, state: RngState, dim):
    """Two floats at (dim, dim+1) -> (state, (N,2))."""
    state, (x, y) = draw2t(variant, bufs, state, dim)
    return state, jnp.stack([x, y], axis=-1)


def _bn_offset(bufs: RngBuffers, state: RngState, dim):
    """Cranley-Patterson rotation by the blue-noise mask; pixel recovered
    from the scramble key is not invertible, so BN keys s1 carry the pixel
    hash — we index the mask by hashed key + dim channel."""
    h = sobol_mod._lk_hash(state.s1, _U(0xB1E))
    x = (h & _U(63)).astype(jnp.int32)
    y = ((h >> _U(6)) & _U(63)).astype(jnp.int32)
    c = jnp.remainder(dim, bufs.bn_mask.shape[2]).astype(jnp.int32)
    return bufs.bn_mask[x, y, c]
