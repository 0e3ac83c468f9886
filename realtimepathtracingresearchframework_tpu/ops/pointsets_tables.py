"""Reference-parity table-driven pointsets (Sobol / Z-Sobol / blue-noise).

Ports the reference's table-based sampling exactly, using the shipped
tables (converted by tools/convert_pointset_tables.py):

- Sobol (pointsets/sobol.glsl:81-213): per-pixel LCG-scrambled digits,
  direction numbers from ``SobolMatrix`` (1024 dims x 32 bits),
- Z-Sobol (Z_ORDER_SHUFFLING): Morton-order tile shuffling
  (sample_order.glsl morton_sample_id) + ``SobolInversion_1_0`` shift
  inversion + per-tile scrambling + leading-bit descrambling
  (sobol.glsl:92-157,169-183),
- BN (pointsets/bn_rng.glsl:11-74): Heitz-Belcour blue-noise dithered
  Sobol with the 128^2 scrambling tiles, BN_OPTIMIZED_DIMENSION_REPEAT
  and the 1spp-optimized mode (BN_OPTIMIZED_SPP == 1) the reference
  compiles with.

Draw values match the reference C++-compiled pointsets bit-exactly
(tests/test_pointsets_ref.py pins spot tuples produced by a harness
compiling the dual-compile GLSL).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from realtimepathtracingresearchframework_tpu.ops import rng as lcg

_U = jnp.uint32

SOBOL_DIMS = 1024
SOBOL_BITS = 32
SOBOL_TILE = 256  # SobolData_TileSize
SOBOL_TILE_BITS = 8
BN_TILE = 128  # BNData_TileSize
BN_DIMS = 256
BN_SCRAMBLE_DIMS = 8
BN_OPTIMIZED_SPP = 1


@functools.lru_cache(maxsize=1)
def _tables_np():
    path = os.path.join(
        os.path.dirname(__file__), "..", "data", "pointset_tables.npz"
    )
    return np.load(path)


def tables_available() -> bool:
    try:
        _tables_np()
        return True
    except OSError:
        return False


# ---------------------------------------------------------------------------
# Sobol point evaluation (sobol.glsl:81-112)
# ---------------------------------------------------------------------------


def sobol_point(matrices, index, dim, scramble, z_shuffling: bool):
    """sobol_point: XOR-fold the direction numbers of ``dim`` selected by
    ``index`` bits over ``scramble``. ``dim`` is a traced scalar (masked
    to 1024 dims); ``index``/``scramble`` are per-lane u32."""
    dim = dim.astype(jnp.int32) & jnp.int32(SOBOL_DIMS - 1)
    col = jax.lax.dynamic_slice(matrices, (dim, 0), (1, SOBOL_BITS))[0]
    result = scramble
    for k in range(SOBOL_BITS):
        bit = (index >> _U(k)) & _U(1)
        result = result ^ (col[k] * bit)
    if z_shuffling:
        # leading-bit descramble for the first two dims (sobol.glsl:93-108)
        fixed = result ^ (result << _U(SOBOL_TILE_BITS))
        result = jnp.where(dim < 2, fixed, result)
    return result


# ---------------------------------------------------------------------------
# Z-order sample shuffling (sample_order.glsl + sobol.glsl:114-159)
# ---------------------------------------------------------------------------


def _part1by1(x):
    x = x & _U(0x0000FFFF)
    x = (x ^ (x << _U(8))) & _U(0x00FF00FF)
    x = (x ^ (x << _U(4))) & _U(0x0F0F0F0F)
    x = (x ^ (x << _U(2))) & _U(0x33333333)
    x = (x ^ (x << _U(1))) & _U(0x55555555)
    return x


def morton_sample_id(sample_id, px, py, tile: int = SOBOL_TILE,
                     hash_tile_id: bool = True, hash_sample_id: bool = False):
    """morton_sample_id (sample_order.glsl:22-73) for power-of-two square
    ``tile`` dims: Z-order linear id with random per-level permutation and
    orientation (dimension-swap) shuffling."""
    px = px.astype(_U)
    py = py.astype(_U)
    tile_pcount = _U(tile * tile)

    parted_x = _part1by1(px)
    parted_y = _part1by1(py)
    linear = (parted_y << _U(1)) + parted_x

    # square power-of-two tile: both dims share the same mask
    min_dim_mask = _U(tile - 1)
    interleaved_mask = (min_dim_mask + _U(1)) * (min_dim_mask + _U(1)) - _U(1)
    linear = linear & interleaved_mask
    linear = linear | (
        ((px | py) & ~min_dim_mask) * (min_dim_mask + _U(1))
    )
    if not hash_tile_id:
        linear = linear & (tile_pcount - _U(1))

    scrambled = linear
    # bit vector enabling swap of interleaved dimension pairs
    swap_vec = parted_x ^ parted_y
    swap_vec = swap_vec | (swap_vec << _U(1))

    scramble_mask = interleaved_mask
    if hash_sample_id:
        sample_hash = lcg.murmur_hash3_mix(_U(0), _U(int(sample_id)))
    else:
        sample_hash = _U(0)
    tile_bits = int(tile).bit_length() - 1
    ie = 2 * tile_bits
    while ie > 0:
        perm = lcg.murmur_hash3_finalize(
            lcg.murmur_hash3_mix(
                jnp.broadcast_to(sample_hash, linear.shape), linear >> _U(ie)
            )
        )
        swap = (perm & _U(0x4)) != 0
        perm = perm & _U(0x3)
        ie -= 2
        scrambled = scrambled ^ ((perm << _U(ie)) & scramble_mask)
        # swap bit pair if fully contained in the scramble mask
        swap_mask = jnp.where(swap, _U(0x3) << _U(ie), _U(0))
        in_mask = swap_mask == (scramble_mask & swap_mask)
        scrambled = jnp.where(
            in_mask, scrambled ^ (swap_vec & swap_mask), scrambled
        )
    if hash_tile_id:
        scrambled = scrambled & (tile_pcount - _U(1))
    return _U(int(sample_id)) * tile_pcount + scrambled


def sobol_shift_invert(matrices, invert_tile, index, index_shift):
    """sobol_shift_invert (sobol.glsl:116-136): the next sample index
    overlapping the same tile pixel after ``index_shift``."""
    idx = index + index_shift
    r0 = jnp.zeros_like(idx)
    r1 = jnp.zeros_like(idx)
    col0 = matrices[0]  # SobolData_InvertDim0
    col1 = matrices[1]  # SobolData_InvertDim1
    for k in range(SOBOL_BITS):
        bit = (idx >> _U(k)) & _U(1)
        r0 = r0 ^ (col0[k] * bit)
        r1 = r1 ^ (col1[k] * bit)
    r0 = r0 >> _U(32 - SOBOL_TILE_BITS)
    r1 = r1 >> _U(32 - SOBOL_TILE_BITS)
    flat = (r1 * _U(SOBOL_TILE) + r0).astype(jnp.int32)
    return index_shift + invert_tile.reshape(-1)[flat]


def sobol_sample_id_z(matrices, invert_tile, sample_index, px, py):
    """get_sobol_rng's Z_ORDER_SHUFFLING index derivation
    (sobol.glsl:169-178): shuffle tile-local Morton ids, then find the
    corresponding Sobol sample for each pixel."""
    sample_offset = morton_sample_id(0, px, py, SOBOL_TILE, True, False) & _U(
        SOBOL_TILE * SOBOL_TILE - 1
    )
    shift = _U(SOBOL_TILE * SOBOL_TILE) * jnp.asarray(sample_index).astype(_U)
    return sobol_shift_invert(matrices, invert_tile, sample_offset, shift)


# ---------------------------------------------------------------------------
# Blue-noise dithered Sobol (bn_rng.glsl:32-78), 1spp-optimized mode
# ---------------------------------------------------------------------------


def sample_bnd(bn_sobol, bn_scrambling, pixel_id, sample_id, d):
    """sample_bnd with BN_OPTIMIZED_DIMENSION_REPEAT + BN_OPTIMIZED_SPP=1
    (the reference's compiled configuration): the 1spp ranking tile is
    zero and Sobol is effectively disabled — pure optimized BN points."""
    d = jnp.asarray(d).astype(_U)
    tile_mask = _U(BN_TILE - 1)

    x_doffset = d // _U(BN_SCRAMBLE_DIMS)
    pixel_id = ((pixel_id + x_doffset) & tile_mask) + (pixel_id & ~tile_mask)
    d = (d & _U(BN_SCRAMBLE_DIMS - 1)) + (
        x_doffset // _U(BN_TILE)
    ) * _U(BN_SCRAMBLE_DIMS)
    d = d & _U(BN_DIMS - 1)

    # mirroring + mask shifting per sample (BN_OPTIMIZED_SPP block)
    pixel_id = jnp.where(
        (sample_id & _U(BN_OPTIMIZED_SPP)) != 0,
        pixel_id ^ tile_mask,
        pixel_id,
    )
    pixel_id = jnp.where(
        (sample_id & _U(2 * BN_OPTIMIZED_SPP)) != 0,
        pixel_id ^ (tile_mask * _U(BN_TILE)),
        pixel_id,
    )
    x_soffset = (sample_id // _U(BN_OPTIMIZED_SPP)) * _U(73)
    y_soffset = (sample_id // _U(BN_OPTIMIZED_SPP)) * _U(97)
    pixel_id = ((pixel_id + x_soffset) & tile_mask) + (pixel_id & ~tile_mask)
    row_mask = _U(BN_TILE * (BN_TILE - 1))
    pixel_id = ((pixel_id + y_soffset * _U(BN_TILE)) & row_mask) + (
        pixel_id & ~row_mask
    )
    sample_id = sample_id & _U(BN_OPTIMIZED_SPP - 1)  # == 0 at 1spp

    ranking_index = (pixel_id * _U(BN_SCRAMBLE_DIMS) + (
        d & _U(BN_SCRAMBLE_DIMS - 1)
    )).astype(jnp.int32)
    ranked_sample = sample_id  # 1spp ranking tile is all zeros
    value = bn_sobol.reshape(-1)[
        (d + ranked_sample * _U(BN_DIMS)).astype(jnp.int32)
    ]
    value = value ^ bn_scrambling[ranking_index]
    return (jnp.float32(0.5) + value.astype(jnp.float32)) / jnp.float32(256.0)
