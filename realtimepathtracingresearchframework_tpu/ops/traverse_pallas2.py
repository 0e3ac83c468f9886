"""Pallas TPU traversal kernel v2: scalar-walk + batched leaf flush.

The v1 kernel (ops/traverse_pallas.py) pays ~2.6 us PER NODE STEP: every
step does a per-ray vector slab test whose ``jnp.any`` result feeds the
scalar cursor update — two vector->scalar round trips per step, each with
~1 us pipeline-sync latency (measured on v5e: 31k-tri terrain, 69
steps/block -> 92.8 ms per 262K coherent rays).

v2 removes the vector unit from the walk entirely:

- **per-block conservative bounds** (origin box, inverse-direction
  interval, t range) are reduced in XLA where they fuse with the ray
  operand build, and arrive as one (nb, 16) SMEM operand — the kernel
  never reduces vectors to scalars during the walk;
- the walk is a **pure scalar loop**: node AABB (SMEM) vs block bounds
  via interval arithmetic [Wald-style packet interval test] plus an
  origin-box-within-``cap`` expansion test (which still culls when the
  block mixes direction octants and the interval test degenerates);
- leaf hits append to an SMEM **leaf list** (branchless store +
  conditional increment); when the list fills, a vector **flush** runs
  the batched (B, 128) Moller-Trumbore over the listed leaf tiles and
  refreshes the scalar pruning ``cap`` — ONE vector->scalar sync per
  flush instead of two per node;
- triangle tiles are stored leaf-major ``(L*16, 128)`` f32 (row f =
  field f of the leaf's 128 triangles) — the compact streamed-kernel
  layout, VMEM-resident here: 64 B/triangle, no 8x lane padding.

Bit-exactness: the scalar test is a conservative superset of v1's
per-ray union test, so v2 visits a superset of v1's leaves in the same
preorder order; the per-ray MT uses strict improvement (``tt <
t_best``), so extra visited leaves can never replace v1's winner and
per-ray results are bit-identical (same closest t/tri/u/v).

Reference semantics preserved: inline ray-query traversal of
``pt_megakernel.glsl:440-478``; the packet-lockstep walk is the TPU
expression of the 32x16-workgroup subgroup model
(pt_megakernel.glsl:369-388).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from realtimepathtracingresearchframework_tpu.ops.bvh import ThreadedBVH

try:  # pallas requires the TPU backend; keep CPU test runs importable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LEAF = 128
DEFAULT_BLOCK = 512
LIST_CAP = 16  # leaf flush batch: pruning-cap refresh cadence
_INF = 2.0e32

# toggled by tests to run the kernels on the CPU interpreter (the
# Pallas analogue of the reference's shader-as-C++ compile+run tests,
# rendering/tests/compile.cpp)
INTERPRET = False


class PallasBVH2Buffers(NamedTuple):
    nodes: jnp.ndarray  # (M, 8) f32 SMEM: min3, max3, skip, leaf_id|-1
    tri_tiles: jnp.ndarray  # (L*16, 128) f32: leaf-major field rows
    row_tri: jnp.ndarray  # (L*128,) i32 row -> source triangle
    leaf_size: int = LEAF  # tris per leaf (32/64/128); leaves narrower
    # than 128 pack 128//leaf_size to a lane tile and the MT slices its
    # sublane band — small scenes waste 4x VPU on 128-padded leaves
    # (cornell: 32 real tris in a 128-wide tile)

    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def num_leaves(self) -> int:
        return self.tri_tiles.shape[0] // 16 * (128 // self.leaf_size)


def pack_for_pallas2(tb: ThreadedBVH) -> PallasBVH2Buffers:
    """ThreadedBVH -> v2 device layout. Node links stay exact small ints
    stored as f32 VALUES; col 7 becomes the LEAF INDEX (row //
    leaf_size). Leaf sizes 32/64 pack multiple leaves per 128-lane tile."""
    if 128 % tb.leaf_size != 0:
        raise ValueError(
            f"v2 traversal needs leaf_size in (32, 64, 128), got {tb.leaf_size}"
        )
    ls = tb.leaf_size
    nodes = tb.nodes[:, 0:8].astype(np.float32).copy()
    skip = tb.nodes[:, 6].view(np.int32)
    leaf_row = tb.nodes[:, 7].view(np.int32)
    nodes[:, 6] = skip.astype(np.float32)
    nodes[:, 7] = np.where(leaf_row >= 0, leaf_row // ls, -1).astype(np.float32)

    rows = tb.tri_rows  # (R, >=9) leaf-major
    r = rows.shape[0]
    assert r % ls == 0
    pad = (-r) % LEAF
    if pad:
        rows = np.concatenate(
            [rows, np.zeros((pad, rows.shape[1]), rows.dtype)], axis=0
        )
    nt = rows.shape[0] // LEAF
    tiles = np.zeros((nt, 16, LEAF), np.float32)
    tiles[:, 0:9, :] = rows[:, 0:9].reshape(nt, LEAF, 9).transpose(0, 2, 1)
    return PallasBVH2Buffers(
        nodes=jnp.asarray(nodes),
        tri_tiles=jnp.asarray(tiles.reshape(nt * 16, LEAF)),
        row_tri=jnp.asarray(tb.row_tri.astype(np.int32)),
        leaf_size=ls,
    )


def block_bounds(rays: jnp.ndarray, block: int) -> jnp.ndarray:
    """Per-block conservative packet bounds, computed in XLA (fuses into
    the ray-operand build). ``rays`` is (8, N) lane-major rows [ro3, rd3,
    tmin, tmax]; returns (16, N // block) f32 — row-major so the
    reduction output keeps the operand's lane layout (a (nb, 16) stack
    transposes every reduction result: measured 4.4 ms per 524K rays
    standalone). Rows:
      0-2 origin min, 3-5 origin max, 6-8 inv-dir min, 9-11 inv-dir max,
      12 tmin min, 13 tmax max, 14-15 pad.
    Dead lanes (tmax <= tmin) are excluded, so an all-dead block yields
    thi <= tlo and the kernel walk culls every node — block-level dead
    skipping with zero extra plumbing."""
    n = rays.shape[1]
    nb = n // block
    r = rays.reshape(8, nb, block)
    live = r[7] > r[6]
    big = jnp.float32(3.0e38)

    def mn(x):
        return jnp.min(jnp.where(live, x, big), axis=1)

    def mx(x):
        return jnp.max(jnp.where(live, x, -big), axis=1)

    d = r[3:6]
    inv = jnp.where(d >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(d), 1e-20)
    rows = [mn(r[k]) for k in range(3)]
    rows += [mx(r[k]) for k in range(3)]
    rows += [mn(inv[k]) for k in range(3)]
    rows += [mx(inv[k]) for k in range(3)]
    rows += [mn(r[6]), mx(r[7])]
    rows += [jnp.zeros((nb,), jnp.float32)] * 2
    return jnp.stack(rows, axis=0)


def block_bounds_with_dir(rays: jnp.ndarray, block: int) -> jnp.ndarray:
    """``block_bounds`` extended with the raw-direction box (rows 14-19:
    dir min3/max3, 20-23 pad) — the two-level kernel's object-space
    transform needs the direction interval itself, not just its inverse
    (ops/traverse_tlas.py). Shares the row-0..13 layout and live-lane
    masking with ``block_bounds`` by construction."""
    n = rays.shape[1]
    nb = n // block
    r = rays.reshape(8, nb, block)
    live = r[7] > r[6]
    big = jnp.float32(3.0e38)

    def mn(x):
        return jnp.min(jnp.where(live, x, big), axis=1)

    def mx(x):
        return jnp.max(jnp.where(live, x, -big), axis=1)

    base = block_bounds(rays, block)[0:14]
    rows = [mn(r[3 + k]) for k in range(3)]
    rows += [mx(r[3 + k]) for k in range(3)]
    rows += [jnp.zeros((nb,), jnp.float32)] * 4
    return jnp.concatenate([base, jnp.stack(rows, axis=0)], axis=0)


def interval_node_test_entry(bmn3, bmx3, olo, ohi, ilo, ihi, tlo, thi, cap,
                             dist_scale=None):
    """Conservative scalar packet-vs-AABB test shared by every walk
    kernel (resident v2, streamed, binned, TLAS): Wald interval slab
    over the packet's origin box [olo, ohi] and inverse-direction box
    [ilo, ihi], plus the origin-box expansion term that still culls when
    the direction interval spans zero and the slab degenerates.

    Returns ``(overlap, L)`` where L is the packet's conservative
    entry-t lower bound — the front-to-back sort key of the ordered
    walks. ``dist_scale`` (None = world space, no multiply) converts a
    per-axis object-space DISTANCE into a minimum world t for the
    two-level kernel (sigma_min of the instance transform)."""
    U = jnp.minimum(thi, cap)
    L = tlo
    expand_ok = True
    for k in range(3):
        alo = bmn3[k] - ohi[k]
        ahi = bmn3[k] - olo[k]
        blo = bmx3[k] - ohi[k]
        bhi = bmx3[k] - olo[k]
        t0lo = jnp.minimum(
            jnp.minimum(alo * ilo[k], alo * ihi[k]),
            jnp.minimum(ahi * ilo[k], ahi * ihi[k]),
        )
        t0hi = jnp.maximum(
            jnp.maximum(alo * ilo[k], alo * ihi[k]),
            jnp.maximum(ahi * ilo[k], ahi * ihi[k]),
        )
        t1lo = jnp.minimum(
            jnp.minimum(blo * ilo[k], blo * ihi[k]),
            jnp.minimum(bhi * ilo[k], bhi * ihi[k]),
        )
        t1hi = jnp.maximum(
            jnp.maximum(blo * ilo[k], blo * ihi[k]),
            jnp.maximum(bhi * ilo[k], bhi * ihi[k]),
        )
        L = jnp.maximum(L, jnp.minimum(t0lo, t1lo))
        U = jnp.minimum(U, jnp.maximum(t0hi, t1hi))
        dist_k = jnp.maximum(alo, -bhi)  # max(bmin-ohi, olo-bmax)
        if dist_scale is not None:
            dist_k = dist_k * dist_scale
        expand_ok = expand_ok & (dist_k <= jnp.minimum(thi, cap))
    return (L <= U) & expand_ok, L


def _mt_leaf(tile_f, rox, roy, roz, rdx, rdy, rdz, tmin, tmax, sub_iota,
             leaf_id, t_best, best_row, best_u, best_v, leaf_size=LEAF):
    """(leaf_size tris, B rays) Moller-Trumbore over one leaf. Rays stay
    LANE-major (1, B) end-to-end (zero whole-block transposes — v2's
    original (B, 8)/(B, 128) orientation spent ~5 us/block on operand +
    output relayout); the (16, 128) field-major tile is transposed to
    (128, 16) tri-major once per visit, which is tiny next to the MT.
    ``leaf_size`` < 128 slices the leaf's sublane band out of the shared
    128-tri tile (``sub_iota`` must be (leaf_size, 1)) — 2-4x less VPU
    work per visit on small scenes. Arithmetic identical to the v1 wide
    kernel (bit-exact: min and one-hot-sum reductions are
    order-independent)."""
    tile = jnp.transpose(tile_f, (1, 0))  # (128 tris, 16 fields)
    if leaf_size != LEAF:
        # dynamic sublane rotate + static slice: Mosaic lowers
        # tpu.dynamic_rotate natively, whereas a value-level
        # lax.dynamic_slice has no TPU kernel lowering (interpret mode
        # accepts it, the chip rejects it)
        lpt = LEAF // leaf_size
        # non-negative rotate amount: tpu.dynamic_rotate expects the
        # shift in [0, dim) and a traced negative bypasses the wrapper's
        # static check (interpret mode's jnp.roll accepts negatives, the
        # chip's behavior is unspecified)
        tile = pltpu.roll(
            tile, ((lpt - leaf_id % lpt) % lpt) * leaf_size, 0
        )
        tile = tile[0:leaf_size, :]
    v0x = tile[:, 0:1]
    v0y = tile[:, 1:2]
    v0z = tile[:, 2:3]
    e1x = tile[:, 3:4]
    e1y = tile[:, 4:5]
    e1z = tile[:, 5:6]
    e2x = tile[:, 6:7]
    e2y = tile[:, 7:8]
    e2z = tile[:, 8:9]
    # (128, 1) x (1, B) -> (128 tris, B rays)
    px = rdy * e2z - rdz * e2y
    py = rdz * e2x - rdx * e2z
    pz = rdx * e2y - rdy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvx = rox - v0x
    tvy = roy - v0y
    tvz = roz - v0z
    uu = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (uu >= 0.0)
        & (vv >= 0.0)
        & (uu + vv <= 1.0)
        & (tt > tmin)
        & (tt < jnp.minimum(t_best, tmax))
    )
    tt = jnp.where(hit, tt, _INF)
    tmin_col = jnp.min(tt, axis=0, keepdims=True)  # (1, B)
    is_best = (tt <= tmin_col) & hit
    sub_of_best = jnp.min(
        jnp.where(is_best, sub_iota, leaf_size), axis=0, keepdims=True
    )
    new_row = leaf_id * leaf_size + sub_of_best.astype(jnp.int32)
    # ORDER-INDEPENDENT merge: on an exact cross-leaf t tie the lower
    # row wins. With the ascending (preorder) flush order this is
    # bit-identical to the historical first-flush-wins rule; it also
    # licenses reordered flush schedules (the v3 banded front-to-back
    # scan) without changing any result. The tmin_col < _INF guard
    # keeps all-miss flushes (new_row = leaf_id*ls + ls) from touching
    # lanes whose t_best is still tmax/_INF.
    improved = (tmin_col < t_best) | (
        (tmin_col == t_best) & (tmin_col < _INF) & (new_row < best_row)
    )
    pick = sub_iota == sub_of_best
    u_pick = jnp.sum(jnp.where(pick, uu, 0.0), axis=0, keepdims=True)
    v_pick = jnp.sum(jnp.where(pick, vv, 0.0), axis=0, keepdims=True)
    t_best = jnp.where(improved, tmin_col, t_best)
    best_row = jnp.where(improved, new_row, best_row)
    best_u = jnp.where(improved, u_pick, best_u)
    best_v = jnp.where(improved, v_pick, best_v)
    return t_best, best_row, best_u, best_v


def _mt_leaf_any(tile_f, rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
                 leaf_id=0, leaf_size=LEAF):
    """(leaf_size tris, B rays) Moller-Trumbore hit TEST over one leaf:
    per-ray any-hit bool, no best tracking (the v1 ``any_hit`` walk's
    cheap leaf test, vectorized over the flush list). Same lane-major
    orientation and sublane-band slicing as ``_mt_leaf``."""
    tile = jnp.transpose(tile_f, (1, 0))  # (128 tris, 16 fields)
    if leaf_size != LEAF:
        # see _mt_leaf: dynamic rotate + static slice (TPU-lowerable),
        # non-negative amount (tpu.dynamic_rotate wants [0, dim))
        lpt = LEAF // leaf_size
        tile = pltpu.roll(
            tile, ((lpt - leaf_id % lpt) % lpt) * leaf_size, 0
        )
        tile = tile[0:leaf_size, :]
    v0x = tile[:, 0:1]
    v0y = tile[:, 1:2]
    v0z = tile[:, 2:3]
    e1x = tile[:, 3:4]
    e1y = tile[:, 4:5]
    e1z = tile[:, 5:6]
    e2x = tile[:, 6:7]
    e2y = tile[:, 7:8]
    e2z = tile[:, 8:9]
    px = rdy * e2z - rdz * e2y
    py = rdz * e2x - rdx * e2z
    pz = rdx * e2y - rdy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvx = rox - v0x
    tvy = roy - v0y
    tvz = roz - v0z
    uu = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (uu >= 0.0)
        & (vv >= 0.0)
        & (uu + vv <= 1.0)
        & (tt > tmin)
        & (tt < tmax)
    )
    return jnp.any(hit, axis=0, keepdims=True)  # (1, B)


def _kernel2(bounds_ref, nodes_ref, tris_ref, rays_ref, out_ref,
             lst, tb_ref, row_ref, u_ref, v_ref,
             *, num_nodes: int, block: int, shadow_from: int = -1,
             leaf_size: int = LEAF):
    # bounds_ref is the scalar-prefetch operand: (nb, 16) block packet
    # bounds in SMEM, indexed by the grid position
    b = block
    pid = pl.program_id(0)
    lpt = LEAF // leaf_size  # leaves per 128-lane tile
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (leaf_size, 1), 0)

    # the operand arrives lane-major (8, B) — the orientation XLA can
    # produce with a plain concat of the integrator's SoA ray components
    # (a sublane-major (N, 8) stack is a relayout copy, ~1.4 ms/262K rays
    # per launch) — and STAYS lane-major: each component is a (1, B) row
    # and the MT runs tris-on-sublanes x rays-on-lanes, so the kernel
    # does zero whole-block transposes.
    rox = rays_ref[0:1, :]
    roy = rays_ref[1:2, :]
    roz = rays_ref[2:3, :]
    rdx = rays_ref[3:4, :]
    rdy = rays_ref[4:5, :]
    rdz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]

    # block packet bounds: pure SMEM scalars
    olo = [bounds_ref[k, pid] for k in range(3)]
    ohi = [bounds_ref[3 + k, pid] for k in range(3)]
    ilo = [bounds_ref[6 + k, pid] for k in range(3)]
    ihi = [bounds_ref[9 + k, pid] for k in range(3)]
    tlo = bounds_ref[12, pid]
    thi = bounds_ref[13, pid]

    tb_ref[:, :] = tmax
    row_ref[:, :] = jnp.full((1, b), -1, jnp.int32)
    u_ref[:, :] = jnp.zeros((1, b), jnp.float32)
    v_ref[:, :] = jnp.zeros((1, b), jnp.float32)

    is_shadow = pid >= shadow_from if shadow_from >= 0 else None

    def flush_closest(count, cap):
        """Vector MT over the listed leaf tiles; refresh the scalar cap
        — the walk's only vector work."""

        def lf(j, _):
            leaf_id = lst[j]
            tile = tris_ref[pl.ds((leaf_id // lpt) * 16, 16), :]
            t_best, best_row, best_u, best_v = _mt_leaf(
                tile, rox, roy, roz, rdx, rdy, rdz, tmin, tmax, sub_iota,
                leaf_id, tb_ref[:, :], row_ref[:, :], u_ref[:, :], v_ref[:, :],
                leaf_size=leaf_size,
            )
            tb_ref[:, :] = t_best
            row_ref[:, :] = best_row
            u_ref[:, :] = best_u
            v_ref[:, :] = best_v
            return 0

        jax.lax.fori_loop(0, count, lf, 0, unroll=False)
        cap = jnp.max(jnp.minimum(tb_ref[:, :], tmax))
        return jnp.int32(0), cap, jnp.int32(0)

    def flush_shadow(count, cap):
        """Any-hit flush: same MT hit test, but only a per-ray blocked
        flag — no best tracking, no cap refresh. ONE scalar sync (the
        resolved count that drives the walk's early exit)."""

        def lf(j, _):
            leaf_id = lst[j]
            tile = tris_ref[pl.ds((leaf_id // lpt) * 16, 16), :]
            hit_any = _mt_leaf_any(
                tile, rox, roy, roz, rdx, rdy, rdz, tmin,
                jnp.minimum(tb_ref[:, :], tmax),
                leaf_id=leaf_id, leaf_size=leaf_size,
            )
            row_ref[:, :] = jnp.where(
                hit_any, leaf_id * leaf_size, row_ref[:, :]
            )
            return 0

        jax.lax.fori_loop(0, count, lf, 0, unroll=False)
        nhit = jnp.sum(
            ((row_ref[:, :] >= 0) | (tmax <= tmin)).astype(jnp.int32)
        )
        return jnp.int32(0), cap, nhit

    if shadow_from < 0:
        flush_list = flush_closest
    elif shadow_from == 0:
        flush_list = flush_shadow
    else:

        def flush_list(count, cap):
            return jax.lax.cond(
                is_shadow, flush_shadow, flush_closest, count, cap
            )

    def cond(c):
        cur = c[0]
        if is_shadow is not None:
            return (cur < num_nodes) & (~is_shadow | (c[3] < b))
        return cur < num_nodes

    def body(c):
        cur, count, cap, nhit = c
        bminx = nodes_ref[cur, 0]
        bminy = nodes_ref[cur, 1]
        bminz = nodes_ref[cur, 2]
        bmaxx = nodes_ref[cur, 3]
        bmaxy = nodes_ref[cur, 4]
        bmaxz = nodes_ref[cur, 5]
        skip = nodes_ref[cur, 6].astype(jnp.int32)
        leaf_id = nodes_ref[cur, 7].astype(jnp.int32)

        # conservative packet-interval slab (all scalar, shared helper)
        live, _ = interval_node_test_entry(
            (bminx, bminy, bminz), (bmaxx, bmaxy, bmaxz),
            olo, ohi, ilo, ihi, tlo, thi, cap,
        )
        is_leaf = leaf_id >= 0

        # branchless leaf append: unconditional store + masked increment
        lst[count] = leaf_id
        count = count + (live & is_leaf).astype(jnp.int32)
        nxt = jnp.where(live & ~is_leaf, cur + 1, skip)

        count, cap, nhit = jax.lax.cond(
            count >= LIST_CAP,
            lambda args: flush_list(args[0], args[1]),
            lambda args: args,
            (count, cap, nhit),
        )
        return (nxt, count, cap, nhit)

    init = (jnp.int32(0), jnp.int32(0), thi, jnp.int32(0))
    _, count, cap, _ = jax.lax.while_loop(cond, body, init)
    flush_list(count, cap)

    # results are already lane-major (1, B) rows — stack into the (4, B)
    # output with a plain concat, zero transposes
    out_ref[:, :] = jnp.concatenate(
        [
            jnp.where(row_ref[:, :] < 0, jnp.float32(_INF), tb_ref[:, :]),
            jax.lax.bitcast_convert_type(row_ref[:, :], jnp.float32),
            u_ref[:, :],
            v_ref[:, :],
        ],
        axis=0,
    )


MAX_BLOCKS = 1024  # per-launch grid cap: the scalar-prefetch machinery's
# SMEM bookkeeping scales with grid steps (measured OOM at 2048 blocks on
# v5e); bigger queues split into multiple launches


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_nodes", "block", "shadow_from", "interpret", "leaf_size"
    ),
)
def _traverse2(nodes, tri_tiles, rays, num_nodes: int, block: int,
               shadow_from: int = -1, interpret: bool = False,
               leaf_size: int = LEAF):
    n = rays.shape[1]  # (8, Np) lane-major rows
    nb = n // block
    if nb > MAX_BLOCKS:
        outs = []
        for s in range(0, nb, MAX_BLOCKS):
            e = min(s + MAX_BLOCKS, nb)
            if shadow_from < 0 or shadow_from - s >= e - s:
                sf = -1  # all-closest slice
            else:
                sf = max(0, shadow_from - s)  # 0 = all-shadow slice
            outs.append(
                _traverse2(
                    nodes, tri_tiles, rays[:, s * block:e * block],
                    num_nodes=num_nodes, block=block, shadow_from=sf,
                    interpret=interpret, leaf_size=leaf_size,
                )
            )
        return jnp.concatenate(outs, axis=1)
    # barrier: without it XLA fuses the bounds reduction into the RAY
    # PRODUCER chain (camera/BSDF-sample math), re-running that whole
    # chain a second time per dispatch inside the frame program
    rays = jax.lax.optimization_barrier(rays)
    bounds = block_bounds(rays, block)
    grid = (nb,)
    kernel = functools.partial(
        _kernel2, num_nodes=num_nodes, block=block, shadow_from=shadow_from,
        leaf_size=leaf_size,
    )
    # bounds ride as a PLAIN whole-array SMEM operand (like the node
    # table), NOT scalar prefetch: the PrefetchScalarGridSpec machinery
    # measured ~1.5-2 ms extra fixed cost per dispatch and allocates
    # per-grid-step SMEM bookkeeping (OOM at 2048 blocks)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(bounds.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(nodes.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                tri_tiles.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((LIST_CAP,), jnp.int32),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.int32),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        interpret=interpret,
    )(bounds, nodes, tri_tiles, rays)


def _part1by2_u32(x):
    """Spread the low 10 bits of x two apart (morton dilation)."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x30000FF)
    x = (x | (x << 8)) & jnp.uint32(0x300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x30C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x9249249)
    return x


def _coherence_key2(rays, scene_lo, scene_hi):
    """u32 coherence key for the resident packet walk, from the packed
    (8, Np) operand: bit 31 = dead lane (always sorts last — compaction),
    bits 21-23 = direction octant (octant-major: the per-block
    inverse-direction INTERVAL test degenerates when a block mixes
    direction signs), bits 0-20 = origin morton on a 128^3 grid over the
    scene AABB (origin-local blocks keep the packet origin box tight).
    Same key contract as traverse_stream._coherence_key."""
    lo = scene_lo
    inv = 127.0 / jnp.maximum(scene_hi - scene_lo, 1e-12)

    def q(k):
        return jnp.clip(
            (rays[k] - lo[k]) * inv[k], 0.0, 127.0
        ).astype(jnp.uint32)

    morton = (
        _part1by2_u32(q(0))
        | (_part1by2_u32(q(1)) << 1)
        | (_part1by2_u32(q(2)) << 2)
    )
    octant = (
        (rays[3] < 0.0).astype(jnp.uint32) << 2
        | (rays[4] < 0.0).astype(jnp.uint32) << 1
        | (rays[5] < 0.0).astype(jnp.uint32)
    )
    dead = ~(rays[7] > rays[6])
    return (dead.astype(jnp.uint32) << 31) | (octant << 21) | morton


def _compact(rays, scene_lo=None, scene_hi=None):
    """Stable live-first (and, given the scene box, coherence-ordered)
    lane sort of a packed (8, Np) ray operand — the TPU-native expression
    of the north-star wavefront design's stream-compacted queues (SURVEY
    §7): with RR from depth 2 most lanes are dead past bounce 3, and
    after this sort they cluster into all-dead trailing blocks whose
    packet bounds are empty, so the v2 walk culls the ROOT node and exits
    in one scalar step per block. With ``scene_lo/hi`` the live lanes are
    further ordered (octant, origin-morton) so incoherent bounce blocks
    become octant-pure and origin-local — the per-block conservative
    bounds stay tight on real-scene BVHs (the village-cliff fix,
    VERDICT r3 #1).

    Cost (measured r4 on v5e per 524K lanes, prof/prof_r4_sortcost.py):
    stable argsort 1.9 ms x2 (perm + inverse) + ONE 2-D lane gather of
    the (8, Np) operand 4.3 ms + the (4, Np) un-permute gather ~2.2 ms
    — ~10 ms per dispatch. The round-3 implementation used lane-dim
    SCATTERS and per-component 1-D gathers based on stale measurements;
    those primitives measure 45.7 ms / 42 ms TODAY, which is exactly why
    default compaction regressed cornell in round 3.

    Returns (rays_sorted, inv): ``out[:, inv]`` restores original lane
    order for a sorted-order kernel result. Per-ray results are EXACT
    under any block composition (a live ray's leaves always pass the
    conservative packet test and the per-ray MT is independent of its
    block mates), so the sort is bit-invisible."""
    if scene_lo is not None:
        key = _coherence_key2(rays, scene_lo, scene_hi)
        perm = jnp.argsort(key, stable=True)
    else:
        live = rays[7] > rays[6]
        perm = jnp.argsort(~live, stable=True)
    inv = jnp.argsort(perm)  # a permutation's argsort is its inverse
    return rays[:, perm], inv


def _uncompact(out, inv):
    """Gather a sorted-order result back to original lane order:
    out_orig[:, i] = out[:, inv[i]] (see _compact).

    The gather runs on an i32 bitcast view: row 1 of a kernel result
    holds bitcast int32 row indices whose f32 bit patterns are
    denormals, and a fused f32 gather canonicalizes (flushes) them to
    zero when XLA fuses an f32-converting producer into the same kernel
    (verified on chip; see integrator._permute_lanes). Integer gathers
    never canonicalize; genuine f32 rows (t, u, v) ride the double
    bitcast losslessly."""
    bits = jax.lax.bitcast_convert_type(out, jnp.int32)[:, inv]
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _out_to_hit(bb: PallasBVH2Buffers, out, n, map_tri: bool):
    from realtimepathtracingresearchframework_tpu.ops.traverse import Hit

    t, rowbits = out[0, :n], out[1, :n]
    u, v = out[2, :n], out[3, :n]
    row = jax.lax.bitcast_convert_type(rowbits, jnp.int32)
    if map_tri:
        tri = jnp.where(row < 0, -1, bb.row_tri[jnp.maximum(row, 0)])
    else:
        tri = row
    return Hit(t=t, tri=tri, u=u, v=v)


def closest_hit_pallas2(
    bb: PallasBVH2Buffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, map_tri: bool = True,
    compact: bool = False,
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    if compact:
        rays, inv = _compact(rays, bb.nodes[0, 0:3], bb.nodes[0, 3:6])
    out = _traverse2(
        bb.nodes, bb.tri_tiles, rays,
        num_nodes=bb.num_nodes, block=block, interpret=INTERPRET,
        leaf_size=bb.leaf_size,
    )
    if compact:
        out = _uncompact(out, inv)
    return _out_to_hit(bb, out, n, map_tri)


def occluded_pallas2(
    bb: PallasBVH2Buffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, compact: bool = False,
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    if compact:
        rays, inv = _compact(rays, bb.nodes[0, 0:3], bb.nodes[0, 3:6])
    out = _traverse2(
        bb.nodes, bb.tri_tiles, rays,
        num_nodes=bb.num_nodes, block=block, shadow_from=0,
        interpret=INTERPRET, leaf_size=bb.leaf_size,
    )
    if compact:
        rowbits = _uncompact(out[1:2], inv)[0, :n]
    else:
        rowbits = out[1, :n]
    return jax.lax.bitcast_convert_type(rowbits, jnp.int32) >= 0


def closest_and_occluded_pallas2(
    bb: PallasBVH2Buffers,
    comps_c, t_min_c, t_max_c,
    comps_s, t_min_s, t_max_s,
    block: int = DEFAULT_BLOCK, map_tri: bool = True,
    compact: bool = False,
):
    """ONE launch for the wavefront's two per-bounce queues (see
    traverse_pallas.closest_and_occluded_pallas): block-aligned halves of
    a single operand; occlusion blocks take the any-hit early exit via
    the ``shadow_from`` block predicate. ``compact`` partitions each half
    live-first (see ``_compact``) so dead lanes form skipped blocks."""
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays_c, n = _prep_rays(None, None, t_min_c, t_max_c, block,
                           comps=comps_c, wide=True)
    rays_s, n2 = _prep_rays(None, None, t_min_s, t_max_s, block,
                            comps=comps_s, wide=True)
    if compact:
        lo, hi = bb.nodes[0, 0:3], bb.nodes[0, 3:6]
        rays_c, inv_c = _compact(rays_c, lo, hi)
        rays_s, inv_s = _compact(rays_s, lo, hi)
    rays = jnp.concatenate([rays_c, rays_s], axis=1)
    shadow_from = rays_c.shape[1] // block
    out = _traverse2(
        bb.nodes, bb.tri_tiles, rays,
        num_nodes=bb.num_nodes, block=block, shadow_from=shadow_from,
        interpret=INTERPRET, leaf_size=bb.leaf_size,
    )
    np_c = rays_c.shape[1]
    out_c = out[:, :np_c]
    srow = out[1, np_c:]
    if compact:
        out_c = _uncompact(out_c, inv_c)[:, :n]
        srow = _uncompact(srow[None], inv_s)[0, :n2]
    else:
        out_c = out_c[:, :n]
        srow = srow[:n2]
    hit = _out_to_hit(bb, out_c, n, map_tri)
    blocked = jax.lax.bitcast_convert_type(srow, jnp.int32) >= 0
    return hit, blocked
