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

    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def num_leaves(self) -> int:
        return self.tri_tiles.shape[0] // 16


def pack_for_pallas2(tb: ThreadedBVH) -> PallasBVH2Buffers:
    """ThreadedBVH -> v2 device layout. Node links stay exact small ints
    stored as f32 VALUES; col 7 becomes the LEAF INDEX (row // 128)."""
    if tb.leaf_size != LEAF:
        raise ValueError(f"v2 traversal needs leaf_size={LEAF}, got {tb.leaf_size}")
    nodes = tb.nodes[:, 0:8].astype(np.float32).copy()
    skip = tb.nodes[:, 6].view(np.int32)
    leaf_row = tb.nodes[:, 7].view(np.int32)
    nodes[:, 6] = skip.astype(np.float32)
    nodes[:, 7] = np.where(leaf_row >= 0, leaf_row // LEAF, -1).astype(np.float32)

    rows = tb.tri_rows  # (R, >=9) leaf-major
    r = rows.shape[0]
    assert r % LEAF == 0
    nl = r // LEAF
    tiles = np.zeros((nl, 16, LEAF), np.float32)
    tiles[:, 0:9, :] = rows[:, 0:9].reshape(nl, LEAF, 9).transpose(0, 2, 1)
    return PallasBVH2Buffers(
        nodes=jnp.asarray(nodes),
        tri_tiles=jnp.asarray(tiles.reshape(nl * 16, LEAF)),
        row_tri=jnp.asarray(tb.row_tri.astype(np.int32)),
    )


def block_bounds(rays: jnp.ndarray, block: int) -> jnp.ndarray:
    """Per-block conservative packet bounds, computed in XLA (fuses into
    the ray-operand build). ``rays`` is (8, N) lane-major rows [ro3, rd3,
    tmin, tmax]; returns (N // block, 16) f32 rows:
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
    cols = [mn(r[k]) for k in range(3)]
    cols += [mx(r[k]) for k in range(3)]
    cols += [mn(inv[k]) for k in range(3)]
    cols += [mx(inv[k]) for k in range(3)]
    cols += [mn(r[6]), mx(r[7])]
    cols += [jnp.zeros((nb,), jnp.float32)] * 2
    return jnp.stack(cols, axis=-1)


def _mt_leaf(tile, rox, roy, roz, rdx, rdy, rdz, tmin, tmax, lane_iota,
             leaf_id, t_best, best_row, best_u, best_v):
    """(B, 128) Moller-Trumbore over one leaf tile — arithmetic identical
    to the v1 lane kernel (bit-exact results)."""
    v0x = tile[0:1, :]
    v0y = tile[1:2, :]
    v0z = tile[2:3, :]
    e1x = tile[3:4, :]
    e1y = tile[4:5, :]
    e1z = tile[5:6, :]
    e2x = tile[6:7, :]
    e2y = tile[7:8, :]
    e2z = tile[8:9, :]
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
    tmin_row = jnp.min(tt, axis=1, keepdims=True)  # (B, 1)
    improved = tmin_row < t_best
    is_best = (tt <= tmin_row) & hit
    lane_of_best = jnp.min(
        jnp.where(is_best, lane_iota, LEAF), axis=1, keepdims=True
    )
    pick = lane_iota == lane_of_best
    u_pick = jnp.sum(jnp.where(pick, uu, 0.0), axis=1, keepdims=True)
    v_pick = jnp.sum(jnp.where(pick, vv, 0.0), axis=1, keepdims=True)
    t_best = jnp.where(improved, tmin_row, t_best)
    best_row = jnp.where(
        improved, leaf_id * LEAF + lane_of_best.astype(jnp.int32), best_row
    )
    best_u = jnp.where(improved, u_pick, best_u)
    best_v = jnp.where(improved, v_pick, best_v)
    return t_best, best_row, best_u, best_v


def _kernel2(bounds_ref, nodes_ref, tris_ref, rays_ref, out_ref,
             lst, tb_ref, row_ref, u_ref, v_ref,
             *, num_nodes: int, block: int, shadow_from: int = -1):
    # bounds_ref is the scalar-prefetch operand: (nb, 16) block packet
    # bounds in SMEM, indexed by the grid position
    b = block
    pid = pl.program_id(0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LEAF), 1)

    # the operand arrives lane-major (8, B) — the orientation XLA can
    # produce with a plain concat of the integrator's SoA ray components
    # (a sublane-major (N, 8) stack is a relayout copy, ~1.4 ms/262K rays
    # per launch). ONE on-core transpose per block moves it to the
    # (B, 1)-per-ray orientation the tris-on-lanes MT wants.
    rays_t = jnp.transpose(rays_ref[:, :], (1, 0))  # (B, 8)
    rox = rays_t[:, 0:1]
    roy = rays_t[:, 1:2]
    roz = rays_t[:, 2:3]
    rdx = rays_t[:, 3:4]
    rdy = rays_t[:, 4:5]
    rdz = rays_t[:, 5:6]
    tmin = rays_t[:, 6:7]
    tmax = rays_t[:, 7:8]

    # block packet bounds: pure SMEM scalars
    olo = [bounds_ref[pid, k] for k in range(3)]
    ohi = [bounds_ref[pid, 3 + k] for k in range(3)]
    ilo = [bounds_ref[pid, 6 + k] for k in range(3)]
    ihi = [bounds_ref[pid, 9 + k] for k in range(3)]
    tlo = bounds_ref[pid, 12]
    thi = bounds_ref[pid, 13]

    tb_ref[:, :] = tmax
    row_ref[:, :] = jnp.full((b, 1), -1, jnp.int32)
    u_ref[:, :] = jnp.zeros((b, 1), jnp.float32)
    v_ref[:, :] = jnp.zeros((b, 1), jnp.float32)

    is_shadow = pid >= shadow_from if shadow_from >= 0 else None

    def flush_list(count, cap):
        """Vector MT over the listed leaf tiles; refresh the scalar cap
        (and the shadow resolved-count) — the walk's only vector work."""

        def lf(j, _):
            leaf_id = lst[j]
            tile = tris_ref[pl.ds(leaf_id * 16, 16), :]
            t_best, best_row, best_u, best_v = _mt_leaf(
                tile, rox, roy, roz, rdx, rdy, rdz, tmin, tmax, lane_iota,
                leaf_id, tb_ref[:, :], row_ref[:, :], u_ref[:, :], v_ref[:, :],
            )
            tb_ref[:, :] = t_best
            row_ref[:, :] = best_row
            u_ref[:, :] = best_u
            v_ref[:, :] = best_v
            return 0

        jax.lax.fori_loop(0, count, lf, 0, unroll=False)
        cap = jnp.max(jnp.minimum(tb_ref[:, :], tmax))
        nhit = jnp.sum(
            ((row_ref[:, :] >= 0) | (tmax <= tmin)).astype(jnp.int32)
        )
        return jnp.int32(0), cap, nhit

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

        # conservative packet-interval slab (all scalar)
        U = jnp.minimum(thi, cap)
        L = tlo
        expand_ok = True
        for k, (bmn, bmx) in enumerate(
            ((bminx, bmaxx), (bminy, bmaxy), (bminz, bmaxz))
        ):
            alo = bmn - ohi[k]
            ahi = bmn - olo[k]
            blo = bmx - ohi[k]
            bhi = bmx - olo[k]
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
            U2 = jnp.maximum(t0hi, t1hi)
            U = jnp.minimum(U, U2)
            # origin-box expansion: per-axis distance from the origin box
            # to the node box must be reachable within U (still culls when
            # the direction interval spans 0 and the slab degenerates)
            dist_k = jnp.maximum(alo, -bhi)  # max(bmin-ohi, olo-bmax)
            expand_ok = expand_ok & (dist_k <= jnp.minimum(thi, cap))
        live = (L <= U) & expand_ok
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

    # pack the (B, 1) result columns into lane-major (4, B) output rows
    # (ONE on-core transpose) so XLA-side consumers slice rows, not
    # strided columns
    res = jnp.concatenate(
        [
            jnp.where(row_ref[:, :] < 0, jnp.float32(_INF), tb_ref[:, :]),
            jax.lax.bitcast_convert_type(row_ref[:, :], jnp.float32),
            u_ref[:, :],
            v_ref[:, :],
        ],
        axis=1,
    )
    out_ref[:, :] = jnp.transpose(res, (1, 0))


@functools.partial(
    jax.jit, static_argnames=("num_nodes", "block", "shadow_from", "interpret")
)
def _traverse2(nodes, tri_tiles, rays, num_nodes: int, block: int,
               shadow_from: int = -1, interpret: bool = False):
    n = rays.shape[1]  # (8, Np) lane-major rows
    bounds = block_bounds(rays, block)
    grid = (n // block,)
    kernel = functools.partial(
        _kernel2, num_nodes=num_nodes, block=block, shadow_from=shadow_from,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the per-block packet bounds
        grid=grid,
        in_specs=[
            pl.BlockSpec(nodes.shape, lambda i, b_: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                tri_tiles.shape, lambda i, b_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, block), lambda i, b_: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, block), lambda i, b_: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((LIST_CAP,), jnp.int32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.int32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        interpret=interpret,
    )(bounds, nodes, tri_tiles, rays)


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
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    out = _traverse2(
        bb.nodes, bb.tri_tiles, rays,
        num_nodes=bb.num_nodes, block=block, interpret=INTERPRET,
    )
    return _out_to_hit(bb, out, n, map_tri)


def occluded_pallas2(
    bb: PallasBVH2Buffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None,
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    out = _traverse2(
        bb.nodes, bb.tri_tiles, rays,
        num_nodes=bb.num_nodes, block=block, shadow_from=0,
        interpret=INTERPRET,
    )
    rowbits = out[1, :n]
    return jax.lax.bitcast_convert_type(rowbits, jnp.int32) >= 0


def closest_and_occluded_pallas2(
    bb: PallasBVH2Buffers,
    comps_c, t_min_c, t_max_c,
    comps_s, t_min_s, t_max_s,
    block: int = DEFAULT_BLOCK, map_tri: bool = True,
):
    """ONE launch for the wavefront's two per-bounce queues (see
    traverse_pallas.closest_and_occluded_pallas): block-aligned halves of
    a single operand; occlusion blocks take the any-hit early exit via
    the ``shadow_from`` block predicate."""
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays_c, n = _prep_rays(None, None, t_min_c, t_max_c, block,
                           comps=comps_c, wide=True)
    rays_s, n2 = _prep_rays(None, None, t_min_s, t_max_s, block,
                            comps=comps_s, wide=True)
    rays = jnp.concatenate([rays_c, rays_s], axis=1)
    shadow_from = rays_c.shape[1] // block
    out = _traverse2(
        bb.nodes, bb.tri_tiles, rays,
        num_nodes=bb.num_nodes, block=block, shadow_from=shadow_from,
        interpret=INTERPRET,
    )
    np_c = rays_c.shape[1]
    hit = _out_to_hit(bb, out[:, :n], n, map_tri)
    srowbits = out[1, np_c:np_c + n2]
    blocked = jax.lax.bitcast_convert_type(srowbits, jnp.int32) >= 0
    return hit, blocked
