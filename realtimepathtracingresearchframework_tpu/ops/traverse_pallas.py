"""Pallas TPU traversal kernel.

The XLA-level traversals (ops/traverse.py) are bound by HBM gather latency:
every dependent BVH step costs ~35us regardless of batch width. This kernel
keeps the hot structures on-core and walks the threaded BVH with a scalar
cursor per ray packet:

- **node table in SMEM** — scalar memory exists exactly for data-dependent
  scalar loads; one node = 8 scalar reads,
- **fat 128-triangle leaves in VMEM**, stored triangle-major ``(128, 16)``
  so a leaf is one aligned sublane slice; leaf intersection is a dense
  ``(128 tris, B rays)`` Moller-Trumbore — triangles broadcast from
  sublanes, rays from lanes, so the packet state (``t_best`` etc.) stays
  lane-major ``(1, B)`` end to end and the kernel contains ZERO on-core
  transposes (the earlier rays-in-sublanes orientation paid 8 relayouts
  per grid step),
- per-node culling uses the conservative packet max (``cap``).

The packet shares one cursor — the reference's 32x16-workgroup lockstep
model (pt_megakernel.glsl:369-388) made explicit. Scenes fit while the
node table fits the ~1 MB SMEM window (measured: 2113 nodes fail ->
~98k tris at leaf 128; the renderer gates at 90k); larger scenes use the
HBM-streamed kernel (ops/traverse_stream.py), which measures within ~3%
of the resident kernel at equal scene size (80k-tri terrain: 126.4 vs
129.8 ms per 262K primaries — the subtree DMA machinery is ~free).
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

PALLAS_LEAF_SIZE = 128
DEFAULT_BLOCK = 512
# (Rp,16) triangle tables pad the minor dim to 128 lanes in VMEM (8x);
# beyond this many rows switch to the compact (16,Rp) lane-major layout
WIDE_MAX_ROWS = 8192
_INF = 2.0e32


class PallasBVHBuffers(NamedTuple):
    nodes: jnp.ndarray  # (M, 8) f32 in SMEM: min3, max3, skip, leaf_row
    tris_s: jnp.ndarray  # (Rp, 16) f32 triangle-major: cols 0-8 = v0/e1/e2
    row_tri: jnp.ndarray  # (Rp,) i32

    @property
    def num_nodes(self) -> int:
        # static: derived from the (unpadded) node array shape so the
        # buffers stay a pure pytree of arrays under jit
        return self.nodes.shape[0]


def pack_for_pallas(tb: ThreadedBVH) -> PallasBVHBuffers:
    if tb.leaf_size != PALLAS_LEAF_SIZE:
        raise ValueError(
            f"pallas traversal needs leaf_size={PALLAS_LEAF_SIZE}, got {tb.leaf_size}"
        )
    m = tb.num_nodes
    nodes = tb.nodes[:, 0:8].astype(np.float32).copy()
    # links as exact small ints in f32
    nodes[:, 6] = tb.nodes[:, 6].view(np.int32).astype(np.float32)
    nodes[:, 7] = tb.nodes[:, 7].view(np.int32).astype(np.float32)

    r = len(tb.tri_rows)
    rp = r + ((-r) % 128)
    if rp <= WIDE_MAX_ROWS:
        tris_s = np.zeros((rp, 16), np.float32)
        tris_s[:r, 0:9] = tb.tri_rows[:, 0:9]
    else:
        tris_s = np.zeros((16, rp), np.float32)
        tris_s[0:9, :r] = tb.tri_rows[:, 0:9].T
    row_tri = np.zeros(rp, np.int32)
    row_tri[:r] = tb.row_tri
    assert nodes.shape[0] == m
    return PallasBVHBuffers(
        nodes=jnp.asarray(nodes),
        tris_s=jnp.asarray(tris_s),
        row_tri=jnp.asarray(row_tri),
    )


def _kernel(nodes_ref, tris_ref, rays_ref,
            out_ref, *, num_nodes: int, any_hit: bool,
            block: int, shadow_from: int = -1):
    # Rays arrive as ONE (8, B) operand (rows = rox..tmax). A single packed
    # operand means XLA materializes the ray data with a single producer
    # fusion: with eight separate operands, XLA re-ran the (expensive,
    # unfusable-into-custom-calls) producer chain once PER OPERAND, which
    # dominated in-context cost (65ms vs 9ms standalone for shadow rays).
    b = block
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (PALLAS_LEAF_SIZE, 1), 0)

    # lane-major (1, B) rows — the ONLY ray layout in the kernel
    rox = rays_ref[0:1, :]
    roy = rays_ref[1:2, :]
    roz = rays_ref[2:3, :]
    rdx = rays_ref[3:4, :]
    rdy = rays_ref[4:5, :]
    rdz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]

    tiny = 1e-20

    def inv(d):
        return jnp.where(d >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(d), tiny)

    ix, iy, iz = inv(rdx), inv(rdy), inv(rdz)

    # merged launch (closest_and_occluded_pallas): grid blocks >=
    # shadow_from hold occlusion rays, which may stop once every lane has
    # found SOME hit (the any-hit early exit, per-block in one launch)
    is_shadow = pl.program_id(0) >= shadow_from if shadow_from >= 0 else None

    def cond(c):
        cur = c[0]
        if any_hit:
            return (cur < num_nodes) & (c[5] < b)
        if is_shadow is not None:
            return (cur < num_nodes) & (~is_shadow | (c[5] < b))
        return cur < num_nodes

    def body(c):
        cur, t_best, best_row, best_u, best_v, nhit, cap = c

        bminx = nodes_ref[cur, 0]
        bminy = nodes_ref[cur, 1]
        bminz = nodes_ref[cur, 2]
        bmaxx = nodes_ref[cur, 3]
        bmaxy = nodes_ref[cur, 4]
        bmaxz = nodes_ref[cur, 5]
        skip = nodes_ref[cur, 6].astype(jnp.int32)
        leaf_row = nodes_ref[cur, 7].astype(jnp.int32)

        tx0 = (bminx - rox) * ix
        tx1 = (bmaxx - rox) * ix
        ty0 = (bminy - roy) * iy
        ty1 = (bmaxy - roy) * iy
        tz0 = (bminz - roz) * iz
        tz1 = (bmaxz - roz) * iz
        tenter = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), tmin),
        )
        texit = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), jnp.minimum(tmax, cap)),
        )
        any_live = jnp.any(tenter <= texit)
        is_leaf = leaf_row >= 0

        def leaf_fn(carry):
            t_best, best_row, best_u, best_v = carry
            row = pl.multiple_of(jnp.maximum(leaf_row, 0), PALLAS_LEAF_SIZE)
            tile = tris_ref[pl.ds(row, PALLAS_LEAF_SIZE), :]  # (128, 16)
            v0x = tile[:, 0:1]
            v0y = tile[:, 1:2]
            v0z = tile[:, 2:3]
            e1x = tile[:, 3:4]
            e1y = tile[:, 4:5]
            e1z = tile[:, 5:6]
            e2x = tile[:, 6:7]
            e2y = tile[:, 7:8]
            e2z = tile[:, 8:9]
            # (128,1) x (1,B) -> (128 tris, B rays)
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
            improved = tmin_col < t_best
            is_best = (tt <= tmin_col) & hit
            # first best triangle (sublane) per ray
            sub_of_best = jnp.min(
                jnp.where(is_best, sub_iota, PALLAS_LEAF_SIZE),
                axis=0,
                keepdims=True,
            )
            pick = sub_iota == sub_of_best
            u_pick = jnp.sum(jnp.where(pick, uu, 0.0), axis=0, keepdims=True)
            v_pick = jnp.sum(jnp.where(pick, vv, 0.0), axis=0, keepdims=True)
            t_best = jnp.where(improved, tmin_col, t_best)
            best_row = jnp.where(
                improved, leaf_row + sub_of_best.astype(jnp.int32), best_row
            )
            best_u = jnp.where(improved, u_pick, best_u)
            best_v = jnp.where(improved, v_pick, best_v)
            return t_best, best_row, best_u, best_v

        do_leaf = is_leaf & any_live
        t_best, best_row, best_u, best_v = jax.lax.cond(
            do_leaf, leaf_fn, lambda carry: carry,
            (t_best, best_row, best_u, best_v),
        )
        cap = jnp.max(jnp.minimum(t_best, tmax))
        if any_hit or shadow_from >= 0:
            # resolved = hit found OR empty segment (can never hit): the
            # early exit fires when every lane's outcome is decided
            nhit = jnp.sum(
                ((best_row >= 0) | (tmax <= tmin)).astype(jnp.int32)
            )

        nxt = jnp.where(any_live & ~is_leaf, cur + 1, skip)
        return (nxt, t_best, best_row, best_u, best_v, nhit, cap)

    init = (
        jnp.int32(0),
        tmax,
        jnp.full((1, b), -1, jnp.int32),
        jnp.zeros((1, b), jnp.float32),
        jnp.zeros((1, b), jnp.float32),
        jnp.int32(0),
        jnp.max(tmax),
    )
    _, t_best, best_row, best_u, best_v, _, _ = jax.lax.while_loop(
        cond, body, init
    )

    # ONE packed (4, B) output (rows: t, row-bits, u, v): a single output
    # keeps the consumer side to one fusion — four separate outputs each
    # grew their own epilogue fusion around the custom call
    out_ref[0:1, :] = jnp.where(best_row < 0, jnp.float32(_INF), t_best)
    out_ref[1:2, :] = jax.lax.bitcast_convert_type(best_row, jnp.float32)
    out_ref[2:3, :] = best_u
    out_ref[3:4, :] = best_v


def _kernel_lane(nodes_ref, tris_ref, rays_ref,
                 out_ref, *, num_nodes: int, any_hit: bool, block: int,
                 shadow_from: int = -1):
    """Large-scene variant: triangles lane-major (16, Rp) — the compact
    VMEM layout (a (Rp,16) table pads its 16-wide minor dim to 128 lanes
    in VMEM: 8x waste, OOM beyond ~8k rows). Rays arrive SUBLANE-major
    (B, 8) so the whole kernel runs in (B, *) orientation with zero
    on-core transposes; the Moller-Trumbore broadcast is (B rays, 128
    tris)."""
    b = block
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, PALLAS_LEAF_SIZE), 1)

    rox = rays_ref[:, 0:1]
    roy = rays_ref[:, 1:2]
    roz = rays_ref[:, 2:3]
    rdx = rays_ref[:, 3:4]
    rdy = rays_ref[:, 4:5]
    rdz = rays_ref[:, 5:6]
    tmin = rays_ref[:, 6:7]
    tmax = rays_ref[:, 7:8]

    tiny = 1e-20

    def inv(d):
        return jnp.where(d >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(d), tiny)

    ix, iy, iz = inv(rdx), inv(rdy), inv(rdz)

    is_shadow = pl.program_id(0) >= shadow_from if shadow_from >= 0 else None

    def cond(c):
        cur = c[0]
        if any_hit:
            return (cur < num_nodes) & (c[5] < b)
        if is_shadow is not None:
            return (cur < num_nodes) & (~is_shadow | (c[5] < b))
        return cur < num_nodes

    def body(c):
        cur, t_best, best_row, best_u, best_v, nhit, cap = c

        bminx = nodes_ref[cur, 0]
        bminy = nodes_ref[cur, 1]
        bminz = nodes_ref[cur, 2]
        bmaxx = nodes_ref[cur, 3]
        bmaxy = nodes_ref[cur, 4]
        bmaxz = nodes_ref[cur, 5]
        skip = nodes_ref[cur, 6].astype(jnp.int32)
        leaf_row = nodes_ref[cur, 7].astype(jnp.int32)

        tx0 = (bminx - rox) * ix
        tx1 = (bmaxx - rox) * ix
        ty0 = (bminy - roy) * iy
        ty1 = (bmaxy - roy) * iy
        tz0 = (bminz - roz) * iz
        tz1 = (bmaxz - roz) * iz
        tenter = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), tmin),
        )
        texit = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), jnp.minimum(tmax, cap)),
        )
        any_live = jnp.any(tenter <= texit)
        is_leaf = leaf_row >= 0

        def leaf_fn(carry):
            t_best, best_row, best_u, best_v = carry
            col = pl.multiple_of(jnp.maximum(leaf_row, 0), PALLAS_LEAF_SIZE)
            tile = tris_ref[:, pl.ds(col, PALLAS_LEAF_SIZE)]  # (16, 128)
            v0x = tile[0:1, :]
            v0y = tile[1:2, :]
            v0z = tile[2:3, :]
            e1x = tile[3:4, :]
            e1y = tile[4:5, :]
            e1z = tile[5:6, :]
            e2x = tile[6:7, :]
            e2y = tile[7:8, :]
            e2z = tile[8:9, :]
            # (B,1) x (1,128) -> (B rays, 128 tris)
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
                jnp.where(is_best, lane_iota, PALLAS_LEAF_SIZE),
                axis=1,
                keepdims=True,
            )
            pick = lane_iota == lane_of_best
            u_pick = jnp.sum(jnp.where(pick, uu, 0.0), axis=1, keepdims=True)
            v_pick = jnp.sum(jnp.where(pick, vv, 0.0), axis=1, keepdims=True)
            t_best = jnp.where(improved, tmin_row, t_best)
            best_row = jnp.where(
                improved, leaf_row + lane_of_best.astype(jnp.int32), best_row
            )
            best_u = jnp.where(improved, u_pick, best_u)
            best_v = jnp.where(improved, v_pick, best_v)
            return t_best, best_row, best_u, best_v

        do_leaf = is_leaf & any_live
        t_best, best_row, best_u, best_v = jax.lax.cond(
            do_leaf, leaf_fn, lambda carry: carry,
            (t_best, best_row, best_u, best_v),
        )
        cap = jnp.max(jnp.minimum(t_best, tmax))
        if any_hit or shadow_from >= 0:
            # resolved = hit found OR empty segment (can never hit): the
            # early exit fires when every lane's outcome is decided
            nhit = jnp.sum(
                ((best_row >= 0) | (tmax <= tmin)).astype(jnp.int32)
            )

        nxt = jnp.where(any_live & ~is_leaf, cur + 1, skip)
        return (nxt, t_best, best_row, best_u, best_v, nhit, cap)

    init = (
        jnp.int32(0),
        tmax,
        jnp.full((b, 1), -1, jnp.int32),
        jnp.zeros((b, 1), jnp.float32),
        jnp.zeros((b, 1), jnp.float32),
        jnp.int32(0),
        jnp.max(tmax),
    )
    _, t_best, best_row, best_u, best_v, _, _ = jax.lax.while_loop(
        cond, body, init
    )

    out_ref[:, 0:1] = jnp.where(best_row < 0, jnp.float32(_INF), t_best)
    out_ref[:, 1:2] = jax.lax.bitcast_convert_type(best_row, jnp.float32)
    out_ref[:, 2:3] = best_u
    out_ref[:, 3:4] = best_v


@functools.partial(
    jax.jit, static_argnames=("num_nodes", "block", "any_hit", "shadow_from")
)
def _traverse_pallas(nodes, tris_s, rays,
                     num_nodes: int, block: int, any_hit: bool,
                     shadow_from: int = -1):
    wide = tris_s.shape[1] == 16  # (Rp,16) small-scene vs (16,Rp) compact
    if wide:
        n = rays.shape[1]  # (8, Np) lane-major rows
        grid = (n // block,)
        kernel = functools.partial(
            _kernel, num_nodes=num_nodes, any_hit=any_hit, block=block,
            shadow_from=shadow_from,
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
            in_specs=[
                pl.BlockSpec(nodes.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(tris_s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (4, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        )(nodes, tris_s, rays)
    n = rays.shape[0]  # (Np, 8) sublane-major
    grid = (n // block,)
    kernel = functools.partial(
        _kernel_lane, num_nodes=num_nodes, any_hit=any_hit, block=block,
        shadow_from=shadow_from,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        in_specs=[
            pl.BlockSpec(nodes.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(tris_s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(nodes, tris_s, rays)


def _prep_rays(ro, rd, t_min, t_max, block, comps=None, wide=True):
    n = (comps[0] if comps is not None else ro).shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    pad = (-n) % block

    def padv(x, fill):
        if pad == 0:
            return x
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])

    if comps is not None:
        # SoA fast path: 1-D ray components stack into rows directly —
        # slicing an (N,3) here makes XLA materialize a column-major
        # relayout copy (~1.4ms per 262K rays per call)
        rox, roy, roz, rdx, rdy, rdz = comps
        cols = [
            padv(rox, 0.0), padv(roy, 0.0), padv(roz, 0.0),
            padv(rdx, 1.0), padv(rdy, 0.0), padv(rdz, 0.0),
            padv(t_min, 0.0), padv(t_max, 0.0),
        ]
    else:
        cols = [
            padv(ro[:, 0], 0.0), padv(ro[:, 1], 0.0), padv(ro[:, 2], 0.0),
            padv(rd[:, 0], 1.0), padv(rd[:, 1], 0.0), padv(rd[:, 2], 0.0),
            padv(t_min, 0.0), padv(t_max, 0.0),
        ]
    # single packed operand: one producer fusion materializes all ray data
    # (separate operands each re-ran their producer chain). Lane-major
    # (8,N) rows for the wide kernel; sublane-major (N,8) for the compact
    # large-scene kernel.
    axis = 0 if wide else 1
    return jnp.stack(cols, axis=axis), n


def closest_hit_pallas(
    bb: PallasBVHBuffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, map_tri: bool = True,
    compact: bool = False,
):
    """map_tri=False returns the BVH ROW as the primitive id — for callers
    whose attribute tables are row-ordered. The row->tri mapping gather
    stages its index vector through scalar memory (~2ms per 262K rays), so
    the hot integrator path keeps everything in row space instead."""
    from realtimepathtracingresearchframework_tpu.ops.traverse import Hit
    from realtimepathtracingresearchframework_tpu.ops import traverse_pallas2
    from realtimepathtracingresearchframework_tpu.ops import traverse_pallas3

    if isinstance(bb, traverse_pallas3.PallasBVH3Buffers):
        bb = bb.bb  # v2-compatible core; v3 routing is explicit (kernel_v3)
    if isinstance(bb, traverse_pallas2.PallasBVH2Buffers):
        return traverse_pallas2.closest_hit_pallas2(
            bb, ro, rd, t_min=t_min, t_max=t_max, block=block, comps=comps,
            map_tri=map_tri, compact=compact,
        )
    wide = bb.tris_s.shape[1] == 16
    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=wide)
    out = _traverse_pallas(
        bb.nodes, bb.tris_s, rays,
        num_nodes=bb.num_nodes, block=block, any_hit=False,
    )
    if wide:
        t, rowbits, u, v = out[0, :n], out[1, :n], out[2, :n], out[3, :n]
    else:
        t, rowbits, u, v = out[:n, 0], out[:n, 1], out[:n, 2], out[:n, 3]
    row = jax.lax.bitcast_convert_type(rowbits, jnp.int32)
    if map_tri:
        miss = row < 0
        tri = jnp.where(miss, -1, bb.row_tri[jnp.maximum(row, 0)])
    else:
        tri = row
    return Hit(t=t, tri=tri, u=u, v=v)


def closest_and_occluded_pallas(
    bb: PallasBVHBuffers,
    comps_c, t_min_c, t_max_c,
    comps_s, t_min_s, t_max_s,
    block: int = DEFAULT_BLOCK, map_tri: bool = True,
    compact: bool = False,
):
    """ONE launch for the wavefront's two per-bounce ray queues: the
    extension (next-bounce closest-hit) rays and the NEE occlusion rays,
    laid out as block-aligned halves of a single operand. Occlusion
    blocks take the any-hit early exit via the per-block ``shadow_from``
    predicate; closest blocks run to completion. Saves one kernel launch
    + one producer/epilogue fusion pair per bounce versus separate
    dispatches (~1-2 ms/bounce on the axon relay).

    Returns (Hit for the closest half, blocked bool for the occlusion
    half)."""
    from realtimepathtracingresearchframework_tpu.ops.traverse import Hit
    from realtimepathtracingresearchframework_tpu.ops import traverse_pallas2
    from realtimepathtracingresearchframework_tpu.ops import traverse_pallas3

    if isinstance(bb, traverse_pallas3.PallasBVH3Buffers):
        bb = bb.bb  # see closest_hit_pallas
    if isinstance(bb, traverse_pallas2.PallasBVH2Buffers):
        return traverse_pallas2.closest_and_occluded_pallas2(
            bb, comps_c, t_min_c, t_max_c, comps_s, t_min_s, t_max_s,
            block=block, map_tri=map_tri, compact=compact,
        )
    wide = bb.tris_s.shape[1] == 16
    rays_c, n = _prep_rays(None, None, t_min_c, t_max_c, block,
                           comps=comps_c, wide=wide)
    rays_s, n2 = _prep_rays(None, None, t_min_s, t_max_s, block,
                            comps=comps_s, wide=wide)
    axis = 1 if wide else 0
    rays = jnp.concatenate([rays_c, rays_s], axis=axis)
    shadow_from = rays_c.shape[axis] // block
    out = _traverse_pallas(
        bb.nodes, bb.tris_s, rays,
        num_nodes=bb.num_nodes, block=block, any_hit=False,
        shadow_from=shadow_from,
    )
    np_c = rays_c.shape[axis]
    if wide:
        t, rowbits = out[0, :n], out[1, :n]
        u, v = out[2, :n], out[3, :n]
        srowbits = out[1, np_c:np_c + n2]
    else:
        t, rowbits = out[:n, 0], out[:n, 1]
        u, v = out[:n, 2], out[:n, 3]
        srowbits = out[np_c:np_c + n2, 1]
    row = jax.lax.bitcast_convert_type(rowbits, jnp.int32)
    if map_tri:
        tri = jnp.where(row < 0, -1, bb.row_tri[jnp.maximum(row, 0)])
    else:
        tri = row
    blocked = jax.lax.bitcast_convert_type(srowbits, jnp.int32) >= 0
    return Hit(t=t, tri=tri, u=u, v=v), blocked


def occluded_pallas(
    bb: PallasBVHBuffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, compact: bool = False,
):
    from realtimepathtracingresearchframework_tpu.ops import traverse_pallas2
    from realtimepathtracingresearchframework_tpu.ops import traverse_pallas3

    if isinstance(bb, traverse_pallas3.PallasBVH3Buffers):
        bb = bb.bb  # v2-compatible core; v3 routing is explicit
        # (integrator occluded_alpha routes shadows to occluded_pallas3
        # unsorted — 40.3 ms vs 77.9/149.1 v2 on village sun rays)
    if isinstance(bb, traverse_pallas2.PallasBVH2Buffers):
        return traverse_pallas2.occluded_pallas2(
            bb, ro, rd, t_min=t_min, t_max=t_max, block=block, comps=comps,
            compact=compact,
        )
    wide = bb.tris_s.shape[1] == 16
    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=wide)
    out = _traverse_pallas(
        bb.nodes, bb.tris_s, rays,
        num_nodes=bb.num_nodes, block=block, any_hit=True,
    )
    rowbits = out[1, :n] if wide else out[:n, 1]
    return jax.lax.bitcast_convert_type(rowbits, jnp.int32) >= 0
