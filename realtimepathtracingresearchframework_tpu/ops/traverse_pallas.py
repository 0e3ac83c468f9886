"""Pallas TPU traversal kernel.

The XLA-level traversals (ops/traverse.py) are bound by HBM gather latency:
every dependent BVH step costs ~35us regardless of batch width. This kernel
keeps the hot structures on-core and walks the threaded BVH with a scalar
cursor per ray packet:

- **node table in SMEM** — scalar memory exists exactly for data-dependent
  scalar loads; one node = 8 scalar reads,
- **fat 128-triangle leaves in VMEM**, 128-lane aligned so a leaf is one
  aligned ``(16, 128)`` tile slice; leaf intersection is a dense
  ``(B, 128)`` Moller-Trumbore over all packet rays x leaf triangles
  (dense VPU math is the cheap currency on TPU),
- rays kept in BOTH layouts: lane-major ``(8, B)`` for the per-node AABB
  test (dense across the packet) and sublane-major ``(B, 8)`` for the leaf
  test (rays x triangle-lanes); per-ray ``t_best`` lives sublane-major and
  node culling uses the conservative packet max.

The packet shares one cursor — the reference's 32x16-workgroup lockstep
model (pt_megakernel.glsl:369-388) made explicit. Scenes fit while
``nodes*32B`` fits SMEM and ``tris*64B`` fits VMEM (~200k tris); larger
scenes use the XLA fallback until the streaming two-level kernel lands.
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
_INF = 2.0e32


class PallasBVHBuffers(NamedTuple):
    nodes: jnp.ndarray  # (M, 8) f32 in SMEM: min3, max3, skip, leaf_col
    tris_t: jnp.ndarray  # (16, Rp) f32: rows 0-8 = v0/e1/e2 fields
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
    tris_t = np.zeros((16, rp), np.float32)
    tris_t[0:9, :r] = tb.tri_rows[:, 0:9].T
    row_tri = np.zeros(rp, np.int32)
    row_tri[:r] = tb.row_tri
    assert nodes.shape[0] == m
    return PallasBVHBuffers(
        nodes=jnp.asarray(nodes),
        tris_t=jnp.asarray(tris_t),
        row_tri=jnp.asarray(row_tri),
    )


def _kernel(nodes_ref, tris_ref, rays_ref,
            out_ref, *, num_nodes: int, any_hit: bool,
            block: int):
    # Rays arrive as ONE (8, B) operand (rows = rox..tmax). A single packed
    # operand means XLA materializes the ray data with a single producer
    # fusion: with eight separate operands, XLA re-ran the (expensive,
    # unfusable-into-custom-calls) producer chain once PER OPERAND, which
    # dominated in-context cost (65ms vs 9ms standalone for shadow rays).
    b = block
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, PALLAS_LEAF_SIZE), 1)

    # lane-major (1, B) rows — already the layout the AABB test wants
    rox_l = rays_ref[0:1, :]
    roy_l = rays_ref[1:2, :]
    roz_l = rays_ref[2:3, :]
    rdx_l = rays_ref[3:4, :]
    rdy_l = rays_ref[4:5, :]
    rdz_l = rays_ref[5:6, :]
    tmin_l = rays_ref[6:7, :]
    tmax_l = rays_ref[7:8, :]

    tiny = 1e-20

    def inv(d):
        return jnp.where(d >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(d), tiny)

    ix_l, iy_l, iz_l = inv(rdx_l), inv(rdy_l), inv(rdz_l)

    # sublane-major (B, 1) views (on-core relayout of small blocks)
    rox_s = rox_l.T
    roy_s = roy_l.T
    roz_s = roz_l.T
    rdx_s = rdx_l.T
    rdy_s = rdy_l.T
    rdz_s = rdz_l.T
    tmin_s = tmin_l.T
    tmax_s = tmax_l.T

    def cond(c):
        cur = c[0]
        if any_hit:
            return (cur < num_nodes) & (c[5] < b)
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
        leaf_col = nodes_ref[cur, 7].astype(jnp.int32)

        tx0 = (bminx - rox_l) * ix_l
        tx1 = (bmaxx - rox_l) * ix_l
        ty0 = (bminy - roy_l) * iy_l
        ty1 = (bmaxy - roy_l) * iy_l
        tz0 = (bminz - roz_l) * iz_l
        tz1 = (bmaxz - roz_l) * iz_l
        tenter = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), tmin_l),
        )
        texit = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), jnp.minimum(tmax_l, cap)),
        )
        any_live = jnp.any(tenter <= texit)
        is_leaf = leaf_col >= 0

        def leaf_fn(carry):
            t_best, best_row, best_u, best_v = carry
            col = pl.multiple_of(jnp.maximum(leaf_col, 0), PALLAS_LEAF_SIZE)
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
            # (B,1) x (1,128) -> (B,128)
            px = rdy_s * e2z - rdz_s * e2y
            py = rdz_s * e2x - rdx_s * e2z
            pz = rdx_s * e2y - rdy_s * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvx = rox_s - v0x
            tvy = roy_s - v0y
            tvz = roz_s - v0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vv = (rdx_s * qx + rdy_s * qy + rdz_s * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            hit = (
                (jnp.abs(det) > 1e-12)
                & (uu >= 0.0)
                & (vv >= 0.0)
                & (uu + vv <= 1.0)
                & (tt > tmin_s)
                & (tt < jnp.minimum(t_best, tmax_s))
            )
            tt = jnp.where(hit, tt, _INF)
            tmin_row = jnp.min(tt, axis=1, keepdims=True)  # (B,1)
            improved = tmin_row < t_best
            is_best = (tt <= tmin_row) & hit
            # first best lane per ray
            lane_of_best = jnp.min(
                jnp.where(is_best, lane_iota, PALLAS_LEAF_SIZE), axis=1, keepdims=True
            )
            pick = lane_iota == lane_of_best
            u_pick = jnp.sum(jnp.where(pick, uu, 0.0), axis=1, keepdims=True)
            v_pick = jnp.sum(jnp.where(pick, vv, 0.0), axis=1, keepdims=True)
            t_best = jnp.where(improved, tmin_row, t_best)
            best_row = jnp.where(
                improved, leaf_col + lane_of_best.astype(jnp.int32), best_row
            )
            best_u = jnp.where(improved, u_pick, best_u)
            best_v = jnp.where(improved, v_pick, best_v)
            return t_best, best_row, best_u, best_v

        do_leaf = is_leaf & any_live
        t_best, best_row, best_u, best_v = jax.lax.cond(
            do_leaf, leaf_fn, lambda carry: carry,
            (t_best, best_row, best_u, best_v),
        )
        cap = jnp.max(jnp.minimum(t_best, tmax_s))
        if any_hit:
            nhit = jnp.sum((best_row >= 0).astype(jnp.int32))

        nxt = jnp.where(any_live & ~is_leaf, cur + 1, skip)
        return (nxt, t_best, best_row, best_u, best_v, nhit, cap)

    init = (
        jnp.int32(0),
        tmax_s,
        jnp.full((b, 1), -1, jnp.int32),
        jnp.zeros((b, 1), jnp.float32),
        jnp.zeros((b, 1), jnp.float32),
        jnp.int32(0),
        jnp.max(tmax_s),
    )
    _, t_best, best_row, best_u, best_v, _, _ = jax.lax.while_loop(
        cond, body, init
    )

    # ONE packed (4, B) output (rows: t, row-bits, u, v): a single output
    # keeps the consumer side to one fusion — four separate outputs each
    # grew their own epilogue fusion around the custom call
    out_ref[0:1, :] = jnp.where(best_row < 0, jnp.float32(_INF), t_best).T
    out_ref[1:2, :] = jax.lax.bitcast_convert_type(best_row, jnp.float32).T
    out_ref[2:3, :] = best_u.T
    out_ref[3:4, :] = best_v.T


@functools.partial(jax.jit, static_argnames=("num_nodes", "block", "any_hit"))
def _traverse_pallas(nodes, tris_t, rays,
                     num_nodes: int, block: int, any_hit: bool):
    n = rays.shape[1]  # rays is a single (8, Np) packed operand
    grid = (n // block,)
    kernel = functools.partial(
        _kernel, num_nodes=num_nodes, any_hit=any_hit, block=block
    )
    out_shape = jax.ShapeDtypeStruct((4, n), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(nodes.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(tris_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, block), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(nodes, tris_t, rays)


def _prep_rays(ro, rd, t_min, t_max, block):
    n = ro.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    pad = (-n) % block

    def padv(x, fill):
        if pad == 0:
            return x
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])

    comps = [
        padv(ro[:, 0], 0.0), padv(ro[:, 1], 0.0), padv(ro[:, 2], 0.0),
        padv(rd[:, 0], 1.0), padv(rd[:, 1], 0.0), padv(rd[:, 2], 0.0),
        padv(t_min, 0.0), padv(t_max, 0.0),
    ]
    # single packed (8, Np) operand: one producer fusion materializes all
    # ray data (separate operands each re-ran their producer chain)
    return jnp.stack(comps, axis=0), n


def closest_hit_pallas(
    bb: PallasBVHBuffers, ro, rd, t_min=0.0, t_max=_INF, block: int = DEFAULT_BLOCK
):
    from realtimepathtracingresearchframework_tpu.ops.traverse import Hit

    rays, n = _prep_rays(ro, rd, t_min, t_max, block)
    out = _traverse_pallas(
        bb.nodes, bb.tris_t, rays,
        num_nodes=bb.num_nodes, block=block, any_hit=False,
    )
    t = out[0, :n]
    row = jax.lax.bitcast_convert_type(out[1, :n], jnp.int32)
    miss = row < 0
    tri = jnp.where(miss, -1, bb.row_tri[jnp.maximum(row, 0)])
    return Hit(t=t, tri=tri, u=out[2, :n], v=out[3, :n])


def occluded_pallas(
    bb: PallasBVHBuffers, ro, rd, t_min=0.0, t_max=_INF, block: int = DEFAULT_BLOCK
):
    rays, n = _prep_rays(ro, rd, t_min, t_max, block)
    out = _traverse_pallas(
        bb.nodes, bb.tris_t, rays,
        num_nodes=bb.num_nodes, block=block, any_hit=True,
    )
    return jax.lax.bitcast_convert_type(out[1, :n], jnp.int32) >= 0
