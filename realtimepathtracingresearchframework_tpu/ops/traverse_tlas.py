"""Pallas two-level (TLAS/BLAS) traversal: instanced scenes on the fast
kernel path.

Removes the ``use_two_level -> xla`` traversal cliff: the v2 scalar
packet walk (ops/traverse_pallas2.py) extended with a TLAS outer loop.
The TLAS (threaded preorder over instance AABBs) and ALL object-space
BLAS node tables live in SMEM; triangle tiles live in VMEM. At an
instance leaf the kernel takes the per-block packet bounds AND the
per-lane ray components into object space with the instance's inverse
affine — WITHOUT renormalizing the direction, so the world-t
parametrization is preserved exactly (the same trick as the XLA
two-level walk, ops/tlas.py: p_o = M·o_w + t·(A⁻¹ d_w)) and hit
distances from different instances compare directly.

Reference semantics: TriangleMesh BLAS + TopLevelBVH instance traversal
(vulkan/vulkanrt_utils.h:55-187), per-frame TLAS-only updates
(default_update_tlas, render_vulkan.cpp:1219-1366). The vkr transform
encoding is signed-uniform scale (vkr.h:15), so |A⁻¹ d| = 1/s and the
packet walk's origin-box expansion test scales its distances by s.

Capacity: everything scalar-side must fit SMEM — TLAS nodes (~2 per
instance), v2-packed BLAS nodes (~2 per 128-tri leaf over UNIQUE mesh
triangles), and the (I, 16) instance table. The renderer gates on those
budgets and falls back to the XLA walk beyond them.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from realtimepathtracingresearchframework_tpu.ops.bvh import (
    build_threaded_bvh,
)
from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
    LEAF,
    LIST_CAP,
    _mt_leaf,
    _mt_leaf_any,
    block_bounds_with_dir,
    interval_node_test_entry,
)

try:  # pallas requires the TPU backend; keep CPU test runs importable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

DEFAULT_BLOCK = 512
_INF = 2.0e32
_BIG = 1.0e30

# renderer gating budgets (SMEM window like the flat v2 kernel's)
MAX_TOTAL_NODES = 1800  # tlas + blas v2 nodes
MAX_INSTANCES = 512

# toggled by tests to run the kernel on the CPU interpreter
INTERPRET = False


class TlasPallasBuffers(NamedTuple):
    tlas_nodes: jnp.ndarray  # (Mt, 8) f32: min3, max3, skip, inst|-1 (values)
    blas_nodes: jnp.ndarray  # (Mb, 8) f32: v2 layout, links BLAS-LOCAL
    inst_table: jnp.ndarray  # (I, 16) f32: Ainv 9, tinv 3, scale,
    # node_start, node_count, tile_base (exact ints as values)
    tri_tiles: jnp.ndarray  # (Lt*16, 128) f32 object-space leaf tiles
    row_tri: jnp.ndarray  # (Lt*128,) i32 global v2 row -> mesh-local tri
    inst_tri_base: jnp.ndarray  # (I,) i32 global shading-row base
    inst_mesh: jnp.ndarray  # (I,) i32 (diagnostics)

    @property
    def num_tlas_nodes(self) -> int:
        return self.tlas_nodes.shape[0]


class BlasPallasStatic(NamedTuple):
    """Per-mesh v2 BLAS arrays — built once per scene; animation frames
    repack only the TLAS + instance table around them. The big arrays
    are DEVICE arrays (uploaded once here) so per-frame repacks don't
    re-transfer the whole unique-mesh triangle set host-to-device."""

    blas_nodes: jnp.ndarray  # (Mb, 8) f32, device
    tri_tiles: jnp.ndarray  # (Lt*16, 128) f32, device
    row_tri: jnp.ndarray  # (Lt*128,) i32, device
    node_start: np.ndarray  # (num_meshes,) i32, host
    node_count: np.ndarray
    tile_base: np.ndarray


def pack_blas_pallas(mesh_tris) -> BlasPallasStatic:
    """Per-mesh v2 BLAS builds (128-tri leaves, shared tile space)."""
    nodes_l, tiles_l, row_tri_l = [], [], []
    node_start, node_count, tile_base = [], [], []
    n_off = t_off = 0
    for v0, e1, e2 in mesh_tris:
        tb = build_threaded_bvh(v0, e1, e2, leaf_size=LEAF)
        nd = tb.nodes[:, 0:8].astype(np.float32).copy()
        skip = tb.nodes[:, 6].view(np.int32)
        leaf_row = tb.nodes[:, 7].view(np.int32)
        nd[:, 6] = skip.astype(np.float32)  # BLAS-local links as values
        nd[:, 7] = np.where(leaf_row >= 0, leaf_row // LEAF, -1).astype(
            np.float32
        )
        nodes_l.append(nd)
        rows = tb.tri_rows
        nl = rows.shape[0] // LEAF
        tiles = np.zeros((nl, 16, LEAF), np.float32)
        tiles[:, 0:9, :] = rows[:, 0:9].reshape(nl, LEAF, 9).transpose(0, 2, 1)
        tiles_l.append(tiles.reshape(nl * 16, LEAF))
        row_tri_l.append(tb.row_tri.astype(np.int32))
        node_start.append(n_off)
        node_count.append(nd.shape[0])
        tile_base.append(t_off)
        n_off += nd.shape[0]
        t_off += nl
    return BlasPallasStatic(
        blas_nodes=jnp.asarray(np.concatenate(nodes_l)),
        tri_tiles=jnp.asarray(np.concatenate(tiles_l)),
        row_tri=jnp.asarray(np.concatenate(row_tri_l)),
        node_start=np.asarray(node_start, np.int32),
        node_count=np.asarray(node_count, np.int32),
        tile_base=np.asarray(tile_base, np.int32),
    )


def pack_two_level_pallas(blas_static: BlasPallasStatic, mesh_ids, tri_base,
                          tlas_nodes, tlas_row_inst,
                          inst_tables) -> TlasPallasBuffers:
    """Kernel layout: the static per-mesh BLAS arrays + this frame's
    TLAS/instance tables (tlas.build_tlas_nodes /
    tlas.build_instance_tables outputs)."""
    node_start = blas_static.node_start
    node_count = blas_static.node_count
    tile_base = blas_static.tile_base
    mesh_ids = np.asarray(mesh_ids, np.int64)
    # --- TLAS: col6/7 bitcast links -> float values; col7 -> instance id
    tn = np.asarray(tlas_nodes[:, 0:8], np.float32).copy()
    skip = np.asarray(tlas_nodes[:, 6]).view(np.int32)
    leaf_row = np.asarray(tlas_nodes[:, 7]).view(np.int32)
    row_inst = np.asarray(tlas_row_inst, np.int32)
    tn[:, 6] = skip.astype(np.float32)
    tn[:, 7] = np.where(
        leaf_row >= 0, row_inst[np.maximum(leaf_row, 0)], -1
    ).astype(np.float32)

    # --- instance table (exact small ints as f32 values)
    inv12 = np.asarray(inst_tables["inst_inv"], np.float32)  # (I,12)
    # conservative culling scale (sigma_min of the instance linear part,
    # NOT cbrt|det|): the kernel's expansion test multiplies object-space
    # axis distances by this, and an over-estimate would cull reachable
    # BLAS nodes on anisotropic instances
    scale = np.asarray(inst_tables["inst_cull_scale"], np.float32)  # (I,)
    i_count = inv12.shape[0]
    it = np.zeros((i_count, 16), np.float32)
    it[:, 0:12] = inv12
    it[:, 12] = scale
    it[:, 13] = np.asarray(node_start, np.float32)[mesh_ids]
    it[:, 14] = np.asarray(node_count, np.float32)[mesh_ids]
    it[:, 15] = np.asarray(tile_base, np.float32)[mesh_ids]

    return TlasPallasBuffers(
        tlas_nodes=jnp.asarray(tn),
        blas_nodes=jnp.asarray(blas_static.blas_nodes),
        inst_table=jnp.asarray(it),
        tri_tiles=jnp.asarray(blas_static.tri_tiles),
        row_tri=jnp.asarray(blas_static.row_tri),
        inst_tri_base=jnp.asarray(np.asarray(tri_base, np.int32)[mesh_ids]),
        inst_mesh=jnp.asarray(mesh_ids.astype(np.int32)),
    )


def _interval_node_test(bmn3, bmx3, olo, ohi, ilo, ihi, tlo, thi, cap,
                        dist_scale):
    """Conservative packet-vs-AABB: Wald interval slab + origin-box
    expansion (see traverse_pallas2._kernel2). ``dist_scale`` converts an
    axis DISTANCE into a minimum t (1 for unit world directions; the
    instance's sigma_min(A) in object space, where |d_obj| <= 1/sigma_min
    holds for ANY affine instance transform, not just uniform scales)."""
    return _interval_node_test_entry(
        bmn3, bmx3, olo, ohi, ilo, ihi, tlo, thi, cap, dist_scale
    )[0]


def _interval_node_test_entry(bmn3, bmx3, olo, ohi, ilo, ihi, tlo, thi, cap,
                              dist_scale):
    """_interval_node_test plus the packet's conservative entry-t lower
    bound L (the ordered-walk's front-to-back sort key) — the shared
    traverse_pallas2 helper with the instance dist_scale applied."""
    return interval_node_test_entry(
        bmn3, bmx3, olo, ohi, ilo, ihi, tlo, thi, cap,
        dist_scale=dist_scale,
    )


def _kernel_tlas(bounds_ref, tnodes_ref, bnodes_ref, inst_ref, tris_ref,
                 rays_ref, out_ref,
                 lst, tb_ref, row_ref, u_ref, v_ref, ib_ref,
                 cid_ref, cl_ref,
                 *, tlas_nodes: int, block: int, shadow: bool,
                 ordered: bool = False):
    b = block
    pid = pl.program_id(0)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LEAF, 1), 0)

    rox = rays_ref[0:1, :]
    roy = rays_ref[1:2, :]
    roz = rays_ref[2:3, :]
    rdx = rays_ref[3:4, :]
    rdy = rays_ref[4:5, :]
    rdz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]

    olo = [bounds_ref[k, pid] for k in range(3)]
    ohi = [bounds_ref[3 + k, pid] for k in range(3)]
    ilo = [bounds_ref[6 + k, pid] for k in range(3)]
    ihi = [bounds_ref[9 + k, pid] for k in range(3)]
    tlo = bounds_ref[12, pid]
    thi = bounds_ref[13, pid]
    dlo = [bounds_ref[14 + k, pid] for k in range(3)]
    dhi = [bounds_ref[17 + k, pid] for k in range(3)]

    tb_ref[:, :] = tmax
    row_ref[:, :] = jnp.full((1, b), -1, jnp.int32)
    u_ref[:, :] = jnp.zeros((1, b), jnp.float32)
    v_ref[:, :] = jnp.zeros((1, b), jnp.float32)
    ib_ref[:, :] = jnp.full((1, b), -1, jnp.int32)

    def visit_instance(iid, cap, nhit):
        """Object-space inner walk of one instance's BLAS."""
        a = [inst_ref[iid, k] for k in range(9)]
        ti = [inst_ref[iid, 9 + k] for k in range(3)]
        s = inst_ref[iid, 12]  # |uniform scale| of world_from_object
        nstart = inst_ref[iid, 13].astype(jnp.int32)
        ncount = inst_ref[iid, 14].astype(jnp.int32)
        tile_base = inst_ref[iid, 15].astype(jnp.int32)

        # per-lane object ray (world-t preserved: direction NOT renormed)
        ox = a[0] * rox + a[1] * roy + a[2] * roz + ti[0]
        oy = a[3] * rox + a[4] * roy + a[5] * roz + ti[1]
        oz = a[6] * rox + a[7] * roy + a[8] * roz + ti[2]
        dx = a[0] * rdx + a[1] * rdy + a[2] * rdz
        dy = a[3] * rdx + a[4] * rdy + a[5] * rdz
        dz = a[6] * rdx + a[7] * rdy + a[8] * rdz

        # object packet bounds (scalar interval arithmetic): affine image
        # of the world origin box / linear image of the direction box
        oolo, oohi, odlo, odhi = [], [], [], []
        for k in range(3):
            r0, r1, r2 = a[3 * k + 0], a[3 * k + 1], a[3 * k + 2]
            lo = (
                jnp.minimum(r0 * olo[0], r0 * ohi[0])
                + jnp.minimum(r1 * olo[1], r1 * ohi[1])
                + jnp.minimum(r2 * olo[2], r2 * ohi[2])
                + ti[k]
            )
            hi = (
                jnp.maximum(r0 * olo[0], r0 * ohi[0])
                + jnp.maximum(r1 * olo[1], r1 * ohi[1])
                + jnp.maximum(r2 * olo[2], r2 * ohi[2])
                + ti[k]
            )
            oolo.append(lo)
            oohi.append(hi)
            dl = (
                jnp.minimum(r0 * dlo[0], r0 * dhi[0])
                + jnp.minimum(r1 * dlo[1], r1 * dhi[1])
                + jnp.minimum(r2 * dlo[2], r2 * dhi[2])
            )
            dh = (
                jnp.maximum(r0 * dlo[0], r0 * dhi[0])
                + jnp.maximum(r1 * dlo[1], r1 * dhi[1])
                + jnp.maximum(r2 * dlo[2], r2 * dhi[2])
            )
            odlo.append(dl)
            odhi.append(dh)
        # inverse-direction interval; sign-mixed axes degrade to +-BIG
        # (no slab cull on that axis — the expansion test still culls)
        oilo, oihi = [], []
        for k in range(3):
            pos = odlo[k] > 0.0
            neg = odhi[k] < 0.0
            l_ok = jnp.where(pos | neg, 1.0 / odhi[k], -_BIG)
            h_ok = jnp.where(pos | neg, 1.0 / odlo[k], _BIG)
            oilo.append(l_ok)
            oihi.append(h_ok)

        def flush(count, cap, nhit, old_t):
            if shadow:
                def lf(j, _):
                    leaf_id = lst[j]
                    tile = tris_ref[pl.ds(leaf_id * 16, 16), :]
                    hit_any = _mt_leaf_any(
                        tile, ox, oy, oz, dx, dy, dz, tmin,
                        jnp.minimum(tb_ref[:, :], tmax),
                    )
                    row_ref[:, :] = jnp.where(
                        hit_any, leaf_id * LEAF, row_ref[:, :]
                    )
                    ib_ref[:, :] = jnp.where(hit_any, iid, ib_ref[:, :])
                    return 0

                jax.lax.fori_loop(0, count, lf, 0, unroll=False)
                nhit = jnp.sum(
                    ((row_ref[:, :] >= 0) | (tmax <= tmin)).astype(jnp.int32)
                )
            else:
                def lf(j, _):
                    leaf_id = lst[j]
                    tile = tris_ref[pl.ds(leaf_id * 16, 16), :]
                    t_best, best_row, best_u, best_v = _mt_leaf(
                        tile, ox, oy, oz, dx, dy, dz, tmin, tmax, sub_iota,
                        leaf_id, tb_ref[:, :], row_ref[:, :],
                        u_ref[:, :], v_ref[:, :],
                    )
                    tb_ref[:, :] = t_best
                    row_ref[:, :] = best_row
                    u_ref[:, :] = best_u
                    v_ref[:, :] = best_v
                    return 0

                jax.lax.fori_loop(0, count, lf, 0, unroll=False)
                # winner instance: lanes whose best t improved this flush
                ib_ref[:, :] = jnp.where(
                    tb_ref[:, :] < old_t, iid, ib_ref[:, :]
                )
                old_t = tb_ref[:, :]
                cap = jnp.max(jnp.minimum(tb_ref[:, :], tmax))
            return jnp.int32(0), cap, nhit, old_t

        def in_cond(c):
            if shadow:
                return (c[0] < ncount) & (c[3] < b)
            return c[0] < ncount

        def in_body(c):
            cur, count, cap, nhit, old_t = c
            rec = cur + nstart
            bmn3 = (bnodes_ref[rec, 0], bnodes_ref[rec, 1], bnodes_ref[rec, 2])
            bmx3 = (bnodes_ref[rec, 3], bnodes_ref[rec, 4], bnodes_ref[rec, 5])
            skip = bnodes_ref[rec, 6].astype(jnp.int32)
            leaf_local = bnodes_ref[rec, 7].astype(jnp.int32)
            live = _interval_node_test(
                bmn3, bmx3, oolo, oohi, oilo, oihi, tlo, thi, cap, s
            )
            is_leaf = leaf_local >= 0
            lst[count] = tile_base + leaf_local
            count = count + (live & is_leaf).astype(jnp.int32)
            nxt = jnp.where(live & ~is_leaf, cur + 1, skip)
            count, cap, nhit, old_t = jax.lax.cond(
                count >= LIST_CAP,
                lambda args: flush(*args),
                lambda args: args,
                (count, cap, nhit, old_t),
            )
            return (nxt, count, cap, nhit, old_t)

        _, count, cap, nhit, old_t = jax.lax.while_loop(
            in_cond, in_body,
            (jnp.int32(0), jnp.int32(0), cap, nhit, tb_ref[:, :]),
        )
        _, cap, nhit, _ = flush(count, cap, nhit, old_t)
        return cap, nhit

    if ordered and not shadow:
        # front-to-back instance entry (see traverse_stream._kernel_streamed
        # ordered mode): collect live instance leaves with the packet's
        # conservative entry-t, visit nearest-first, let the shrinking
        # cap cull far instances — fewer BLAS walks and leaf flushes,
        # same per-ray results up to exact-t ties.
        def cbody(c):
            cur, ncand = c
            bmn3 = (tnodes_ref[cur, 0], tnodes_ref[cur, 1],
                    tnodes_ref[cur, 2])
            bmx3 = (tnodes_ref[cur, 3], tnodes_ref[cur, 4],
                    tnodes_ref[cur, 5])
            skip = tnodes_ref[cur, 6].astype(jnp.int32)
            iid = tnodes_ref[cur, 7].astype(jnp.int32)
            live, entry = _interval_node_test_entry(
                bmn3, bmx3, olo, ohi, ilo, ihi, tlo, thi, thi, 1.0
            )
            is_inst = iid >= 0
            # see traverse_stream: provably in-bounds, clamped anyway
            slot = jnp.minimum(ncand, jnp.int32(cid_ref.shape[0] - 1))
            cid_ref[slot] = iid
            cl_ref[slot] = entry
            ncand = ncand + (live & is_inst).astype(jnp.int32)
            nxt = jnp.where(live & ~is_inst, cur + 1, skip)
            return (nxt, ncand)

        _, ncand = jax.lax.while_loop(
            lambda c: c[0] < tlas_nodes, cbody,
            (jnp.int32(0), jnp.int32(0)),
        )

        def sel_body(c):
            i, cap, nhit = c

            def pick(j, best):
                bj = cl_ref[j]
                take = bj < best[1]
                return (
                    jnp.where(take, j, best[0]),
                    jnp.minimum(bj, best[1]),
                )

            bidx, bl = jax.lax.fori_loop(
                0, ncand, pick, (jnp.int32(0), jnp.float32(_INF))
            )
            cid = cid_ref[bidx]
            cl_ref[bidx] = jnp.float32(_INF)  # consumed
            cap, nhit = jax.lax.cond(
                bl <= cap,
                lambda args: visit_instance(cid, *args),
                lambda args: args,
                (cap, nhit),
            )
            i = jnp.where(bl <= cap, i + 1, ncand)
            return (i, cap, nhit)

        jax.lax.while_loop(
            lambda c: c[0] < ncand, sel_body,
            (jnp.int32(0), thi, jnp.int32(0)),
        )
    else:
        def cond(c):
            if shadow:
                return (c[0] < tlas_nodes) & (c[2] < b)
            return c[0] < tlas_nodes

        def body(c):
            cur, cap, nhit = c
            bmn3 = (tnodes_ref[cur, 0], tnodes_ref[cur, 1],
                    tnodes_ref[cur, 2])
            bmx3 = (tnodes_ref[cur, 3], tnodes_ref[cur, 4],
                    tnodes_ref[cur, 5])
            skip = tnodes_ref[cur, 6].astype(jnp.int32)
            iid = tnodes_ref[cur, 7].astype(jnp.int32)
            live = _interval_node_test(
                bmn3, bmx3, olo, ohi, ilo, ihi, tlo, thi, cap, 1.0
            )
            is_inst = iid >= 0
            cap, nhit = jax.lax.cond(
                live & is_inst,
                lambda args: visit_instance(iid, *args),
                lambda args: args,
                (cap, nhit),
            )
            nxt = jnp.where(live & ~is_inst, cur + 1, skip)
            return (nxt, cap, nhit)

        init = (jnp.int32(0), thi, jnp.int32(0))
        jax.lax.while_loop(cond, body, init)

    out_ref[:, :] = jnp.concatenate(
        [
            jnp.where(row_ref[:, :] < 0, jnp.float32(_INF), tb_ref[:, :]),
            jax.lax.bitcast_convert_type(row_ref[:, :], jnp.float32),
            u_ref[:, :],
            v_ref[:, :],
            jax.lax.bitcast_convert_type(ib_ref[:, :], jnp.float32),
            jnp.zeros((1, b), jnp.float32),
        ],
        axis=0,
    )


@functools.partial(
    jax.jit,
    static_argnames=("tlas_nodes", "block", "shadow", "interpret", "ordered"),
)
def _traverse_tlas(tlas_nodes_arr, blas_nodes, inst_table, tri_tiles, rays,
                   tlas_nodes: int, block: int, shadow: bool = False,
                   interpret: bool = False, ordered: bool = False):
    n = rays.shape[1]
    rays = jax.lax.optimization_barrier(rays)
    bounds = block_bounds_with_dir(rays, block)
    grid = (n // block,)
    n_inst = inst_table.shape[0]
    kernel = functools.partial(
        _kernel_tlas, tlas_nodes=tlas_nodes, block=block, shadow=shadow,
        ordered=ordered,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (24, n // block), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                tlas_nodes_arr.shape, lambda i: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                blas_nodes.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                inst_table.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                tri_tiles.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (6, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((LIST_CAP,), jnp.int32),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.int32),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.int32),
            # ordered-walk candidate list (instance id, packet entry-t)
            pltpu.SMEM((max(n_inst, 1),), jnp.int32),
            pltpu.SMEM((max(n_inst, 1),), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((6, n), jnp.float32),
        interpret=interpret,
    )(bounds, tlas_nodes_arr, blas_nodes, inst_table, tri_tiles, rays)


def closest_hit_tlas_pallas(
    bb: TlasPallasBuffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, ordered: bool = False,
):
    """Batched two-level closest hit through the Pallas kernel. Returns a
    tlas.TwoLevelHit with global shading rows (inst_tri_base + local)."""
    from realtimepathtracingresearchframework_tpu.ops.tlas import TwoLevelHit
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    out = _traverse_tlas(
        bb.tlas_nodes, bb.blas_nodes, bb.inst_table, bb.tri_tiles, rays,
        tlas_nodes=bb.num_tlas_nodes, block=block, interpret=INTERPRET,
        ordered=ordered,
    )
    t = out[0, :n]
    row = jax.lax.bitcast_convert_type(out[1, :n], jnp.int32)
    u, v = out[2, :n], out[3, :n]
    inst = jax.lax.bitcast_convert_type(out[4, :n], jnp.int32)
    miss = row < 0
    local = bb.row_tri[jnp.maximum(row, 0)]
    tri = jnp.where(
        miss, -1, bb.inst_tri_base[jnp.maximum(inst, 0)] + local
    )
    return TwoLevelHit(t=t, tri=tri, u=u, v=v, inst=jnp.where(miss, -1, inst))


def occluded_tlas_pallas(
    bb: TlasPallasBuffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None,
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    out = _traverse_tlas(
        bb.tlas_nodes, bb.blas_nodes, bb.inst_table, bb.tri_tiles, rays,
        tlas_nodes=bb.num_tlas_nodes, block=block, shadow=True,
        interpret=INTERPRET,
    )
    return jax.lax.bitcast_convert_type(out[1, :n], jnp.int32) >= 0
