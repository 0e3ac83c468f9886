"""Streamed two-level (TLAS/BLAS) traversal: UNCAPPED instanced scenes.

The resident two-level kernel (ops/traverse_tlas.py) holds every BLAS
node in SMEM and every leaf tile in VMEM, which caps it at
MAX_TOTAL_NODES=1800 / MAX_INSTANCES=512; past that the renderer used
to fall back to the slow XLA walk. This module removes the cliff by
marrying the two existing designs:

  * from the streamed flat kernel (ops/traverse_stream.py): triangles
    and per-chunk node blocks live in HBM; each visit DMAs one node
    block into SMEM and one leaf-tile block into VMEM, overlapping the
    copy with the node walk;
  * from the resident TLAS kernel (ops/traverse_tlas.py): per-instance
    object-space ray + packet-bound transforms with world-t preserved
    (direction NOT renormalized), so hit distances from different
    instances compare directly.

Layout: each unique mesh is chunked in OBJECT space into subtrees of
<= chunk_tris triangles (spatial median splits, exactly like the flat
streamed pack); tiles and node blocks are stored ONCE per mesh chunk.
An ENTRY is an (instance, chunk) pair: its world AABB is the affine
image of the chunk's object AABB, and the per-frame top tree is a
threaded preorder over entry AABBs. The entry table carries the
instance's inverse affine + the chunk's HBM offsets, so instancing is
free on the geometry side — 1000 instances of one mesh share its
tiles. Per-frame TLAS rebuild/refit (default_update_tlas,
/root/reference/vulkan/render_vulkan.cpp:1219-1366) repacks ONLY the
top tree + entry table (host work linear in entries); the HBM side is
static per scene.

Best rows are globally unique per entry (row = entry * chunk_tris +
local), so one int32 encodes (entry -> instance, chunk -> mesh tri)
and the kernel needs no extra output row for the instance id.

Reference semantics: TriangleMesh BLAS + TopLevelBVH instance
traversal with batched builds and TLAS update queues
(/root/reference/vulkan/vulkanrt_utils.h:55-187,
render_vulkan.cpp:472-545,1219-1366).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

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
from realtimepathtracingresearchframework_tpu.ops.traverse_stream import (
    SUB_EXIT,
    _build_top_tree,
    _split_chunks,
    node_rows_for,
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

# gating budgets: entries (instance x chunk pairs) bounded by the SMEM
# entry table + top tree, NOT by scene size — geometry streams from HBM
MAX_ENTRIES = 2048
MAX_TOP_NODES = 2 * MAX_ENTRIES

# toggled by tests to run the kernel on the CPU interpreter
INTERPRET = False


class TlasStreamStatic(NamedTuple):
    """Per-scene arrays (built once; instancing/animation never touch
    them). HBM blocks are concatenated across all meshes' chunks."""

    sub_nodes: jnp.ndarray  # (C*R, 128) f32 HBM: per-chunk node blocks
    tri_tiles: jnp.ndarray  # (C*L*16, 128) f32 HBM: object-space tiles
    chunk_rowtri: jnp.ndarray  # (C*chunk_tris,) i32: MESH-LOCAL tri
    chunk_mesh: np.ndarray  # (C,) i32 host
    chunk_node_base: np.ndarray  # (C,) i32 host: sub_nodes row offset
    chunk_tile_base: np.ndarray  # (C,) i32 host: tri_tiles row offset
    chunk_obj_min: np.ndarray  # (C, 3) f32 host
    chunk_obj_max: np.ndarray  # (C, 3) f32 host
    mesh_chunk_start: np.ndarray  # (num_meshes+1,) i32 host
    chunk_tris: int

    @property
    def sub_leaves(self) -> int:
        return self.chunk_tris // LEAF

    @property
    def num_chunks(self) -> int:
        return len(self.chunk_mesh)


class TlasStreamFrame(NamedTuple):
    """Per-frame (TLAS-side) arrays: top tree + entry table + the
    entry -> shading maps. Rebuilt by every TLAS rebuild/refit."""

    top_nodes: jnp.ndarray  # (Mt, 8) f32 SMEM: min3, max3, skip, entry|-1
    entry_table: jnp.ndarray  # (E, 16) f32 SMEM: Ainv 9, tinv 3,
    # cull_scale, node_base_row, tile_base_row, spare
    entry_chunk: jnp.ndarray  # (E,) i32 device
    entry_inst: jnp.ndarray  # (E,) i32 device
    entry_tri_base: jnp.ndarray  # (E,) i32 device: global shading base

    @property
    def num_top_nodes(self) -> int:
        return self.top_nodes.shape[0]

    @property
    def num_entries(self) -> int:
        return self.entry_table.shape[0]


def pick_chunk_tris(mesh_sizes) -> int:
    """Chunk granularity for an instanced scene: follow the largest
    mesh (small meshes stay single-chunk without padding waste), floor
    1024 (DMA amortization), cap 8192 (HBM tile padding)."""
    biggest = int(max(mesh_sizes)) if len(mesh_sizes) else 1
    per = -(-biggest // LEAF) * LEAF
    return int(min(max(per, 1024), 8192))


def pack_tlas_stream_static(mesh_tris: List,
                            chunk_tris: int = None) -> TlasStreamStatic:
    """Chunk + build + pack every unique mesh's object-space BLAS into
    streamed HBM blocks (the per-mesh twin of traverse_stream's
    pack_streamed; BLAS batched-build flow render_vulkan.cpp:472-545)."""
    if chunk_tris is None:
        chunk_tris = pick_chunk_tris([len(m[0]) for m in mesh_tris])
    assert chunk_tris % LEAF == 0 and chunk_tris > 0
    sub_leaves = chunk_tris // LEAF
    node_rows = node_rows_for(sub_leaves)
    tile_rows = sub_leaves * 16

    nodes_l, tiles_l, rowtri_l = [], [], []
    chunk_mesh, node_base, tile_base = [], [], []
    obj_min, obj_max = [], []
    mesh_chunk_start = [0]
    for mid, (v0, e1, e2) in enumerate(mesh_tris):
        v0 = np.asarray(v0, np.float32)
        e1 = np.asarray(e1, np.float32)
        e2 = np.asarray(e2, np.float32)
        v1, v2 = v0 + e1, v0 + e2
        tmin = np.minimum(np.minimum(v0, v1), v2)
        tmax = np.maximum(np.maximum(v0, v1), v2)
        centroid = 0.5 * (tmin + tmax)
        for idx in _split_chunks(centroid, chunk_tris):
            cv0, ce1, ce2 = v0[idx], e1[idx], e2[idx]
            tb = build_threaded_bvh(cv0, ce1, ce2, leaf_size=LEAF,
                                    builder="sah")
            if (tb.num_nodes > node_rows * 16
                    or tb.tri_rows.shape[0] // LEAF > sub_leaves):
                tb = build_threaded_bvh(cv0, ce1, ce2, leaf_size=LEAF)
            nn = tb.num_nodes
            assert nn <= node_rows * 16, f"chunk subtree too big: {nn}"
            nd = tb.nodes.copy()
            skip = nd[:, 6].view(np.int32).copy()
            leaf_row = nd[:, 7].view(np.int32).copy()
            skip[skip >= nn] = SUB_EXIT
            is_leaf = leaf_row >= 0
            leaf_row[is_leaf] = leaf_row[is_leaf] // LEAF
            nd[:, 6] = skip.astype(np.float32)
            nd[:, 7] = leaf_row.astype(np.float32)
            nblock = np.zeros((node_rows, 128), np.float32)
            for i in range(nn):
                r, c = divmod(i, 16)
                nblock[r, c * 8:(c + 1) * 8] = nd[i]
            nodes_l.append(nblock)
            rows = tb.tri_rows
            nl = rows.shape[0] // LEAF
            tiles = np.zeros((sub_leaves, 16, 128), np.float32)
            tiles[:nl, 0:9, :] = (
                rows[:, 0:9].reshape(nl, LEAF, 9).transpose(0, 2, 1)
            )
            tiles_l.append(tiles.reshape(tile_rows, 128))
            rt = np.zeros(chunk_tris, np.int32)
            rt[:rows.shape[0]] = idx[tb.row_tri].astype(np.int32)
            rowtri_l.append(rt)
            chunk_mesh.append(mid)
            node_base.append((len(nodes_l) - 1) * node_rows)
            tile_base.append((len(tiles_l) - 1) * tile_rows)
            obj_min.append(tb.world_min)
            obj_max.append(tb.world_max)
        mesh_chunk_start.append(len(chunk_mesh))

    return TlasStreamStatic(
        sub_nodes=jnp.asarray(np.concatenate(nodes_l, axis=0)),
        tri_tiles=jnp.asarray(np.concatenate(tiles_l, axis=0)),
        chunk_rowtri=jnp.asarray(np.concatenate(rowtri_l)),
        chunk_mesh=np.asarray(chunk_mesh, np.int32),
        chunk_node_base=np.asarray(node_base, np.int32),
        chunk_tile_base=np.asarray(tile_base, np.int32),
        chunk_obj_min=np.stack(obj_min).astype(np.float32),
        chunk_obj_max=np.stack(obj_max).astype(np.float32),
        mesh_chunk_start=np.asarray(mesh_chunk_start, np.int32),
        chunk_tris=chunk_tris,
    )


def pack_tlas_stream_frame(static: TlasStreamStatic, mesh_ids, transforms,
                           tri_base) -> TlasStreamFrame:
    """One frame's TLAS side: expand instances into (instance, chunk)
    entries, transform chunk AABBs to world, thread a top tree. All
    vectorized host numpy — the default_update_tlas analogue
    (render_vulkan.cpp:1219-1366); BLAS/HBM arrays untouched."""
    mesh_ids = np.asarray(mesh_ids, np.int64)
    xf = np.asarray(transforms, np.float64)  # (I, 3, 4)
    A = xf[:, :, :3]
    t = xf[:, :, 3]
    Ainv = np.linalg.inv(A)
    tinv = -np.einsum("iab,ib->ia", Ainv, t)
    cull_scale = np.linalg.svd(A, compute_uv=False)[:, -1]

    start = static.mesh_chunk_start
    counts = (start[1:] - start[:-1])[mesh_ids]  # chunks per instance
    entry_inst = np.repeat(np.arange(len(mesh_ids), dtype=np.int32), counts)
    # chunk ids: start[mesh] .. start[mesh]+count, per instance
    offs = np.concatenate([[0], np.cumsum(counts)])
    entry_chunk = (
        np.arange(offs[-1], dtype=np.int64)
        - np.repeat(offs[:-1], counts)
        + np.repeat(start[:-1][mesh_ids], counts)
    ).astype(np.int32)
    E = len(entry_chunk)

    # world AABBs of entries: affine image of the chunk object box
    bmin = static.chunk_obj_min[entry_chunk]
    bmax = static.chunk_obj_max[entry_chunk]
    Ae = A[entry_inst].astype(np.float32)
    te = t[entry_inst].astype(np.float32)
    ctr = 0.5 * (bmin + bmax)
    ext = 0.5 * (bmax - bmin)
    wctr = np.einsum("eab,eb->ea", Ae, ctr) + te
    wext = np.einsum("eab,eb->ea", np.abs(Ae), ext)
    emin = (wctr - wext).astype(np.float32)
    emax = (wctr + wext).astype(np.float32)

    top = _build_top_tree(emin, emax)

    et = np.zeros((E, 16), np.float32)
    et[:, 0:9] = Ainv[entry_inst].reshape(E, 9).astype(np.float32)
    et[:, 9:12] = tinv[entry_inst].astype(np.float32)
    et[:, 12] = cull_scale[entry_inst].astype(np.float32)
    et[:, 13] = static.chunk_node_base[entry_chunk].astype(np.float32)
    et[:, 14] = static.chunk_tile_base[entry_chunk].astype(np.float32)

    tri_base = np.asarray(tri_base, np.int32)
    return TlasStreamFrame(
        top_nodes=jnp.asarray(top),
        entry_table=jnp.asarray(et),
        entry_chunk=jnp.asarray(entry_chunk),
        entry_inst=jnp.asarray(entry_inst),
        entry_tri_base=jnp.asarray(tri_base[mesh_ids][entry_inst]),
    )


def _kernel_tlas_stream(bounds_ref, top_ref, ent_ref, subn_ref, tris_ref,
                        rays_ref, out_ref,
                        lst, nscr, tscr, sem_n, sem_t,
                        tb_ref, row_ref, u_ref, v_ref,
                        *, top_nodes: int, block: int, shadow: bool,
                        node_rows: int, sub_leaves: int):
    """Top walk over entry AABBs (SMEM, world space); each live entry
    visit DMAs its chunk's node block (HBM->SMEM) + tile block
    (HBM->VMEM), transforms the packet + rays into object space with
    world-t preserved, and runs the streamed subtree walk + batched
    Moller-Trumbore flushes."""
    b = block
    pid = pl.program_id(0)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LEAF, 1), 0)
    tile_rows = sub_leaves * 16

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

    def visit_entry(eid, cap, nhit):
        a = [ent_ref[eid, k] for k in range(9)]
        ti = [ent_ref[eid, 9 + k] for k in range(3)]
        s = ent_ref[eid, 12]
        nbase = ent_ref[eid, 13].astype(jnp.int32)
        tbase = ent_ref[eid, 14].astype(jnp.int32)

        tdma = pltpu.make_async_copy(
            tris_ref.at[pl.ds(tbase, tile_rows), :], tscr, sem_t,
        )
        tdma.start()
        ndma = pltpu.make_async_copy(
            subn_ref.at[pl.ds(nbase, node_rows), :], nscr, sem_n,
        )
        ndma.start()

        # per-lane object ray (world-t preserved: direction NOT renormed;
        # same transform as traverse_tlas._kernel_tlas.visit_instance)
        ox = a[0] * rox + a[1] * roy + a[2] * roz + ti[0]
        oy = a[3] * rox + a[4] * roy + a[5] * roz + ti[1]
        oz = a[6] * rox + a[7] * roy + a[8] * roz + ti[2]
        dx = a[0] * rdx + a[1] * rdy + a[2] * rdz
        dy = a[3] * rdx + a[4] * rdy + a[5] * rdz
        dz = a[6] * rdx + a[7] * rdy + a[8] * rdz

        # object packet bounds: scalar interval arithmetic (affine image
        # of the world origin box / linear image of the direction box)
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
        # (no slab cull there — the expansion term still culls)
        oilo, oihi = [], []
        for k in range(3):
            ok = (odlo[k] > 0.0) | (odhi[k] < 0.0)
            oilo.append(jnp.where(ok, 1.0 / odhi[k], -_BIG))
            oihi.append(jnp.where(ok, 1.0 / odlo[k], _BIG))

        ndma.wait()

        def flush(count, cap, nhit, waited):
            @pl.when(~waited)
            def _():
                tdma.wait()

            if shadow:
                def lf(j, _):
                    ll = lst[j]
                    gid = eid * sub_leaves + ll
                    hit_any = _mt_leaf_any(
                        tscr[pl.ds(ll * 16, 16), :],
                        ox, oy, oz, dx, dy, dz, tmin,
                        jnp.minimum(tb_ref[:, :], tmax),
                    )
                    row_ref[:, :] = jnp.where(
                        hit_any, gid * LEAF, row_ref[:, :]
                    )
                    return 0

                jax.lax.fori_loop(0, count, lf, 0, unroll=False)
                nhit = jnp.sum(
                    ((row_ref[:, :] >= 0) | (tmax <= tmin)).astype(jnp.int32)
                )
            else:
                def lf(j, _):
                    ll = lst[j]
                    t_best, best_row, best_u, best_v = _mt_leaf(
                        tscr[pl.ds(ll * 16, 16), :],
                        ox, oy, oz, dx, dy, dz, tmin, tmax, sub_iota,
                        eid * sub_leaves + ll,
                        tb_ref[:, :], row_ref[:, :],
                        u_ref[:, :], v_ref[:, :],
                    )
                    tb_ref[:, :] = t_best
                    row_ref[:, :] = best_row
                    u_ref[:, :] = best_u
                    v_ref[:, :] = best_v
                    return 0

                jax.lax.fori_loop(0, count, lf, 0, unroll=False)
                cap = jnp.max(jnp.minimum(tb_ref[:, :], tmax))
            return jnp.int32(0), cap, nhit, jnp.full((), True)

        def in_cond(c):
            if shadow:
                return (c[0] < SUB_EXIT) & (c[3] < b)
            return c[0] < SUB_EXIT

        def in_body(c):
            cur, count, cap, nhit, waited = c
            r = cur // 16
            base = (cur % 16) * 8
            bmn3 = (nscr[r, base + 0], nscr[r, base + 1], nscr[r, base + 2])
            bmx3 = (nscr[r, base + 3], nscr[r, base + 4], nscr[r, base + 5])
            skip = nscr[r, base + 6].astype(jnp.int32)
            leaf_local = nscr[r, base + 7].astype(jnp.int32)
            live, _ = interval_node_test_entry(
                bmn3, bmx3, oolo, oohi, oilo, oihi, tlo, thi, cap,
                dist_scale=s,
            )
            is_leaf = leaf_local >= 0
            lst[count] = leaf_local
            count = count + (live & is_leaf).astype(jnp.int32)
            nxt = jnp.where(live & ~is_leaf, cur + 1, skip)
            count, cap, nhit, waited = jax.lax.cond(
                count >= LIST_CAP,
                lambda args: flush(*args),
                lambda args: args,
                (count, cap, nhit, waited),
            )
            return (nxt, count, cap, nhit, waited)

        _, count, cap, nhit, waited = jax.lax.while_loop(
            in_cond, in_body,
            (jnp.int32(0), jnp.int32(0), cap, nhit, jnp.full((), False)),
        )
        # final flush ALWAYS runs: consumes the tile DMA wait when no
        # in-walk flush happened (semaphore balance), flushes the tail
        _, cap, nhit, _ = flush(count, cap, nhit, waited)
        return cap, nhit

    def cond(c):
        if shadow:
            return (c[0] < top_nodes) & (c[2] < b)
        return c[0] < top_nodes

    def body(c):
        cur, cap, nhit = c
        bmn3 = (top_ref[cur, 0], top_ref[cur, 1], top_ref[cur, 2])
        bmx3 = (top_ref[cur, 3], top_ref[cur, 4], top_ref[cur, 5])
        skip = top_ref[cur, 6].astype(jnp.int32)
        eid = top_ref[cur, 7].astype(jnp.int32)
        live, _ = interval_node_test_entry(
            bmn3, bmx3, olo, ohi, ilo, ihi, tlo, thi, cap,
        )
        is_entry = eid >= 0
        cap, nhit = jax.lax.cond(
            live & is_entry,
            lambda args: visit_entry(eid, *args),
            lambda args: args,
            (cap, nhit),
        )
        nxt = jnp.where(live & ~is_entry, cur + 1, skip)
        return (nxt, cap, nhit)

    jax.lax.while_loop(cond, body, (jnp.int32(0), thi, jnp.int32(0)))

    out_ref[:, :] = jnp.concatenate(
        [
            jnp.where(row_ref[:, :] < 0, jnp.float32(_INF), tb_ref[:, :]),
            jax.lax.bitcast_convert_type(row_ref[:, :], jnp.float32),
            u_ref[:, :],
            v_ref[:, :],
        ],
        axis=0,
    )


@functools.partial(
    jax.jit,
    static_argnames=("top_nodes", "block", "shadow", "interpret",
                     "sub_leaves"),
)
def _traverse_tlas_stream(top_nodes_arr, entry_table, sub_nodes, tri_tiles,
                          rays, top_nodes: int, block: int,
                          shadow: bool = False, interpret: bool = False,
                          sub_leaves: int = 64):
    n = rays.shape[1]
    rays = jax.lax.optimization_barrier(rays)
    bounds = block_bounds_with_dir(rays, block)
    grid = (n // block,)
    node_rows = node_rows_for(sub_leaves)
    kernel = functools.partial(
        _kernel_tlas_stream, top_nodes=top_nodes, block=block,
        shadow=shadow, node_rows=node_rows, sub_leaves=sub_leaves,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (24, n // block), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                top_nodes_arr.shape, lambda i: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                entry_table.shape, lambda i: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (8, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (4, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((LIST_CAP,), jnp.int32),
            pltpu.SMEM((node_rows, 128), jnp.float32),
            pltpu.VMEM((sub_leaves * 16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.int32),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        interpret=interpret,
    )(bounds, top_nodes_arr, entry_table, sub_nodes, tri_tiles, rays)


def _sort_operand(fr: TlasStreamFrame, rays):
    """Coherence-sort a packed (8, Np) operand against the frame's
    world bounds (top-tree root AABB) — see traverse_stream."""
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
        _coherence_key2,
    )

    key = _coherence_key2(rays, fr.top_nodes[0, 0:3], fr.top_nodes[0, 3:6])
    perm = jnp.argsort(key, stable=True)
    inv = jnp.argsort(perm)
    return rays[:, perm], inv


def closest_hit_tlas_stream(
    static: TlasStreamStatic, fr: TlasStreamFrame, ro, rd,
    t_min=0.0, t_max=_INF, block: int = DEFAULT_BLOCK, comps=None,
    sort: bool = False,
):
    """Batched two-level closest hit through the streamed kernel.
    Returns a tlas.TwoLevelHit (global shading rows + instance ids)."""
    from realtimepathtracingresearchframework_tpu.ops.tlas import TwoLevelHit
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    if sort:
        rays, inv = _sort_operand(fr, rays)
    out = _traverse_tlas_stream(
        fr.top_nodes, fr.entry_table, static.sub_nodes, static.tri_tiles,
        rays, top_nodes=fr.num_top_nodes, block=block,
        interpret=INTERPRET, sub_leaves=static.sub_leaves,
    )
    if sort:
        out = out[:, inv]
    t = out[0, :n]
    row = jax.lax.bitcast_convert_type(out[1, :n], jnp.int32)
    u, v = out[2, :n], out[3, :n]
    miss = row < 0
    rw = jnp.maximum(row, 0)
    entry = rw // static.chunk_tris
    local = rw % static.chunk_tris
    tri_local = static.chunk_rowtri[
        fr.entry_chunk[entry] * static.chunk_tris + local
    ]
    tri = jnp.where(miss, -1, fr.entry_tri_base[entry] + tri_local)
    inst = jnp.where(miss, -1, fr.entry_inst[entry])
    return TwoLevelHit(t=t, tri=tri, u=u, v=v, inst=inst)


def occluded_tlas_stream(
    static: TlasStreamStatic, fr: TlasStreamFrame, ro, rd,
    t_min=0.0, t_max=_INF, block: int = DEFAULT_BLOCK, comps=None,
    sort: bool = False,
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    if sort:
        rays, inv = _sort_operand(fr, rays)
    out = _traverse_tlas_stream(
        fr.top_nodes, fr.entry_table, static.sub_nodes, static.tri_tiles,
        rays, top_nodes=fr.num_top_nodes, block=block, shadow=True,
        interpret=INTERPRET, sub_leaves=static.sub_leaves,
    )
    if sort:
        out = out[:, inv]
    return jax.lax.bitcast_convert_type(out[1, :n], jnp.int32) >= 0
