"""Streaming Pallas traversal: BVH in HBM, DMA'd on demand.

The resident kernel (ops/traverse_pallas.py) needs the node table in SMEM
(~48 KB -> ~1.5k nodes) and the triangle rows in VMEM (~16 MB), capping
scenes near 200k triangles. This kernel removes both caps with a
two-level layout streamed from HBM — the TPU expression of the
reference's batched multi-million-triangle BLAS handling
(render_vulkan.cpp:472-545):

- triangles are Morton-sorted and chunked into SUBTREES of <= 8192
  (64 leaves x 128 tris; <= 127 threaded nodes each),
- the TOP tree over subtree AABBs stays SMEM-resident (one node per
  subtree leaf — 5M tris => ~610 subtrees => ~1.2k top nodes, fits),
- each subtree's nodes live in HBM packed 16-nodes-per-128-lane-row
  ((S*8, 128) f32); entering a subtree DMAs its 4 KB node block into
  SMEM scratch (scalar cursor walk, like the resident kernel) and its
  WHOLE 512 KB leaf-tile block into VMEM scratch in one copy — one
  latency hit per subtree instead of one per leaf visit (measured 5-10x
  on coherent primaries),
- leaf triangle tiles are (16, 128) f32 blocks — row f is field f
  (v0/e1/e2 xyz) of the leaf's 128 triangles; subtree s owns the fixed
  padded range [s*64*16, (s+1)*64*16) rows so the per-subtree DMA has a
  static size. The Moller-Trumbore broadcast is (B rays, 128 tris),
  rays sublane-major like the compact resident kernel.

DMA slices must be 128-lane-aligned with dynamic offsets only on the
sublane dimension (measured: dynamic lane-dim DMA fails to compile),
which is exactly what this layout provides.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from realtimepathtracingresearchframework_tpu.ops.bvh import build_threaded_bvh
from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
    LIST_CAP,
    _mt_leaf,
    block_bounds,
    interval_node_test_entry,
)

try:  # pallas requires the TPU backend; keep CPU test runs importable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LEAF = 128
SUB_LEAVES = 64  # default leaf slots per subtree (tile block 512 KB)
CHUNK_TRIS = SUB_LEAVES * LEAF  # 8192 -> <=127 threaded nodes/subtree
SUB_NODE_ROWS = 8  # (8, 128) node block = 128 node slots of 8 f32
SUB_TILE_ROWS = SUB_LEAVES * 16  # (1024, 128) tile block per subtree
SUB_EXIT = 255  # local skip value meaning "leave the subtree"
DEFAULT_BLOCK = 512
_INF = 2.0e32


def node_rows_for(sub_leaves: int) -> int:
    """Node-block sublane rows for a subtree granularity: enough 16-slot
    rows for the worst threaded tree (2*leaves-1 nodes) plus the spare
    dequant slot, preserving the historic 8-row block at 64 leaves."""
    return max(1, -(-(2 * sub_leaves) // 16))


class StreamedBVHBuffers(NamedTuple):
    top_nodes: jnp.ndarray  # (Mt, 8) f32 SMEM: min3,max3,skip,subtree|-1
    sub_nodes: jnp.ndarray  # (S*R, 128) f32 HBM: packed subtree nodes
    tri_tiles: jnp.ndarray  # (S*L*16, 128) f32 HBM: padded tile blocks
    row_tri: jnp.ndarray  # (S*L*128,) i32: global row -> source triangle
    sub_leaves: int = SUB_LEAVES  # leaf slots per subtree (static); the
    # chunk granularity knob: 8192-tri subtrees amortize DMA on huge
    # scenes, 2048-tri subtrees cut per-visit walk+flush work 4x for
    # the binned per-ray dispatch (the village-class regime)

    @property
    def num_top_nodes(self) -> int:
        return self.top_nodes.shape[0]

    @property
    def num_tris_capacity(self) -> int:
        return self.row_tri.shape[0]

    @property
    def sub_node_rows(self) -> int:
        return node_rows_for(self.sub_leaves)

    @property
    def sub_tile_rows(self) -> int:
        return self.sub_leaves * 16

    @property
    def num_subtrees(self) -> int:
        return self.sub_nodes.shape[0] // self.sub_node_rows




def _build_top_tree(cmin: np.ndarray, cmax: np.ndarray) -> np.ndarray:
    """Threaded preorder top tree over subtree AABBs; leaf payload = the
    subtree index (top leaves are 1:1 with subtrees)."""
    n = len(cmin)
    centroid = 0.5 * (cmin + cmax)
    nodes: List[np.ndarray] = []

    def emit(idxs: np.ndarray) -> int:
        """Returns subtree node count; appends nodes in preorder."""
        my = len(nodes)
        row = np.zeros(8, np.float32)
        row[0:3] = cmin[idxs].min(axis=0)
        row[3:6] = cmax[idxs].max(axis=0)
        nodes.append(row)
        if len(idxs) == 1:
            row[7] = np.float32(int(idxs[0]))  # links as exact ints in f32
            count = 1
        else:
            ext = centroid[idxs].max(axis=0) - centroid[idxs].min(axis=0)
            axis = int(np.argmax(ext))
            order = idxs[np.argsort(centroid[idxs, axis], kind="stable")]
            half = len(order) // 2
            row[7] = np.float32(-1.0)
            count = 1 + emit(order[:half]) + emit(order[half:])
        row[6] = np.float32(my + count)  # skip: next preorder subtree
        return count

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 4 * n + 100))
    try:
        emit(np.arange(n))
    finally:
        sys.setrecursionlimit(old)
    return np.stack(nodes)


def _split_chunks(centroid: np.ndarray,
                  chunk_tris: int = CHUNK_TRIS) -> List[np.ndarray]:
    """Recursive largest-axis median splits into chunks of <= chunk_tris,
    split points snapped to chunk multiples (chunks stay full).

    Replaces plain morton-run chunking: runs of a global morton order
    produce ragged, heavily OVERLAPPING subtree AABBs (measured on the
    500k-tri terrain: a bounce ray overlapped 5.75 subtrees on average,
    3.9x the total box surface area); spatial median splits drop that to
    1.60 — fewer subtree visits for every ray of both streamed paths."""
    out: List[np.ndarray] = []
    stack = [np.arange(len(centroid), dtype=np.int64)]
    while stack:
        idx = stack.pop()
        if len(idx) <= chunk_tris:
            out.append(idx)
            continue
        ext = centroid[idx].max(axis=0) - centroid[idx].min(axis=0)
        axis = int(np.argmax(ext))
        order = idx[np.argsort(centroid[idx, axis], kind="stable")]
        half = (len(order) // 2 + chunk_tris - 1) // chunk_tris * chunk_tris
        half = min(max(half, chunk_tris), len(order) - 1)
        stack.append(order[half:])
        stack.append(order[:half])
    return out


def quantize_chunk(v0c, v1c, v2c):
    """Per-subtree 16-bit grid quantization of the chunk's vertices —
    the TPU expression of the reference's device-side quantized geometry
    (scene.cpp:622-644 uploads quantized vertices; dequantize.glsl
    decodes in-shader). Per-SUBTREE grids (not per-mesh) because the
    streamed layout already owns a tight AABB per subtree.

    Returns (q0, q1, q2 u16 codes, grid_min f32[3], grid_scale f32[3],
    reconstructed v0r/e1r/e2r) where the reconstruction is EXACTLY what
    the kernel decode computes: v0r = gmin + q0*scale,
    e1r = (q1-q0)*scale (f32 ops in that order)."""
    gmin = np.minimum(np.minimum(v0c, v1c), v2c).min(axis=0)
    gmax = np.maximum(np.maximum(v0c, v1c), v2c).max(axis=0)
    ext = (gmax - gmin).astype(np.float32)
    scale = np.where(ext > 0, ext / 65535.0, 1.0).astype(np.float32)
    gmin = gmin.astype(np.float32)

    def q(v):
        return np.clip(
            np.rint((v - gmin) / scale), 0, 65535
        ).astype(np.uint16)

    q0, q1, q2 = q(v0c), q(v1c), q(v2c)
    f0 = q0.astype(np.float32)
    f1 = q1.astype(np.float32)
    f2 = q2.astype(np.float32)
    v0r = gmin + f0 * scale
    e1r = (f1 - f0) * scale
    e2r = (f2 - f0) * scale
    return q0, q1, q2, gmin, scale, v0r, e1r, e2r


class StreamedTopology(NamedTuple):
    """Static structure of a streamed pack, captured for refit: chunk
    assignment, per-subtree threaded-tree shape, and slot gathers. All
    host numpy; ``refit_streamed`` turns (topology, new vertices) into
    fresh buffers without re-sorting or re-building SAH trees."""

    gather: np.ndarray  # (S*L*LEAF,) i64 tri index per slot, -1 pad
    node_end: np.ndarray  # (S, R*16) i32 preorder subtree-range end (=nn pad)
    node_leaf: np.ndarray  # (S, R*16) i32 LOCAL leaf id of leaf nodes, -1
    node_count: np.ndarray  # (S,) i32
    sub_nodes_base: np.ndarray  # (S, R, 128) f32 links/padding preserved
    sub_leaves: int = SUB_LEAVES  # granularity of the packed buffers


def pick_chunk_tris(num_tris: int) -> int:
    """Subtree granularity for a scene size: target ~64 subtrees (the
    per-ray binned dispatch wants small subtrees — less walk + flush
    work per block — while the entry table and top tree stay tiny), but
    never below 1024 tris (8 leaf tiles: DMA still amortizes) and never
    above the historic 8192 (HBM tile padding on multi-M-tri scenes)."""
    per = -(-num_tris // 64)  # ceil
    per = -(-per // LEAF) * LEAF  # round up to whole leaves
    return int(min(max(per, 1024), CHUNK_TRIS))


def pack_streamed(v0, e1, e2, quantize: bool = False,
                  with_topology: bool = False, chunk_tris: int = None):
    """Chunked two-level build + HBM packing (host-side numpy).

    With ``quantize`` the leaf tiles store per-subtree 16-bit vertex
    codes (int16, offset by -32768) instead of f32 v0/e1/e2 — half the
    HBM footprint and per-visit DMA bytes — and the dequant constants
    ride the spare node slot of each subtree's node block. The subtree
    BVHs are built over the RECONSTRUCTED triangles so the tree is
    consistent with what the kernel intersects.

    ``chunk_tris`` sets the subtree granularity (defaults to
    ``pick_chunk_tris``); must be a multiple of LEAF."""
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    v1, v2 = v0 + e1, v0 + e2
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    centroid = 0.5 * (tmin + tmax)

    if chunk_tris is None:
        chunk_tris = pick_chunk_tris(len(v0))
    assert chunk_tris % LEAF == 0 and chunk_tris > 0
    sub_leaves = chunk_tris // LEAF
    node_rows = node_rows_for(sub_leaves)
    tile_rows = sub_leaves * 16

    chunks = _split_chunks(centroid, chunk_tris)
    S = len(chunks)
    sub_nodes = np.zeros((S, node_rows, 128), np.float32)
    tile_list: List[np.ndarray] = []
    row_tri_list: List[np.ndarray] = []
    cmin = np.zeros((S, 3), np.float32)
    cmax = np.zeros((S, 3), np.float32)
    if with_topology:
        assert not quantize, "refit topology implies f32 tiles"
        topo_gather = np.full((S, chunk_tris), -1, np.int64)
        topo_end = np.zeros((S, node_rows * 16), np.int32)
        topo_leaf = np.full((S, node_rows * 16), -1, np.int32)
        topo_nn = np.zeros((S,), np.int32)
    for s, idx in enumerate(chunks):
        cv0, ce1, ce2 = v0[idx], e1[idx], e2[idx]
        qcodes = None
        if quantize:
            q0, q1, q2, gmin, gscale, cv0, ce1, ce2 = quantize_chunk(
                cv0, cv0 + ce1, cv0 + ce2
            )
            qcodes = (q0, q1, q2)
        # binned SAH inside each subtree (fewer node visits per ray);
        # SAH can overrun the fixed node/leaf budget on degenerate
        # distributions — fall back to the balanced median split there
        tb = build_threaded_bvh(
            cv0, ce1, ce2, leaf_size=LEAF, builder="sah"
        )
        node_cap = node_rows * 16 - (1 if quantize else 0)
        if (
            tb.num_nodes > node_cap
            or tb.tri_rows.shape[0] // LEAF > sub_leaves
        ):
            tb = build_threaded_bvh(cv0, ce1, ce2, leaf_size=LEAF)
        nn = tb.num_nodes
        assert nn <= node_cap, f"subtree too big: {nn}"
        nodes = tb.nodes.copy()  # (nn, 8): skip/leaf_row bitcast in f32
        skip = nodes[:, 6].view(np.int32).copy()
        leaf_row = nodes[:, 7].view(np.int32).copy()
        if with_topology:
            topo_end[s, :nn] = np.minimum(skip, nn)
        # local exits -> sentinel; leaf rows -> LOCAL leaf indices (the
        # kernel's tile scratch holds this subtree's whole block)
        skip[skip >= nn] = SUB_EXIT
        is_leaf = leaf_row >= 0
        leaf_row[is_leaf] = leaf_row[is_leaf] // LEAF
        nodes[:, 6] = skip.astype(np.float32)
        nodes[:, 7] = leaf_row.astype(np.float32)
        for i in range(nn):
            r, c = divmod(i, 16)
            sub_nodes[s, r, c * 8:(c + 1) * 8] = nodes[i]
        if quantize:
            # dequant constants ride the spare (last) node slot — the
            # walk never lands there: nn <= cap and exits jump SUB_EXIT
            sub_nodes[s, node_rows - 1, 120:123] = gmin
            sub_nodes[s, node_rows - 1, 123:126] = gscale
        # fixed-size padded tile block: (sub_leaves*16, 128) field rows
        rows = tb.tri_rows  # (R, >=9) leaf-major rows
        R = rows.shape[0]
        num_leaves = R // LEAF
        assert num_leaves <= sub_leaves
        if quantize:
            q0, q1, q2 = qcodes
            codes = np.concatenate(
                [q0, q1, q2], axis=1
            )[tb.row_tri]  # (R, 9) u16, leaf order
            tiles = np.zeros((sub_leaves, 16, 128), np.int16)
            per_leaf = codes.reshape(num_leaves, LEAF, 9)
            tiles[:num_leaves, 0:9, :] = (
                per_leaf.astype(np.int32) - 32768
            ).astype(np.int16).transpose(0, 2, 1)
        else:
            tiles = np.zeros((sub_leaves, 16, 128), np.float32)
            per_leaf = rows[:, 0:9].reshape(num_leaves, LEAF, 9)
            tiles[:num_leaves, 0:9, :] = per_leaf.transpose(0, 2, 1)
        tile_list.append(tiles.reshape(sub_leaves * 16, 128))
        rt = np.zeros(chunk_tris, np.int32)
        rt[:R] = idx[tb.row_tri].astype(np.int32)
        row_tri_list.append(rt)
        cmin[s] = tb.world_min
        cmax[s] = tb.world_max
        if with_topology:
            topo_gather[s, :R] = idx[tb.row_tri]
            topo_leaf[s, :nn] = leaf_row  # already LOCAL leaf ids / -1
            topo_nn[s] = nn

    top = _build_top_tree(cmin, cmax)
    bb = StreamedBVHBuffers(
        top_nodes=jnp.asarray(top),
        sub_nodes=jnp.asarray(sub_nodes.reshape(S * node_rows, 128)),
        tri_tiles=jnp.asarray(np.concatenate(tile_list, axis=0)),
        row_tri=jnp.asarray(np.concatenate(row_tri_list)),
        sub_leaves=sub_leaves,
    )
    if with_topology:
        return bb, StreamedTopology(
            gather=topo_gather.reshape(-1),
            node_end=topo_end,
            node_leaf=topo_leaf,
            node_count=topo_nn,
            sub_nodes_base=sub_nodes,
            sub_leaves=sub_leaves,
        )
    return bb


def refit_streamed(topo: StreamedTopology, v0, e1, e2) -> StreamedBVHBuffers:
    """Refit a streamed pack to moved vertices with UNCHANGED topology —
    the streamed twin of refit_bvh (the reference's BLAS update path,
    vulkanrt_utils.h:92-101): no re-sort, no SAH rebuilds. Vectorized
    host numpy: re-gather the leaf tiles by the stored slot order,
    recompute leaf AABBs, fold them into node AABBs through the stored
    preorder ranges (prefix-sum range queries), and rebuild the tiny top
    tree over the new subtree roots. Chunk assignment persists, so
    quality degrades gracefully with large motion (same tradeoff as any
    refit; force_bvh_rebuild restores full quality)."""
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    g = topo.gather
    S = topo.node_count.shape[0]
    sub_leaves = topo.sub_leaves
    node_rows = node_rows_for(sub_leaves)
    slots = node_rows * 16
    valid = g >= 0
    gi = np.where(valid, g, 0)

    sv0, se1, se2 = v0[gi], e1[gi], e2[gi]
    fields = np.concatenate([sv0, se1, se2], axis=1)  # (slots, 9)
    fields[~valid] = 0.0
    tiles = np.zeros((S * sub_leaves, 16, 128), np.float32)
    tiles[:, 0:9, :] = fields.reshape(S * sub_leaves, LEAF, 9).transpose(
        0, 2, 1
    )

    # leaf AABBs (padded slots contribute nothing)
    w1, w2 = sv0 + se1, sv0 + se2
    tmin = np.minimum(np.minimum(sv0, w1), w2)
    tmax = np.maximum(np.maximum(sv0, w1), w2)
    big = np.float32(np.inf)
    tmin = np.where(valid[:, None], tmin, big)
    tmax = np.where(valid[:, None], tmax, -big)
    lmin = tmin.reshape(S, sub_leaves, LEAF, 3).min(axis=2)  # (S, L, 3)
    lmax = tmax.reshape(S, sub_leaves, LEAF, 3).max(axis=2)

    # node AABBs via prefix sums over preorder leaf presence: node i of
    # subtree s covers leaves seen at preorder positions [i, end_i)
    P = np.zeros((S, slots + 1, sub_leaves), np.float32)
    sj, nj = np.nonzero(topo.node_leaf >= 0)
    P[sj, nj + 1, topo.node_leaf[sj, nj]] = 1.0
    C = np.cumsum(P, axis=1)  # (S, slots+1, L)
    ii = np.arange(slots)
    C_end = np.take_along_axis(
        C, topo.node_end[:, :, None].astype(np.int64), axis=1
    )  # (S, slots, L)
    covered = (C_end - C[:, 0:slots, :]) > 0  # (S, slots, L)
    node_valid = ii[None, :] < topo.node_count[:, None]
    nmin = np.where(
        covered[..., None], lmin[:, None, :, :], big
    ).min(axis=2)  # (S, slots, 3)
    nmax = np.where(covered[..., None], lmax[:, None, :, :], -big).max(axis=2)

    sub = topo.sub_nodes_base.copy()  # (S, R, 128), links preserved
    r = ii // 16
    base = (ii % 16) * 8
    for k in range(3):
        vals_min = np.where(node_valid, nmin[..., k], 0.0)
        vals_max = np.where(node_valid, nmax[..., k], 0.0)
        old_min = sub[:, r, base + k]
        old_max = sub[:, r, base + 3 + k]
        sub[:, r, base + k] = np.where(node_valid, vals_min, old_min)
        sub[:, r, base + 3 + k] = np.where(node_valid, vals_max, old_max)

    top = _build_top_tree(
        nmin[:, 0, :].astype(np.float32), nmax[:, 0, :].astype(np.float32)
    )
    rt = np.where(valid, g, 0).astype(np.int32)
    return StreamedBVHBuffers(
        top_nodes=jnp.asarray(top),
        sub_nodes=jnp.asarray(sub.reshape(S * node_rows, 128)),
        tri_tiles=jnp.asarray(tiles.reshape(S * sub_leaves * 16, 128)),
        row_tri=jnp.asarray(rt),
        sub_leaves=sub_leaves,
    )


def reconstruct_quantized(v0, e1, e2, chunk_tris: int = None):
    """Host-side reference of the quantized-pack geometry: the exact
    triangles the quantized kernel intersects (for parity tests and
    error-bound checks). Mirrors pack_streamed(quantize=True)'s
    per-chunk grids."""
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    v1, v2 = v0 + e1, v0 + e2
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    centroid = 0.5 * (tmin + tmax)
    out0 = np.zeros_like(v0)
    out1 = np.zeros_like(e1)
    out2 = np.zeros_like(e2)
    if chunk_tris is None:
        chunk_tris = pick_chunk_tris(len(v0))
    for idx in _split_chunks(centroid, chunk_tris):
        _, _, _, _, _, v0r, e1r, e2r = quantize_chunk(
            v0[idx], v1[idx], v2[idx]
        )
        out0[idx], out1[idx], out2[idx] = v0r, e1r, e2r
    return out0, out1, out2


def dequant_tile(qt, dq):
    """In-kernel decode of one quantized leaf tile (the dequantize.glsl
    analogue): int16 codes (offset -32768) -> the (16, 128) f32
    v0/e1/e2 field tile ``_mt_leaf`` expects. Edges come from CODE
    DIFFS (exact in f32) so the decode is bit-identical to the host
    reconstruction in quantize_chunk."""
    cx, cy, cz, sx, sy, sz = dq
    f = qt[0:9, :].astype(jnp.float32)
    rows = [
        cx + (f[0:1] + 32768.0) * sx,
        cy + (f[1:2] + 32768.0) * sy,
        cz + (f[2:3] + 32768.0) * sz,
        (f[3:4] - f[0:1]) * sx,
        (f[4:5] - f[1:2]) * sy,
        (f[5:6] - f[2:3]) * sz,
        (f[6:7] - f[0:1]) * sx,
        (f[7:8] - f[1:2]) * sy,
        (f[8:9] - f[2:3]) * sz,
        jnp.zeros((7, qt.shape[1]), jnp.float32),
    ]
    return jnp.concatenate(rows, axis=0)

# toggled by tests to run the kernel on the CPU interpreter (the Pallas
# analogue of the reference's shader-as-C++ compile+run tests)
INTERPRET = False


def _kernel_streamed(bounds_ref, top_ref, subn_ref, tris_ref, rays_ref,
                     out_ref,
                     lst, nscr, tscr, sem_n, sem_t,
                     tb_ref, row_ref, u_ref, v_ref, cid_ref, cl_ref,
                     *, top_nodes: int, block: int, shadow_from: int = -1,
                     quantized: bool = False, ordered: bool = False,
                     sub_leaves: int = SUB_LEAVES):
    """v2 walk (see ops/traverse_pallas2.py): pure-scalar top + subtree
    walks against per-block conservative packet bounds (scalar-prefetch
    operand), leaf hits collected into an SMEM list of LOCAL leaf ids
    and flushed as batched (B, 128) Moller-Trumbore from the subtree's
    RESIDENT 512 KB tile block, whose HBM->VMEM DMA is started at
    subtree entry and overlapped with the node walk."""
    b = block
    pid = pl.program_id(0)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LEAF, 1), 0)
    node_rows = node_rows_for(sub_leaves)
    tile_rows = sub_leaves * 16

    # lane-major (8, B) operand (cheap XLA concat) stays lane-major:
    # (1, B) component rows, tris-on-sublanes MT — identical arithmetic
    # to traverse_pallas2._mt_leaf (shared function => bit-equal t)
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

    tb_ref[:, :] = tmax
    row_ref[:, :] = jnp.full((1, b), -1, jnp.int32)
    u_ref[:, :] = jnp.zeros((1, b), jnp.float32)
    v_ref[:, :] = jnp.zeros((1, b), jnp.float32)

    is_shadow = pid >= shadow_from if shadow_from >= 0 else None

    def node_test_entry(bmn3, bmx3, cap):
        """Conservative scalar packet-vs-AABB test (the shared
        traverse_pallas2 helper). Returns (overlap, L) where L is the
        packet's conservative entry-t lower bound, the front-to-back
        sort key of the ordered walk."""
        return interval_node_test_entry(
            bmn3, bmx3, olo, ohi, ilo, ihi, tlo, thi, cap
        )

    def node_test(bmn3, bmx3, cap):
        return node_test_entry(bmn3, bmx3, cap)[0]

    def _mt_tile(tile, gid, dq=None):
        """Lane-major Moller-Trumbore over one resident leaf tile —
        the SAME function as the resident v2 kernel (bit-equal t where
        the winning triangle agrees); ``gid`` is the GLOBAL leaf index
        so best rows are global rows."""
        if quantized:
            tile = dequant_tile(tile, dq)
        t_best, best_row, best_u, best_v = _mt_leaf(
            tile, rox, roy, roz, rdx, rdy, rdz, tmin, tmax, sub_iota,
            gid, tb_ref[:, :], row_ref[:, :], u_ref[:, :], v_ref[:, :],
        )
        tb_ref[:, :] = t_best
        row_ref[:, :] = best_row
        u_ref[:, :] = best_u
        v_ref[:, :] = best_v

    def visit_subtree(sub_id, cap, nhit):
        """One subtree visit: start the WHOLE 512 KB tile-block DMA
        (HBM->VMEM) and the 4 KB node-block DMA (HBM->SMEM) together,
        walk the nodes with the scalar cursor while the tiles transfer
        (the walk hides most of the copy), collect LOCAL leaf ids into
        the SMEM list, and flush batched (B, 128) Moller-Trumbore from
        the RESIDENT tile block. One tile DMA + one wait per subtree
        visit regardless of how many leaves the block touches — measured
        decisively better than per-leaf 8 KB DMAs for divergent bounce
        waves (which visit most leaves of every entered subtree)."""
        tdma = pltpu.make_async_copy(
            tris_ref.at[pl.ds(sub_id * tile_rows, tile_rows), :],
            tscr, sem_t,
        )
        tdma.start()
        ndma = pltpu.make_async_copy(
            subn_ref.at[pl.ds(sub_id * node_rows, node_rows), :],
            nscr, sem_n,
        )
        ndma.start()
        ndma.wait()
        # dequant constants from the spare node slot (pack_streamed)
        dq = (
            tuple(nscr[node_rows - 1, 120 + k] for k in range(6))
            if quantized else None
        )

        def flush(count, cap, nhit, waited):
            """MT over the listed leaf tiles; waits the subtree tile DMA
            exactly once across all flushes of this visit."""

            @pl.when(~waited)
            def _():
                tdma.wait()

            def lf(j, _):
                ll = lst[j]
                _mt_tile(
                    tscr[pl.ds(ll * 16, 16), :], sub_id * sub_leaves + ll,
                    dq,
                )
                return 0

            jax.lax.fori_loop(0, count, lf, 0, unroll=False)
            cap = jnp.max(jnp.minimum(tb_ref[:, :], tmax))
            nhit = jnp.sum(
                ((row_ref[:, :] >= 0) | (tmax <= tmin)).astype(jnp.int32)
            )
            return jnp.int32(0), cap, nhit, jnp.full((), True)

        def in_cond(c):
            return c[0] < SUB_EXIT

        def in_body(c):
            cur, count, cap, nhit, waited = c
            r = cur // 16
            base = (cur % 16) * 8
            bmn3 = (nscr[r, base + 0], nscr[r, base + 1], nscr[r, base + 2])
            bmx3 = (nscr[r, base + 3], nscr[r, base + 4], nscr[r, base + 5])
            skip = nscr[r, base + 6].astype(jnp.int32)
            leaf_local = nscr[r, base + 7].astype(jnp.int32)
            live = node_test(bmn3, bmx3, cap)
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

    if ordered:
        # ---- front-to-back subtree entry (closest-hit only): collect
        # the live subtree leaves with their conservative packet entry-t
        # (one top-tree walk, no DMAs), then visit them nearest-first so
        # the shrinking packet cap culls the far ones. Strictly fewer or
        # equal subtree visits than the preorder walk; per-ray results
        # are exact either way (per-ray MT is order-independent up to
        # exact-t ties). Selection is an O(C^2) scalar scan over the
        # collected candidates — C <= number of subtrees (61 at 500k
        # tris), negligible next to one leaf flush.
        assert shadow_from < 0, "ordered walk is a closest-hit strategy"

        def cbody(c):
            cur, ncand = c
            bmn3 = (top_ref[cur, 0], top_ref[cur, 1], top_ref[cur, 2])
            bmx3 = (top_ref[cur, 3], top_ref[cur, 4], top_ref[cur, 5])
            skip = top_ref[cur, 6].astype(jnp.int32)
            sub_id = top_ref[cur, 7].astype(jnp.int32)
            live, entry = node_test_entry(bmn3, bmx3, thi)
            is_sub = sub_id >= 0
            # ncand < S always holds when a node is processed (the last
            # preorder node is the final leaf), but clamp the staging
            # write anyway — an OOB SMEM write would corrupt silently
            slot = jnp.minimum(ncand, jnp.int32(cid_ref.shape[0] - 1))
            cid_ref[slot] = sub_id
            cl_ref[slot] = entry
            ncand = ncand + (live & is_sub).astype(jnp.int32)
            nxt = jnp.where(live & ~is_sub, cur + 1, skip)
            return (nxt, ncand)

        _, ncand = jax.lax.while_loop(
            lambda c: c[0] < top_nodes, cbody, (jnp.int32(0), jnp.int32(0))
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

            def go(args):
                return visit_subtree(cid, *args)

            cap, nhit = jax.lax.cond(
                bl <= cap, go, lambda args: args, (cap, nhit)
            )
            # min entry past the cap: every remaining candidate is
            # occluded by found hits — stop visiting
            i = jnp.where(bl <= cap, i + 1, ncand)
            return (i, cap, nhit)

        _, cap, _ = jax.lax.while_loop(
            lambda c: c[0] < ncand, sel_body,
            (jnp.int32(0), thi, jnp.int32(0)),
        )
    else:
        def cond(c):
            cur = c[0]
            if is_shadow is not None:
                return (cur < top_nodes) & (~is_shadow | (c[2] < b))
            return cur < top_nodes

        def body(c):
            cur, cap, nhit = c
            bmn3 = (top_ref[cur, 0], top_ref[cur, 1], top_ref[cur, 2])
            bmx3 = (top_ref[cur, 3], top_ref[cur, 4], top_ref[cur, 5])
            skip = top_ref[cur, 6].astype(jnp.int32)
            sub_id = top_ref[cur, 7].astype(jnp.int32)
            live = node_test(bmn3, bmx3, cap)
            is_sub = sub_id >= 0

            cap, nhit = jax.lax.cond(
                live & is_sub,
                lambda args: visit_subtree(sub_id, *args),
                lambda args: args,
                (cap, nhit),
            )
            nxt = jnp.where(live & ~is_sub, cur + 1, skip)
            return (nxt, cap, nhit)

        init = (jnp.int32(0), thi, jnp.int32(0))
        _, cap, _ = jax.lax.while_loop(cond, body, init)

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
    static_argnames=(
        "top_nodes", "block", "shadow_from", "interpret", "ordered",
        "sub_leaves",
    ),
)
def _traverse_streamed(top_nodes_arr, sub_nodes, tri_tiles, rays,
                       top_nodes: int, block: int, shadow_from: int = -1,
                       interpret: bool = False, ordered: bool = False,
                       sub_leaves: int = SUB_LEAVES):
    n = rays.shape[1]  # (8, Np) lane-major rows
    # barrier: keep the bounds reduction off the ray-producer chain (see
    # traverse_pallas2._traverse2)
    rays = jax.lax.optimization_barrier(rays)
    bounds = block_bounds(rays, block)
    grid = (n // block,)
    quantized = tri_tiles.dtype == jnp.int16
    node_rows = node_rows_for(sub_leaves)
    n_subs = sub_nodes.shape[0] // node_rows
    kernel = functools.partial(
        _kernel_streamed, top_nodes=top_nodes, block=block,
        shadow_from=shadow_from, quantized=quantized, ordered=ordered,
        sub_leaves=sub_leaves,
    )
    # bounds as a plain whole-array SMEM operand — see _traverse2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (16, n // block), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                top_nodes_arr.shape, lambda i: (0, 0),
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
            pltpu.VMEM(
                (sub_leaves * 16, 128),
                jnp.int16 if quantized else jnp.float32,
            ),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.int32),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.float32),
            # ordered-walk candidate list (subtree id, packet entry-t);
            # one slot per subtree, unused by the preorder walk
            pltpu.SMEM((max(n_subs, 1),), jnp.int32),
            pltpu.SMEM((max(n_subs, 1),), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        interpret=interpret,
    )(bounds, top_nodes_arr, sub_nodes, tri_tiles, rays)


def _out_to_hit(bb: StreamedBVHBuffers, out, n, map_tri: bool):
    from realtimepathtracingresearchframework_tpu.ops.traverse import Hit

    t, rowbits = out[0, :n], out[1, :n]
    u, v = out[2, :n], out[3, :n]
    row = jax.lax.bitcast_convert_type(rowbits, jnp.int32)
    if map_tri:
        tri = jnp.where(row < 0, -1, bb.row_tri[jnp.maximum(row, 0)])
    else:
        tri = row
    return Hit(t=t, tri=tri, u=u, v=v)


# ---------------------------------------------------------------------------
# Coherence sort: the streamed kernel walks each BLOCK of rays with a
# shared scalar cursor and DMAs every subtree ANY ray in the block touches
# (512 KB leaf tile + node block per visit). Incoherent bounce rays make
# every block touch most subtrees; grouping rays by (origin-morton,
# direction-octant) before the launch collapses the per-block subtree set.
# The equivalent of the reference wavefront design's ray-binning stage
# expressed TPU-natively: one device-side key sort + permutation gathers
# around an unchanged kernel. Per-ray results are exact regardless of
# block composition (the shared cursor only PRUNES nodes no ray needs),
# so sorted traversal is bit-identical to unsorted.
# ---------------------------------------------------------------------------


def _part1by2(x):
    """Spread the low 10 bits of x two apart (standard morton dilation)."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x30000FF)
    x = (x | (x << 8)) & jnp.uint32(0x300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x30C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x9249249)
    return x


def _coherence_key(bb: StreamedBVHBuffers, comps):
    """u32 sort key: 3-bit direction octant HIGH, 21-bit origin morton
    (128^3 grid over the scene box, from the top-tree root AABB) low.

    Octant-major matters for the v2 scalar packet walk: its per-block
    inverse-direction INTERVAL test degenerates when a block mixes
    direction signs (the interval spans zero), so blocks must be
    octant-pure first, origin-local second. (The old per-ray vector
    kernel preferred origin-major; measured 3.8x there.)"""
    rox, roy, roz, rdx, rdy, rdz = comps
    lo = bb.top_nodes[0, 0:3]
    hi = bb.top_nodes[0, 3:6]
    inv = 127.0 / jnp.maximum(hi - lo, 1e-12)

    def q(o, k):
        return jnp.clip((o - lo[k]) * inv[k], 0.0, 127.0).astype(jnp.uint32)

    morton = (
        _part1by2(q(rox, 0))
        | (_part1by2(q(roy, 1)) << 1)
        | (_part1by2(q(roz, 2)) << 2)
    )
    octant = (
        (rdx < 0.0).astype(jnp.uint32) << 2
        | (rdy < 0.0).astype(jnp.uint32) << 1
        | (rdz < 0.0).astype(jnp.uint32)
    )
    return (octant << 21) | morton


def coherence_order(key, dead):
    """The coherence-ordering contract shared by the sorted streamed
    walk and the binned dispatch (traverse_binned._coherence_perm):
    stable argsort of the key with DEAD LANES LAST (bit 31: a dead
    lane's block membership only wastes walk work, so clustering them
    lets whole blocks short-circuit — the streamed twin of
    traverse_pallas2._compact). Returns (perm, inverse perm). The
    inverse comes from a second argsort (a permutation's argsort IS its
    inverse): 1.9 ms vs 2.6 ms for the 1-D scatter build (measured r4,
    prof/prof_r4_sortcost.py)."""
    key = key | (dead.astype(jnp.uint32) << 31)
    perm = jnp.argsort(key, stable=True)
    inv = jnp.argsort(perm)
    return perm, inv


def _sort_operand(bb, rays):
    """Coherence-sort a packed (8, Np) operand (see coherence_order):
    ONE 2-D lane gather (4.3 ms per (8, 524K), measured r4) instead of
    the round-3 per-component 1-D gathers (~7 ms EACH — index staging).
    Returns (rays_sorted, inv); ``out[:, inv]`` restores caller order.
    Padding lanes (tmax <= tmin) sort last with the dead."""
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
        _coherence_key2,
    )

    key = _coherence_key2(rays, bb.top_nodes[0, 0:3], bb.top_nodes[0, 3:6])
    perm = jnp.argsort(key, stable=True)
    inv = jnp.argsort(perm)
    return rays[:, perm], inv


def closest_hit_streamed(
    bb: StreamedBVHBuffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, map_tri: bool = True,
    sort: bool = False, ordered: bool = False,
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    if sort:
        rays, inv = _sort_operand(bb, rays)
    out = _traverse_streamed(
        bb.top_nodes, bb.sub_nodes, bb.tri_tiles, rays,
        top_nodes=bb.num_top_nodes, block=block,
        interpret=INTERPRET, ordered=ordered, sub_leaves=bb.sub_leaves,
    )
    if sort:
        out = out[:, inv]
    return _out_to_hit(bb, out[:, :n], n, map_tri)


def occluded_streamed(
    bb: StreamedBVHBuffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, sort: bool = False,
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    if sort:
        rays, inv = _sort_operand(bb, rays)
    out = _traverse_streamed(
        bb.top_nodes, bb.sub_nodes, bb.tri_tiles, rays,
        top_nodes=bb.num_top_nodes, block=block, shadow_from=0,
        interpret=INTERPRET, sub_leaves=bb.sub_leaves,
    )
    if sort:
        out = out[:, inv]
    rowbits = out[1, :n]
    return jax.lax.bitcast_convert_type(rowbits, jnp.int32) >= 0


def closest_and_occluded_streamed(
    bb: StreamedBVHBuffers,
    comps_c, t_min_c, t_max_c,
    comps_s, t_min_s, t_max_s,
    block: int = DEFAULT_BLOCK, map_tri: bool = True, sort: bool = False,
):
    """Merged two-queue launch (see closest_and_occluded_pallas). With
    ``sort``, each queue is coherence-sorted independently (the halves
    stay block-aligned, so the ``shadow_from`` predicate is unchanged)."""
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays_c, n = _prep_rays(None, None, t_min_c, t_max_c, block,
                           comps=comps_c, wide=True)
    rays_s, n2 = _prep_rays(None, None, t_min_s, t_max_s, block,
                            comps=comps_s, wide=True)
    if sort:
        rays_c, inv_c = _sort_operand(bb, rays_c)
        rays_s, inv_s = _sort_operand(bb, rays_s)
    else:
        inv_c = inv_s = None
    rays = jnp.concatenate([rays_c, rays_s], axis=1)
    shadow_from = rays_c.shape[1] // block
    out = _traverse_streamed(
        bb.top_nodes, bb.sub_nodes, bb.tri_tiles, rays,
        top_nodes=bb.num_top_nodes, block=block, shadow_from=shadow_from,
        interpret=INTERPRET, sub_leaves=bb.sub_leaves,
    )
    np_c = rays_c.shape[1]
    # unsort BEFORE truncating: sorted order moves dead/padding lanes
    # last, so the first n sorted lanes are not the caller's first n
    out_c = out[:, :np_c]
    if inv_c is not None:
        out_c = out_c[:, inv_c]
    hit = _out_to_hit(bb, out_c[:, :n], n, map_tri)
    srowbits = out[1, np_c:]
    if inv_s is not None:
        srowbits = srowbits[inv_s]
    blocked = jax.lax.bitcast_convert_type(srowbits[:n2], jnp.int32) >= 0
    return hit, blocked
