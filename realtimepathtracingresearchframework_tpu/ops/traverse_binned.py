"""Subtree-binned streamed traversal: rays grouped by subtree per round.

The plain streamed kernel (ops/traverse_stream.py) walks the top tree
once per 512-ray BLOCK and DMAs every subtree ANY ray of the block
touches. For incoherent bounce waves that union is ~4x the per-ray
overlap (measured on 500k-tri terrain: 23.6 subtrees/block vs 5.75
overlapped subtrees/ray, and only ~2-3 of those matter after early
termination) — the traversal + leaf-flush work scales with the union.

This module restructures the dispatch the TPU-native way instead of
sorting harder (key experiments showed the block union is irreducible by
ordering alone):

- XLA computes each ray's per-subtree entry intervals once per dispatch
  (a dense (S, N) slab test — pure VPU work against the ~62 subtree
  AABBs),
- each ROUND every live ray selects its next-nearest unvisited subtree
  with entry < current-best-t; rays are counting-sorted into
  block-aligned SUBTREE BINS with a scatter permutation (scatters
  measured ~5x cheaper than lane gathers on v5e),
- a Pallas kernel walks each block against exactly ONE subtree
  (scalar-prefetched block->subtree table). Consecutive blocks sharing a
  subtree skip the DMA entirely (grid steps run sequentially on one
  core, so the VMEM tile scratch persists): each subtree's 512 KB tile
  block transfers AT MOST ONCE PER ROUND,
- after ``rounds`` binned rounds, rays that still have unvisited
  overlapping subtrees closer than their best hit take one CLEANUP
  dispatch through the plain streamed kernel with their best-t as the
  pruning cap (tight caps make that packet walk cheap).

This is the wavefront ray-binning stage of the north-star design
(SURVEY §7) expressed with TPU primitives; the reference's analogue is
the SIMT scheduler regrouping rays by BLAS in its batched 5M-triangle
handling (render_vulkan.cpp:472-545). Results are exact for any block
composition: per-ray Moller-Trumbore uses strict improvement and rounds
visit subtrees in increasing entry-t with conservative caps, so the
closest t is identical to the single-kernel walk (winner tri/u/v may
differ only on exact-t ties across subtrees, where both are valid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
    _mt_leaf,
    _mt_leaf_any,
    block_bounds,
    interval_node_test_entry,
)
from realtimepathtracingresearchframework_tpu.ops.traverse_stream import (
    LEAF,
    LIST_CAP,
    SUB_EXIT,
    SUB_LEAVES,
    StreamedBVHBuffers,
    _coherence_key,
    _out_to_hit,
    coherence_order as ts_coherence_order,
    _traverse_streamed,
    dequant_tile,
    node_rows_for,
)

try:  # pallas requires the TPU backend; keep CPU test runs importable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

DEFAULT_BLOCK = 512
DEFAULT_ROUNDS = 2
_INF = 2.0e32

# toggled by tests to run the kernel on the CPU interpreter
INTERPRET = False


def subtree_bounds(bb: StreamedBVHBuffers) -> jnp.ndarray:
    """(S, 8) f32 [min3, max3, 0, 0] subtree AABBs, from the top-tree
    leaf rows (leaf payload = subtree id)."""
    top = bb.top_nodes
    sid = top[:, 7].astype(jnp.int32)
    s = bb.num_subtrees
    out = jnp.zeros((s, 8), jnp.float32)
    idx = jnp.where(sid >= 0, sid, s)  # dropped (OOB) for inner nodes
    return out.at[idx].set(top, mode="drop", unique_indices=True)


def _entry_table(sb, rays):
    """(S, N) per-ray subtree entry t: INF where the ray's [tmin, tmax]
    segment misses the subtree AABB (per-ray slab test; the binning
    equivalent of the top-tree walk). ``rays`` is the (8, N) lane-major
    operand; dead lanes (tmax <= tmin) get all-INF rows."""
    ro = rays[0:3][:, None, :]  # (3, 1, N)
    rd = rays[3:6][:, None, :]
    tmin = rays[6]
    tmax = rays[7]
    inv = jnp.where(rd >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(rd), 1e-20)
    bmin = sb[:, 0:3].T[:, :, None]  # (3, S, 1)
    bmax = sb[:, 3:6].T[:, :, None]
    t0 = (bmin - ro) * inv  # (3, S, N)
    t1 = (bmax - ro) * inv
    lo = jnp.max(jnp.minimum(t0, t1), axis=0)  # (S, N)
    hi = jnp.min(jnp.maximum(t0, t1), axis=0)
    entry = jnp.maximum(lo, tmin[None])
    live = tmax > tmin
    ok = (hi >= entry) & (entry <= tmax[None]) & live[None]
    return jnp.where(ok, entry, _INF)


def _next_subtree(entry, last_e, last_s, cap):
    """Per-ray next subtree in (entry_t, sid)-lexicographic order after
    (last_e, last_s), restricted to entry < cap (no improvement possible
    at or past the current best). Returns (sid (N,) i32 with -1 = done,
    entry_t (N,))."""
    s = entry.shape[0]
    sid_iota = jax.lax.broadcasted_iota(jnp.int32, entry.shape, 0)
    later = (entry > last_e[None]) | (
        (entry == last_e[None]) & (sid_iota > last_s[None])
    )
    cand = later & (entry < cap[None])
    e = jnp.where(cand, entry, _INF)
    mt = jnp.min(e, axis=0)
    sid = jnp.min(jnp.where(e <= mt[None], sid_iota, s), axis=0)
    sid = jnp.where(mt < _INF, sid, -1).astype(jnp.int32)
    return sid, mt


def _bin_layout(sid, s: int, block: int, n_pad: int):
    """Counting-sort layout for block-aligned subtree bins, built from
    SORTS + GATHERS only. Round 3 built this with lane-dim scatters
    ("scatters measured ~5x cheaper than lane gathers"); the round-4
    re-measurement (prof/prof_r4_sortcost.py) found the OPPOSITE on
    current v5e toolchains — stable argsort 1.9 ms and a packed 2-D lane
    gather 4.3 ms per 524K lanes vs 42-46 ms for lane scatters — so the
    permutation layer is now: one stable argsort over bin keys, one
    elementwise padded-slot map, and the caller moves data with exactly
    two packed 2-D gathers (operand: sort-order then slot-order; result:
    one slot-order pick).

    Returns (perm (N,) sorted source order,
             spos (n_pad,) i32: sorted-order index feeding padded slot p
                  (clamped; dead padding marked by ``valid``),
             valid (n_pad,) bool: padded slot holds a real source lane,
             pos (N,) i32: padded slot of each SOURCE lane,
             sid_blk (n_pad//block,) i32: each block's subtree or -1).
    Stable: the caller's (coherence-sorted) lane order is preserved
    inside bins."""
    n = sid.shape[0]
    b = jnp.where(sid < 0, s, sid)  # dead bin last
    perm = jnp.argsort(b, stable=True)
    rank = jnp.argsort(perm)  # rank of each source lane in sorted order
    b_sorted = jnp.sort(b)
    bins = jnp.arange(s + 1, dtype=jnp.int32)
    start = jnp.searchsorted(b_sorted, bins, side="left").astype(jnp.int32)
    end = jnp.searchsorted(b_sorted, bins, side="right").astype(jnp.int32)
    counts = end - start
    padded = ((counts + block - 1) // block) * block
    pstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
    )
    # source lane -> padded slot (tiny (S+1,) table lookups)
    pos = pstart[b] + (rank - start[b])
    # padded slot -> sorted-order source index
    slot = jnp.arange(n_pad, dtype=jnp.int32)
    fill = jnp.concatenate([pstart[1:], jnp.array([n_pad], jnp.int32)])
    bin_of = jnp.searchsorted(
        fill, slot, side="right"
    ).astype(jnp.int32)
    bin_c = jnp.minimum(bin_of, s)
    off = slot - pstart[bin_c]
    valid = (bin_of <= s) & (off < counts[bin_c])
    spos = jnp.minimum(start[bin_c] + off, n - 1)
    nb = n_pad // block
    blk_start = jnp.arange(nb, dtype=jnp.int32) * block
    bin_of_blk = jnp.searchsorted(
        fill, blk_start, side="right"
    ).astype(jnp.int32)
    used = blk_start < (pstart + padded)[jnp.minimum(bin_of_blk, s)]
    sid_blk = jnp.where((bin_of_blk >= s) | ~used, -1, bin_of_blk)
    return perm, spos, valid, pos, sid_blk.astype(jnp.int32)


def _pad_operand(stack, init_padded, perm, spos, valid):
    """Move a (rows, N) source stack into bin-padded slot order with two
    packed 2-D gathers (see _bin_layout); padding slots take the
    init_padded defaults (dead ray, miss-encoded best)."""
    sorted_ops = stack[:, perm]
    gathered = sorted_ops[:, spos]
    return jnp.where(valid[None, :], gathered, init_padded)


def _binned_bounds(padded, block):
    """(16, nb) per-block packet bounds for the BINNED operand: rows 0-13
    straight from traverse_pallas2.block_bounds over the ray rows, row
    14 = pruning cap = max over live lanes of min(best_t, tmax) (best
    rides rows 8-11 of the 12-row binned operand)."""
    n = padded.shape[1]
    nb = n // block
    r = padded.reshape(12, nb, block)
    live = r[7] > r[6]
    base = block_bounds(padded[:8], block)[0:14]
    cap = jnp.max(
        jnp.where(live, jnp.minimum(r[8], r[7]), jnp.float32(-3.0e38)),
        axis=1,
    )
    pad = jnp.zeros((nb,), jnp.float32)
    return jnp.concatenate([base, cap[None], pad[None]], axis=0)


def _kernel_binned(bounds_ref, sid_ref, subn_ref, tris_ref, rays_ref,
                   out_ref,
                   lst, nscr, tscr, prev_ref, sem_n, sem_t,
                   tb_ref, row_ref, u_ref, v_ref,
                   *, block: int, shadow: bool, quantized: bool,
                   sub_leaves: int = SUB_LEAVES):
    """One block vs ONE subtree. The walk + flush mirror
    traverse_stream._kernel_streamed's visit_subtree; the differences:
    the block's subtree id arrives via ``sid_ref`` (no top-tree walk),
    the incoming best (rows 8-11 of the operand) seeds the result
    registers so rounds compose, and the DMA is skipped entirely when
    the previous block used the same subtree (bins are sorted, so each
    subtree transfers at most once per launch)."""
    b = block
    pid = pl.program_id(0)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LEAF, 1), 0)
    node_rows = node_rows_for(sub_leaves)
    tile_rows = sub_leaves * 16

    @pl.when(pid == 0)
    def _():
        prev_ref[0] = -2

    sid = sid_ref[0, pid]

    rox = rays_ref[0:1, :]
    roy = rays_ref[1:2, :]
    roz = rays_ref[2:3, :]
    rdx = rays_ref[3:4, :]
    rdy = rays_ref[4:5, :]
    rdz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]
    t_in = rays_ref[8:9, :]
    row_in = jax.lax.bitcast_convert_type(rays_ref[9:10, :], jnp.int32)
    u_in = rays_ref[10:11, :]
    v_in = rays_ref[11:12, :]

    # seed from the incoming best: tb carries min(best, tmax) so the MT's
    # strict-improvement test composes across rounds; INF-encoded misses
    # reduce to tmax exactly like a fresh launch
    tb_ref[:, :] = jnp.minimum(t_in, tmax)
    row_ref[:, :] = row_in
    u_ref[:, :] = u_in
    v_ref[:, :] = v_in

    def write_out():
        out_ref[:, :] = jnp.concatenate(
            [
                jnp.where(row_ref[:, :] < 0, jnp.float32(_INF), tb_ref[:, :]),
                jax.lax.bitcast_convert_type(row_ref[:, :], jnp.float32),
                u_ref[:, :],
                v_ref[:, :],
            ],
            axis=0,
        )

    @pl.when(sid < 0)
    def _():
        write_out()  # dead/padding block: pass the best through

    @pl.when(sid >= 0)
    def _():
        olo = [bounds_ref[k, pid] for k in range(3)]
        ohi = [bounds_ref[3 + k, pid] for k in range(3)]
        ilo = [bounds_ref[6 + k, pid] for k in range(3)]
        ihi = [bounds_ref[9 + k, pid] for k in range(3)]
        tlo = bounds_ref[12, pid]
        thi = bounds_ref[13, pid]
        cap0 = jnp.minimum(bounds_ref[14, pid], thi)

        fresh = sid != prev_ref[0]
        prev_ref[0] = sid

        tdma = pltpu.make_async_copy(
            tris_ref.at[pl.ds(sid * tile_rows, tile_rows), :],
            tscr, sem_t,
        )
        ndma = pltpu.make_async_copy(
            subn_ref.at[pl.ds(sid * node_rows, node_rows), :],
            nscr, sem_n,
        )

        @pl.when(fresh)
        def _():
            tdma.start()
            ndma.start()
            ndma.wait()

        # dequant constants from the spare node slot (pack_streamed);
        # nscr persists across same-subtree blocks, so reading outside
        # the fresh-branch is correct
        dq = (
            tuple(nscr[node_rows - 1, 120 + k] for k in range(6))
            if quantized else None
        )

        def node_test(bmn3, bmx3, cap):
            # shared conservative packet-vs-AABB test (traverse_pallas2)
            return interval_node_test_entry(
                bmn3, bmx3, olo, ohi, ilo, ihi, tlo, thi, cap
            )[0]

        def flush(count, cap, nhit, waited):
            @pl.when(~waited)
            def _():
                tdma.wait()

            if shadow:
                def lf(j, _):
                    ll = lst[j]
                    tile = tscr[pl.ds(ll * 16, 16), :]
                    if quantized:
                        tile = dequant_tile(tile, dq)
                    hit_any = _mt_leaf_any(
                        tile,
                        rox, roy, roz, rdx, rdy, rdz, tmin,
                        jnp.minimum(tb_ref[:, :], tmax),
                    )
                    row_ref[:, :] = jnp.where(
                        hit_any, (sid * sub_leaves + ll) * LEAF, row_ref[:, :]
                    )
                    return 0

                jax.lax.fori_loop(0, count, lf, 0, unroll=False)
                nhit = jnp.sum(
                    ((row_ref[:, :] >= 0) | (tmax <= tmin)).astype(jnp.int32)
                )
            else:
                def lf(j, _):
                    ll = lst[j]
                    tile = tscr[pl.ds(ll * 16, 16), :]
                    if quantized:
                        tile = dequant_tile(tile, dq)
                    t_best, best_row, best_u, best_v = _mt_leaf(
                        tile,
                        rox, roy, roz, rdx, rdy, rdz, tmin, tmax, sub_iota,
                        sid * sub_leaves + ll,
                        tb_ref[:, :], row_ref[:, :], u_ref[:, :], v_ref[:, :],
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
            (jnp.int32(0), jnp.int32(0), cap0, jnp.int32(0),
             jnp.logical_not(fresh)),
        )
        # final flush always runs: flushes the tail and consumes the tile
        # DMA wait when no in-walk flush happened (semaphore balance)
        flush(count, cap, nhit, waited)
        write_out()


@functools.partial(
    jax.jit, static_argnames=("block", "shadow", "interpret", "sub_leaves")
)
def _dispatch_binned(sid_blk, sub_nodes, tri_tiles, padded,
                     block: int, shadow: bool, interpret: bool = False,
                     sub_leaves: int = SUB_LEAVES):
    n_pad = padded.shape[1]
    nb = n_pad // block
    grid = (nb,)
    padded = jax.lax.optimization_barrier(padded)
    bounds = _binned_bounds(padded, block)
    sid_blk = sid_blk.reshape(1, nb)
    quantized = tri_tiles.dtype == jnp.int16
    kernel = functools.partial(
        _kernel_binned, block=block, shadow=shadow, quantized=quantized,
        sub_leaves=sub_leaves,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (16, nb), lambda i: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, nb), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (12, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (4, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((LIST_CAP,), jnp.int32),
            pltpu.SMEM((node_rows_for(sub_leaves), 128), jnp.float32),
            pltpu.VMEM(
                (sub_leaves * 16, 128),
                jnp.int16 if quantized else jnp.float32,
            ),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.int32),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((4, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(bounds, sid_blk, sub_nodes, tri_tiles, padded)


def _coherence_perm(bb, rays):
    """One up-front (octant, origin-morton) ordering so stable binning
    keeps blocks octant-pure and origin-local; dead lanes last (the
    shared traverse_stream.coherence_order contract)."""
    comps = tuple(rays[k] for k in range(6))
    perm, inv = ts_coherence_order(
        _coherence_key(bb, comps), ~(rays[7] > rays[6])
    )
    return rays[:, perm], inv


def _run_rounds(bb: StreamedBVHBuffers, rays, block: int, rounds: int,
                shadow: bool, interpret: bool):
    """Shared driver: coherence-sort once, run ``rounds`` binned rounds,
    then one cleanup launch through the plain streamed kernel for rays
    with remaining candidate subtrees. Returns (4, N) best in the
    caller's lane order."""
    n = rays.shape[1]
    sb = subtree_bounds(bb)
    s = sb.shape[0]
    n_pad = ((n + (s + 1) * (block - 1)) // block + 1) * block

    rays, inv = _coherence_perm(bb, rays)
    entry = _entry_table(sb, rays)

    best = jnp.concatenate(
        [
            jnp.full((1, n), _INF, jnp.float32),
            jax.lax.bitcast_convert_type(
                jnp.full((1, n), -1, jnp.int32), jnp.float32
            ),
            jnp.zeros((2, n), jnp.float32),
        ],
        axis=0,
    )
    last_e = jnp.full((n,), -_INF, jnp.float32)
    last_s = jnp.full((n,), -1, jnp.int32)

    init_padded = jnp.zeros((12, n_pad), jnp.float32)
    # padding slots: dead rays (tmax=0) + miss-encoded best
    init_padded = init_padded.at[8, :].set(_INF)
    init_padded = init_padded.at[9, :].set(
        jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)
    )

    for _ in range(rounds):
        cap = jnp.minimum(best[0], rays[7])
        if shadow:
            # blocked lanes are done regardless of t
            blocked = (
                jax.lax.bitcast_convert_type(best[1], jnp.int32) >= 0
            )
            cap = jnp.where(blocked, -_INF, cap)
        sid, mt = _next_subtree(entry, last_e, last_s, cap)
        perm, spos, valid, pos, sid_blk = _bin_layout(sid, s, block, n_pad)
        stack = jnp.concatenate([rays, best], axis=0)
        padded = _pad_operand(stack, init_padded, perm, spos, valid)
        out = _dispatch_binned(
            sid_blk, bb.sub_nodes, bb.tri_tiles, padded,
            block=block, shadow=shadow, interpret=interpret,
            sub_leaves=bb.sub_leaves,
        )
        best = out[:, pos]
        last_e = jnp.where(sid >= 0, mt, jnp.float32(_INF))
        last_s = jnp.where(sid >= 0, sid, last_s)

    # cleanup: rays with an unvisited subtree still in front of the best
    cap = jnp.minimum(best[0], rays[7])
    if shadow:
        blocked = jax.lax.bitcast_convert_type(best[1], jnp.int32) >= 0
        cap = jnp.where(blocked, -_INF, cap)
    sid, _ = _next_subtree(entry, last_e, last_s, cap)
    live = sid >= 0
    tmax_eff = jnp.where(live, cap, 0.0)
    clean_rays = jnp.concatenate(
        [rays[0:7], tmax_eff[None]], axis=0
    )
    out = _traverse_streamed(
        bb.top_nodes, bb.sub_nodes, bb.tri_tiles, clean_rays,
        top_nodes=bb.num_top_nodes, block=block,
        shadow_from=0 if shadow else -1, interpret=interpret,
        sub_leaves=bb.sub_leaves,
    )
    crow = jax.lax.bitcast_convert_type(out[1], jnp.int32)
    improved = live & (crow >= 0)
    best = jnp.where(improved[None], out, best)
    return best[:, inv]


K_MAX = 8  # multi-slot visit budget per ray; overflow rays take the
# packet-walk cleanup (p90 subtree overlap measured 8-9 on 500k terrain)


def _run_multislot(bb: StreamedBVHBuffers, rays, block: int, k_max: int,
                   interpret: bool):
    """All-overlaps closest hit in ONE binned launch.

    Measured on 500k-tri terrain: early termination almost never engages
    for closest hits (subtree AABBs overlap; mean 5.4 of 5.7 overlapped
    subtrees sit in front of the final hit), so ordered per-round
    visiting converges at full cost. Instead each ray occupies one SLOT
    per overlapped subtree (up to ``k_max``), all slots run in a single
    binned kernel launch (each subtree's tile still DMAs at most once),
    and the per-ray closest is reduced with scatter-min passes — no
    full-width lane gathers. Rays overlapping more than ``k_max``
    subtrees finish in a packet-walk cleanup capped by their merged t.
    """
    n = rays.shape[1]
    sb = subtree_bounds(bb)
    s = sb.shape[0]
    kn = k_max * n
    t_pad = ((kn + (s + 1) * (block - 1)) // block + 1) * block

    rays, inv = _coherence_perm(bb, rays)
    entry = _entry_table(sb, rays)

    hit = entry < rays[7][None]  # within the ray segment
    c = jnp.cumsum(hit.astype(jnp.int32), axis=0)
    sid_iota = jax.lax.broadcasted_iota(jnp.int32, entry.shape, 0)
    sids = [
        jnp.min(jnp.where(hit & (c == k + 1), sid_iota, s), axis=0)
        for k in range(k_max)
    ]
    sid_dup = jnp.concatenate(sids)  # (K*N,) with s = empty slot
    overflow = c[-1] > k_max

    sid_dup = jnp.where(sid_dup >= s, -1, sid_dup)
    perm, spos, valid, pos, sid_blk = _bin_layout(sid_dup, s, block, t_pad)

    init_padded = jnp.zeros((12, t_pad), jnp.float32)
    init_padded = init_padded.at[8, :].set(_INF)
    init_padded = init_padded.at[9, :].set(
        jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)
    )
    stack = jnp.tile(rays, (1, k_max))
    stack = jnp.concatenate(
        [
            stack,
            jnp.full((1, kn), _INF, jnp.float32),
            jax.lax.bitcast_convert_type(
                jnp.full((1, kn), -1, jnp.int32), jnp.float32
            ),
            jnp.zeros((2, kn), jnp.float32),
        ],
        axis=0,
    )
    padded = _pad_operand(stack, init_padded, perm, spos, valid)
    out = _dispatch_binned(
        sid_blk, bb.sub_nodes, bb.tri_tiles, padded,
        block=block, shadow=False, interpret=interpret,
        sub_leaves=bb.sub_leaves,
    )

    # merge: gather every slot's result back to (4, K, N) with ONE
    # packed 2-D gather (pos maps source slot k*N+i -> padded slot),
    # mask empty slots to misses, and reduce over K with a where-chain —
    # no scatters anywhere (see _bin_layout's measurement note)
    slots = out[:, pos]  # (4, K*N) slot-order results
    empty = (sid_dup < 0).reshape(k_max, n)
    t_k = jnp.where(empty, _INF, slots[0].reshape(k_max, n))
    best_t = jnp.full((n,), _INF, jnp.float32)
    best_row = jnp.full((n,), -1, jnp.int32)
    best_u = jnp.zeros((n,), jnp.float32)
    best_v = jnp.zeros((n,), jnp.float32)
    row_k = jax.lax.bitcast_convert_type(slots[1], jnp.int32).reshape(
        k_max, n
    )
    u_k = slots[2].reshape(k_max, n)
    v_k = slots[3].reshape(k_max, n)
    for k in range(k_max):
        # strict < keeps the lowest-k (nearest-entry) winner on exact-t
        # ties across subtrees — both are valid (same contract as the
        # per-round visitor); misses carry t=INF and never win
        better = (t_k[k] < best_t) & (row_k[k] >= 0)
        best_t = jnp.where(better, t_k[k], best_t)
        best_row = jnp.where(better, row_k[k], best_row)
        best_u = jnp.where(better, u_k[k], best_u)
        best_v = jnp.where(better, v_k[k], best_v)
    best = jnp.stack(
        [
            jnp.where(best_row < 0, _INF, best_t),
            jax.lax.bitcast_convert_type(best_row, jnp.float32),
            best_u,
            best_v,
        ],
        axis=0,
    )

    # cleanup for overflow rays, capped by the merged best
    cap = jnp.minimum(best[0], rays[7])
    tmax_eff = jnp.where(overflow, cap, 0.0)
    clean_rays = jnp.concatenate([rays[0:7], tmax_eff[None]], axis=0)
    out2 = _traverse_streamed(
        bb.top_nodes, bb.sub_nodes, bb.tri_tiles, clean_rays,
        top_nodes=bb.num_top_nodes, block=block, interpret=interpret,
        sub_leaves=bb.sub_leaves,
    )
    crow = jax.lax.bitcast_convert_type(out2[1], jnp.int32)
    improved = overflow & (crow >= 0)
    best = jnp.where(improved[None], out2, best)
    return best[:, inv]


def closest_hit_binned_all(
    bb: StreamedBVHBuffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, map_tri: bool = True,
    k_max: int = K_MAX,
):
    """Closest hit via the single-launch multi-slot binned traversal."""
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    best = _run_multislot(bb, rays, block, k_max, interpret=INTERPRET)
    return _out_to_hit(bb, best, n, map_tri)


def closest_hit_binned(
    bb: StreamedBVHBuffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, map_tri: bool = True,
    rounds: int = DEFAULT_ROUNDS,
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    best = _run_rounds(
        bb, rays, block, rounds, shadow=False, interpret=INTERPRET
    )
    return _out_to_hit(bb, best, n, map_tri)


def occluded_binned(
    bb: StreamedBVHBuffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, rounds: int = DEFAULT_ROUNDS,
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    best = _run_rounds(
        bb, rays, block, rounds, shadow=True, interpret=INTERPRET
    )
    return jax.lax.bitcast_convert_type(best[1, :n], jnp.int32) >= 0
