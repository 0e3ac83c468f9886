"""Pallas TPU traversal kernel v3: flat vectorized leaf cull.

The v2 kernel (ops/traverse_pallas2.py) walks the BVH with a pure-scalar
cursor — ~50 cycles per node step. On real-scene bounce queues that walk
is the boat anchor: the village block sweep (prof/prof_r4_block.py)
measured the flush term flat from block 512 to 1024 (per-block packet
bounds SATURATE — every block flushes most leaves any of its rays need)
while halving the block size to tighten bounds multiplied the ~60-70 us
per-block walk into dominance. The walk prevents exactly the fix the
flush needs: smaller ray groups.

v3 deletes the tree walk. The scene's LEAF AABBs live as a dense
(16, Lpad) VMEM array and every block tests ALL of them on the VPU in a
few hundred vector ops — a brute-force broad phase that costs less than
walking even ONE tree path scalar-ly. The test runs at QUARTER-block
granularity (4 sub-packets of block/4 lanes, bounds reduced in XLA like
block_bounds): the (4, Lpad) hit mask is packed into a 4-bit-per-leaf
(1, Lpad) row, DMA'd to SMEM, and a scalar scan flushes each surviving
leaf with Moller-Trumbore ONLY on the quarters that intersect it.
Compared to v2 on saturated queues this cuts per-lane flush work by the
quarter-mask density and removes the per-node scalar serialization
entirely; the only remaining scalar work is the ~L-iteration scan
(~4 cycles per leaf).

Exactness: the per-quarter interval test is the SAME conservative
packet-vs-AABB predicate v2 evaluates per tree node (a leaf's mask
covers every lane whose exact segment pierces the leaf box), and the
``_mt_leaf`` merge is order-independent (lower row wins exact-t ties),
so per-ray results are bit-identical to v2/v1 regardless of flush
order.

Trade-off: v3 has no shrinking-t cap during the scan (v2 refreshes a
scalar cap every LIST_CAP leaves), so coherent all-hit queues can flush
more leaves than v2 culls. Two attempts to restore a cap were measured
and REJECTED on chip (BASELINE.md round-4 ledger): a 4-band scalar
front-to-back scan (per-leaf SMEM entry-t reads quadrupled the scan,
20-60% slower) and a two-phase near/far split with one vectorized cap
prune (neutral on bounce/shadow, slightly negative on primaries — sky
lanes keep the per-quarter cap at tmax, so the prune drops nothing and
the extra mask pass + SMEM copy is pure overhead). The plain ascending
scan stands.

Reference semantics: inline ray-query traversal of
``pt_megakernel.glsl:440-478`` — expressed as a TPU-native broad phase
instead of a pointer walk (the reference delegates this loop to the RT
hardware; there is no GLSL counterpart to copy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
    LEAF,
    PallasBVH2Buffers,
    _mt_leaf,
    _mt_leaf_any,
    _out_to_hit,
    block_bounds,
)

try:  # pallas requires the TPU backend; keep CPU test runs importable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

DEFAULT_BLOCK = 512
QUARTERS = 4  # default sub-packet flush granularity (block // 4 lanes);
# kernels take a ``groups`` override — finer groups tighten the per-group
# packet bounds (fewer leaves flushed per lane) at the cost of a
# proportionally longer broad phase and more per-leaf scan branches. The
# floor is block // groups >= 128 (the MT wants full 128-lane rows).
_INF = 2.0e32

# per-launch grid cap (see traverse_pallas2.MAX_BLOCKS)
MAX_BLOCKS = 1024

INTERPRET = False


def leaf_aabbs_for(bb: PallasBVH2Buffers, tb_nodes: np.ndarray = None,
                   leaf_count: int = None) -> jnp.ndarray:
    """(16, Lpad) leaf-AABB rows for the flat cull: rows 0-2 min, 3-5
    max, padding slots get an empty box (min=+big > max=-big, so the
    interval test can never pass them). Built from the packed leaf tiles
    (exact union of the leaf's real triangles; zero-padded slots of the
    tail tile are excluded via row_tri validity)."""
    tiles = np.asarray(bb.tri_tiles, np.float32)
    ls = bb.leaf_size
    lpt = LEAF // ls
    nt = tiles.shape[0] // 16
    t = tiles.reshape(nt, 16, LEAF)
    v0 = t[:, 0:3, :]
    v1 = v0 + t[:, 3:6, :]
    v2 = v0 + t[:, 6:9, :]
    # a padded slot is all-zero (v0=e1=e2=0); real triangles can be
    # degenerate at the origin too, but including a zero-point in a real
    # leaf's box only loosens it conservatively. Exclude TAIL padding
    # exactly: rows past the last real row belong to no leaf.
    n_rows = bb.row_tri.shape[0]
    L = n_rows // ls
    lo = np.minimum(np.minimum(v0, v1), v2)  # (nt, 3, 128)
    hi = np.maximum(np.maximum(v0, v1), v2)
    # per-sub-leaf reduction: (nt, 3, lpt, ls) -> (nt, lpt, 3)
    lo = lo.reshape(nt, 3, lpt, ls).min(axis=3).transpose(0, 2, 1)
    hi = hi.reshape(nt, 3, lpt, ls).max(axis=3).transpose(0, 2, 1)
    lo = lo.reshape(nt * lpt, 3)[:L]
    hi = hi.reshape(nt * lpt, 3)[:L]
    # rows with any real (non-degenerate-padding) triangle: a leaf whose
    # rows are ALL zero-padding is the tail tile's empty band
    big = np.float32(3.0e38)
    lpad = -(-L // 128) * 128
    out = np.zeros((16, lpad), np.float32)
    out[0:3, :] = big
    out[3:6, :] = -big
    out[0:3, :L] = lo.T
    out[3:6, :L] = hi.T
    return jnp.asarray(out)


def _quarter_bounds(rays: jnp.ndarray, block: int,
                    groups: int = QUARTERS) -> jnp.ndarray:
    """Per-group packet bounds, (16, nb*groups) like block_bounds — rides
    as a whole-array SMEM operand; the kernel reads group qi of block
    pid at column groups*pid + qi and broadcasts the scalars against the
    (1, Lpad) leaf rows."""
    return block_bounds(rays, block // groups)


def _kernel3(bounds_ref, qb_ref, aabb_ref, tris_ref, rays_ref, out_ref,
             mrow_ref, msum_ref, mask_ref, sem_m,
             tb_ref, row_ref, u_ref, v_ref, tile_ref=None, sem_t=None,
             *, num_leaves: int, block: int, shadow_from: int = -1,
             leaf_size: int = LEAF, stream: bool = False,
             groups: int = QUARTERS):
    b = block
    q = b // groups
    pid = pl.program_id(0)
    lpt = LEAF // leaf_size
    lpad = aabb_ref.shape[1]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (leaf_size, 1), 0)

    # group-major layout: the HOST retiles each (1, B) lane row to
    # (groups, B/groups) before the launch (see _traverse3) so group qi
    # is SUBLANE row qi of the (8*groups, q) operand. In-kernel
    # lane->sublane reshapes are exactly the "unsupported shape cast"
    # Mosaic rejects; sublane slices of a pre-tiled operand lower
    # natively.
    Q = groups
    rox = rays_ref[0 * Q:1 * Q, :]
    roy = rays_ref[1 * Q:2 * Q, :]
    roz = rays_ref[2 * Q:3 * Q, :]
    rdx = rays_ref[3 * Q:4 * Q, :]
    rdy = rays_ref[4 * Q:5 * Q, :]
    rdz = rays_ref[5 * Q:6 * Q, :]
    tmin = rays_ref[6 * Q:7 * Q, :]
    tmax = rays_ref[7 * Q:8 * Q, :]

    tb_ref[:, :] = tmax
    row_ref[:, :] = jnp.full((groups, q), -1, jnp.int32)
    u_ref[:, :] = jnp.zeros((groups, q), jnp.float32)
    v_ref[:, :] = jnp.zeros((groups, q), jnp.float32)

    is_shadow = pid >= shadow_from if shadow_from >= 0 else None

    # dead-block fast path: the coherence sort (dead lanes LAST) packs
    # trailing blocks all-dead at deep bounces; their block_bounds give
    # thi <= tlo, and the whole broad phase (4 quarters x L leaves of
    # vector work) is skipped — the block costs only the scratch init
    # and the final out write
    block_live = bounds_ref[13, pid] > bounds_ref[12, pid]
    msum_ref[0, 0] = 0

    @pl.when(block_live)
    def _broad_phase():
        # ---- vectorized broad phase: ALL leaves per quarter, one
        # (1, Lpad) vector pass per quarter with the quarter's SCALAR
        # packet bounds (SMEM column 4*pid + qi of the
        # block_bounds(block//4) operand)
        bmn = [aabb_ref[k:k + 1, :] for k in range(3)]  # (1, Lpad) rows
        bmx = [aabb_ref[3 + k:4 + k, :] for k in range(3)]
        mrow = jnp.zeros((1, lpad), jnp.int32)
        for qi in range(groups):
            col = groups * pid + qi
            tlo_q = qb_ref[12, col]
            thi_q = qb_ref[13, col]
            U = jnp.full((1, lpad), thi_q)
            Lb = jnp.full((1, lpad), tlo_q)
            expand_ok = jnp.full((1, lpad), True)
            for k in range(3):
                olo_k = qb_ref[k, col]
                ohi_k = qb_ref[3 + k, col]
                ilo_k = qb_ref[6 + k, col]
                ihi_k = qb_ref[9 + k, col]
                alo = bmn[k] - ohi_k  # (1, Lpad)
                ahi = bmn[k] - olo_k
                blo = bmx[k] - ohi_k
                bhi = bmx[k] - olo_k
                t0lo = jnp.minimum(
                    jnp.minimum(alo * ilo_k, alo * ihi_k),
                    jnp.minimum(ahi * ilo_k, ahi * ihi_k),
                )
                t0hi = jnp.maximum(
                    jnp.maximum(alo * ilo_k, alo * ihi_k),
                    jnp.maximum(ahi * ilo_k, ahi * ihi_k),
                )
                t1lo = jnp.minimum(
                    jnp.minimum(blo * ilo_k, blo * ihi_k),
                    jnp.minimum(bhi * ilo_k, bhi * ihi_k),
                )
                t1hi = jnp.maximum(
                    jnp.maximum(blo * ilo_k, blo * ihi_k),
                    jnp.maximum(bhi * ilo_k, bhi * ihi_k),
                )
                Lb = jnp.maximum(Lb, jnp.minimum(t0lo, t1lo))
                U = jnp.minimum(U, jnp.maximum(t0hi, t1hi))
                expand_ok = expand_ok & (jnp.maximum(alo, -bhi) <= thi_q)
            live_q = (Lb <= U) & expand_ok & (thi_q > tlo_q)  # (1, Lpad)
            mrow = mrow + live_q.astype(jnp.int32) * (1 << qi)

        mrow_ref[:, :] = mrow
        msum_ref[0, 0] = jnp.sum(mrow)
        cp = pltpu.make_async_copy(mrow_ref, mask_ref, sem_m)
        cp.start()
        cp.wait()

    def mt_quarter(tile, gid, qi):
        sl = slice(qi, qi + 1)
        t_best, best_row, best_u, best_v = _mt_leaf(
            tile,
            rox[sl, :], roy[sl, :], roz[sl, :],
            rdx[sl, :], rdy[sl, :], rdz[sl, :],
            tmin[sl, :], tmax[sl, :], sub_iota,
            gid, tb_ref[sl, :], row_ref[sl, :],
            u_ref[sl, :], v_ref[sl, :],
            leaf_size=leaf_size,
        )
        tb_ref[sl, :] = t_best
        row_ref[sl, :] = best_row
        u_ref[sl, :] = best_u
        v_ref[sl, :] = best_v

    def mt_quarter_any(tile, gid, qi):
        sl = slice(qi, qi + 1)
        hit_any = _mt_leaf_any(
            tile,
            rox[sl, :], roy[sl, :], roz[sl, :],
            rdx[sl, :], rdy[sl, :], rdz[sl, :],
            tmin[sl, :],
            jnp.minimum(tb_ref[sl, :], tmax[sl, :]),
            leaf_id=gid, leaf_size=leaf_size,
        )
        row_ref[sl, :] = jnp.where(
            hit_any, gid * leaf_size, row_ref[sl, :]
        )

    def scan_closest(_):
        def body(leaf_id, carry):
            m = mask_ref[0, leaf_id]

            @pl.when(m > 0)
            def _():
                tile = tris_ref[pl.ds((leaf_id // lpt) * 16, 16), :]
                for qi in range(groups):
                    @pl.when((m >> qi) & 1 != 0)
                    def _(qi=qi):
                        mt_quarter(tile, leaf_id, qi)

            return carry

        jax.lax.fori_loop(0, num_leaves, body, 0, unroll=False)

    def scan_shadow(_):
        # early exit once every lane is resolved; the check costs one
        # vector->scalar sync, so it runs every 16 flushed leaves
        def cond(c):
            return (c[0] < num_leaves) & (c[2] < b)

        def body(c):
            leaf_id, since, nhit = c
            m = mask_ref[0, leaf_id]

            @pl.when(m > 0)
            def _():
                tile = tris_ref[pl.ds((leaf_id // lpt) * 16, 16), :]
                for qi in range(groups):
                    @pl.when((m >> qi) & 1 != 0)
                    def _(qi=qi):
                        mt_quarter_any(tile, leaf_id, qi)

            since = since + (m > 0).astype(jnp.int32)
            refresh = since >= 16
            nhit = jax.lax.cond(
                refresh,
                lambda: jnp.sum(
                    ((row_ref[:, :] >= 0) | (tmax <= tmin)).astype(jnp.int32)
                ),
                lambda: nhit,
            )
            since = jnp.where(refresh, 0, since)
            return (leaf_id + 1, since, nhit)

        jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        )

    # ---- streamed scans: tri tiles live in HBM; each surviving leaf's
    # 8 KB tile is DMA'd into a two-slot VMEM ring, double-buffered so
    # the copy of survivor k+1 flies while survivor k's Moller-Trumbore
    # flush runs. Requires leaf_size == 128 (one tile per leaf).
    def _issue(leaf_id, slot):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(leaf_id * 16, 16), :],
            tile_ref.at[pl.ds(slot * 16, 16), :],
            sem_t.at[slot],
        ).start()

    def _wait_tile(leaf_id, slot):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(leaf_id * 16, 16), :],
            tile_ref.at[pl.ds(slot * 16, 16), :],
            sem_t.at[slot],
        ).wait()
        return tile_ref[pl.ds(slot * 16, 16), :]

    def _flush_stream(pending, slot, mp, any_hit):
        tile = _wait_tile(pending, slot)
        for qi in range(groups):
            @pl.when((mp >> qi) & 1 != 0)
            def _(qi=qi):
                if any_hit:
                    mt_quarter_any(tile, pending, qi)
                else:
                    mt_quarter(tile, pending, qi)

    def scan_closest_stream(_):
        def body(leaf_id, carry):
            pending, mp, k = carry
            m = mask_ref[0, leaf_id]
            take = m > 0

            @pl.when(take)
            def _():
                _issue(leaf_id, jax.lax.rem(k, 2))

            @pl.when(take & (pending >= 0))
            def _():
                _flush_stream(pending, jax.lax.rem(k + 1, 2), mp, False)

            pending = jnp.where(take, leaf_id, pending)
            mp = jnp.where(take, m, mp)
            return (pending, mp, k + take.astype(jnp.int32))

        pending, mp, k = jax.lax.fori_loop(
            0, num_leaves, body,
            (jnp.int32(-1), jnp.int32(0), jnp.int32(0)), unroll=False,
        )

        @pl.when(pending >= 0)
        def _():
            _flush_stream(pending, jax.lax.rem(k + 1, 2), mp, False)

    def scan_shadow_stream(_):
        # same pipeline + the every-16-flushes all-resolved early exit;
        # the final pl.when drains the in-flight DMA even on early exit
        def cond(c):
            return (c[0] < num_leaves) & (c[5] < b)

        def body(c):
            leaf_id, pending, mp, k, since, nhit = c
            m = mask_ref[0, leaf_id]
            take = m > 0

            @pl.when(take)
            def _():
                _issue(leaf_id, jax.lax.rem(k, 2))

            @pl.when(take & (pending >= 0))
            def _():
                _flush_stream(pending, jax.lax.rem(k + 1, 2), mp, True)

            pending = jnp.where(take, leaf_id, pending)
            mp = jnp.where(take, m, mp)
            k = k + take.astype(jnp.int32)
            since = since + take.astype(jnp.int32)
            refresh = since >= 16
            nhit = jax.lax.cond(
                refresh,
                lambda: jnp.sum(
                    ((row_ref[:, :] >= 0) | (tmax <= tmin)).astype(jnp.int32)
                ),
                lambda: nhit,
            )
            since = jnp.where(refresh, 0, since)
            return (leaf_id + 1, pending, mp, k, since, nhit)

        leaf_id, pending, mp, k, since, nhit = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(-1), jnp.int32(0), jnp.int32(0),
             jnp.int32(0), jnp.int32(0)),
        )

        @pl.when(pending >= 0)
        def _():
            _flush_stream(pending, jax.lax.rem(k + 1, 2), mp, True)

    if stream:
        scan_closest = scan_closest_stream  # noqa: F811
        scan_shadow = scan_shadow_stream  # noqa: F811

    any_live = msum_ref[0, 0] > 0
    if shadow_from < 0:
        pl.when(any_live)(lambda: scan_closest(0))
    elif shadow_from == 0:
        pl.when(any_live)(lambda: scan_shadow(0))
    else:
        @pl.when(any_live)
        def _():
            jax.lax.cond(is_shadow, scan_shadow, scan_closest, 0)

    # quarter-major output (16, q): rows [0:4) = t per quarter,
    # [4:8) = winning-row bits, [8:12) = u, [12:16) = v; the host
    # untiles back to (4, B) lane-major (see _traverse3)
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
        "num_leaves", "block", "shadow_from", "interpret", "leaf_size",
        "stream", "groups",
    ),
)
def _traverse3(aabbs, tri_tiles, rays, num_leaves: int, block: int,
               shadow_from: int = -1, interpret: bool = False,
               leaf_size: int = LEAF, stream: bool = False,
               groups: int = QUARTERS):
    if block % (groups * 128) != 0:
        raise ValueError(
            f"v3 flat-cull block must be a multiple of {groups * 128} "
            f"(group rows ride 128-wide lanes), got {block}"
        )
    if stream and leaf_size != LEAF:
        raise ValueError(
            f"streamed v3 needs leaf_size == {LEAF} (one 8 KB HBM tile "
            f"per leaf), got {leaf_size}"
        )
    n = rays.shape[1]
    nb = n // block
    if nb > MAX_BLOCKS:
        outs = []
        for s in range(0, nb, MAX_BLOCKS):
            e = min(s + MAX_BLOCKS, nb)
            if shadow_from < 0 or shadow_from - s >= e - s:
                sf = -1
            else:
                sf = max(0, shadow_from - s)
            outs.append(
                _traverse3(
                    aabbs, tri_tiles, rays[:, s * block:e * block],
                    num_leaves=num_leaves, block=block, shadow_from=sf,
                    interpret=interpret, leaf_size=leaf_size, stream=stream,
                    groups=groups,
                )
            )
        return jnp.concatenate(outs, axis=1)
    # barrier: see traverse_pallas2._traverse2
    rays = jax.lax.optimization_barrier(rays)
    bounds = block_bounds(rays, block)
    qb = _quarter_bounds(rays, block, groups)
    lpad = aabbs.shape[1]
    q = block // groups
    # host-side group retile (see _kernel3): (8, n) lane-major ->
    # (8*groups, n/groups) where row c*G+qi, col i*q+j holds
    # rays[c, i*block + qi*q + j]. A middle-axis transpose (minor dim q
    # stays contiguous) XLA handles cheaply; in-kernel it is an
    # unsupported lane->sublane shape cast on Mosaic.
    rays_q = jnp.reshape(
        jnp.transpose(
            jnp.reshape(rays, (8, nb, groups, q)), (0, 2, 1, 3)
        ),
        (8 * groups, nb * q),
    )
    grid = (nb,)
    kernel = functools.partial(
        _kernel3, num_leaves=num_leaves, block=block,
        shadow_from=shadow_from, leaf_size=leaf_size, stream=stream,
        groups=groups,
    )
    scratch = [
        pltpu.VMEM((1, lpad), jnp.int32),  # packed quarter-mask row
        pltpu.SMEM((1, 1), jnp.int32),  # total live (block skip)
        pltpu.SMEM((1, lpad), jnp.int32),  # mask landed for the scan
        pltpu.SemaphoreType.DMA(()),
        pltpu.VMEM((groups, block // groups), jnp.float32),
        pltpu.VMEM((groups, block // groups), jnp.int32),
        pltpu.VMEM((groups, block // groups), jnp.float32),
        pltpu.VMEM((groups, block // groups), jnp.float32),
    ]
    if stream:
        # two-slot tile ring + per-slot DMA semaphores (double buffer)
        scratch += [
            pltpu.VMEM((2 * 16, LEAF), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        tiles_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    else:
        tiles_spec = pl.BlockSpec(
            tri_tiles.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
    out_q = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                bounds.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                qb.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(aabbs.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            tiles_spec,
            pl.BlockSpec((8 * groups, q), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4 * groups, q), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
        out_shape=jax.ShapeDtypeStruct((4 * groups, nb * q), jnp.float32),
        interpret=interpret,
    )(bounds, qb, aabbs, tri_tiles, rays_q)
    # untile the group-major output back to (4, n) lane-major
    return jnp.reshape(
        jnp.transpose(
            jnp.reshape(out_q, (4, groups, nb, q)), (0, 2, 1, 3)
        ),
        (4, n),
    )


class PallasBVH3Buffers:
    """PallasBVH2Buffers + the flat-cull leaf AABB array. Kept as a thin
    wrapper (not a NamedTuple clone) so existing v2 entry points accept
    the same object via duck typing."""

    def __init__(self, bb: PallasBVH2Buffers, stream: bool = False):
        self.bb = bb
        self.aabbs = leaf_aabbs_for(bb)
        self.num_leaves = bb.row_tri.shape[0] // bb.leaf_size
        # scene box for the coherence sort's morton grid = root AABB
        self.scene_lo = bb.nodes[0, 0:3]
        self.scene_hi = bb.nodes[0, 3:6]
        # stream=True: tri tiles stay in HBM; the kernel DMAs each
        # surviving leaf's tile on demand (double-buffered). Lifts the
        # resident VMEM cap — the only remaining limits are the SMEM
        # mask row (~num_leaves * 4 B) and the leaf-scan length.
        self.stream = bool(stream)

    def __getattr__(self, name):
        if name == "bb":  # unflatten builds via object.__new__; don't
            raise AttributeError(name)  # recurse before bb is assigned
        return getattr(self.bb, name)


def _pb3_flatten(b):
    return (
        (b.bb, b.aabbs, b.scene_lo, b.scene_hi),
        (b.num_leaves, b.stream),
    )


def _pb3_unflatten(aux, children):
    obj = object.__new__(PallasBVH3Buffers)
    obj.bb, obj.aabbs, obj.scene_lo, obj.scene_hi = children
    obj.num_leaves, obj.stream = aux
    return obj


# pytree registration so DeviceScene.bvh stays device_put-able /
# tree_map-able when it carries the v3 wrapper (multi-device scene
# replication replicates the whole pytree per chip)
jax.tree_util.register_pytree_node(
    PallasBVH3Buffers, _pb3_flatten, _pb3_unflatten
)


def pack_for_pallas3(tb, stream: bool = False) -> PallasBVH3Buffers:
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
        pack_for_pallas2,
    )

    return PallasBVH3Buffers(pack_for_pallas2(tb), stream=stream)


def closest_hit_pallas3(
    bb: PallasBVH3Buffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, map_tri: bool = True,
    compact: bool = False, groups: int = QUARTERS,
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
        _compact,
        _uncompact,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    if compact:
        rays, inv = _compact(rays, bb.scene_lo, bb.scene_hi)
    out = _traverse3(
        bb.aabbs, bb.tri_tiles, rays, num_leaves=bb.num_leaves,
        block=block, interpret=INTERPRET, leaf_size=bb.leaf_size,
        stream=bool(getattr(bb, "stream", False)), groups=groups,
    )
    if compact:
        out = _uncompact(out, inv)
    return _out_to_hit(bb.bb, out, n, map_tri)


def occluded_pallas3(
    bb: PallasBVH3Buffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, compact: bool = False,
    groups: int = QUARTERS,
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
        _compact,
        _uncompact,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    if compact:
        rays, inv = _compact(rays, bb.scene_lo, bb.scene_hi)
    out = _traverse3(
        bb.aabbs, bb.tri_tiles, rays, num_leaves=bb.num_leaves,
        block=block, shadow_from=0, interpret=INTERPRET,
        leaf_size=bb.leaf_size,
        stream=bool(getattr(bb, "stream", False)), groups=groups,
    )
    if compact:
        rowbits = _uncompact(out[1:2], inv)[0, :n]
    else:
        rowbits = out[1, :n]
    return jax.lax.bitcast_convert_type(rowbits, jnp.int32) >= 0


def leaf_masks_xla(rays: jnp.ndarray, aabbs: jnp.ndarray, block: int,
                   groups: int = QUARTERS):
    """Per-ray broad phase, computed in XLA: EXACT slab test of every
    ray's own segment against every leaf AABB, OR-reduced to the kernel's
    flush granularity (block // groups lanes) and bit-packed to the v3
    mask-row format (bit qi of column l = group qi of the block flushes
    leaf l).

    Rationale (prof/prof_r5_density.py): the in-kernel broad phase tests
    the GROUP'S union box (origin box x inverse-direction interval)
    against each leaf — conservative interval arithmetic that multiplies
    origin spread by direction spread. On real bounce queues the union
    mask flushes several times more (leaf x group) pairs than the OR of
    the per-ray exact tests; each flushed pair costs a full
    (leaf_size, q) Moller-Trumbore, so mask looseness is frame time.
    The per-ray test is ~25 fused elementwise ops over (N, Lpad) — VPU
    work that XLA fuses into one pass, paid once per dispatch.

    Exactness: a lane's MT result depends only on leaves whose boxes its
    segment pierces; the per-ray slab test (same rounding-monotone
    interval arithmetic as the kernels, degenerate directions clamped to
    |d| >= 1e-20 exactly like block_bounds) covers every such leaf, and
    the OR over the group can only ADD leaves for other lanes. Removing
    never-pierced leaves cannot change any lane's winner (the _mt_leaf
    merge is order-independent), so v4 == v3 == v2 bit-exact.

    Returns (mask (nb, Lpad) i32, any_flag (nb,) f32 1.0/0.0).
    """
    n = rays.shape[1]
    q = block // groups
    g = n // q
    nb = n // block
    lpad = aabbs.shape[1]
    tmin, tmax = rays[6], rays[7]
    live = tmax > tmin
    valid = (aabbs[0] <= aabbs[3])[None, :]  # padding rows excluded
    tn = jnp.broadcast_to(tmin[:, None], (n, lpad))
    tf = jnp.broadcast_to(tmax[:, None], (n, lpad))
    for k in range(3):
        d = rays[3 + k]
        inv = (jnp.where(d >= 0.0, 1.0, -1.0)
               / jnp.maximum(jnp.abs(d), 1e-20))[:, None]
        o = rays[k][:, None]
        t0 = (aabbs[k][None, :] - o) * inv
        t1 = (aabbs[3 + k][None, :] - o) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    hit = (tn <= tf) & live[:, None] & valid
    hitg = jnp.any(hit.reshape(g, q, lpad), axis=1)  # (g, lpad)
    bits = hitg.reshape(nb, groups, lpad).astype(jnp.int32)
    w = (jnp.int32(1) << jnp.arange(groups, dtype=jnp.int32))[None, :, None]
    mask = jnp.sum(bits * w, axis=1)  # (nb, lpad)
    any_flag = jnp.max(mask, axis=1) > 0
    return mask, any_flag.astype(jnp.float32)


def _kernel4(bounds_ref, mask_ref, tris_ref, rays_ref, out_ref,
             tb_ref, row_ref, u_ref, v_ref,
             tile_ref=None, sem_t=None,
             *, num_leaves: int, block: int, shadow_from: int = -1,
             leaf_size: int = LEAF, stream: bool = False,
             groups: int = QUARTERS):
    """v4 = v3's flush scans fed by the PRECOMPUTED per-ray mask row
    (leaf_masks_xla) instead of the in-kernel union-box broad phase.
    The mask arrives as a per-block (8, Lpad) SMEM window (row 0 holds
    the packed bits; rows 1-7 are pad — Mosaic block shapes need
    sublane-8 alignment) and the scalar scan reads it in place: v4 has
    NO in-kernel broad phase and NO mask DMA. Scan/flush bodies match
    _kernel3 exactly (kept separate so v3 stays A/B-able unmodified)."""
    b = block
    q = b // groups
    pid = pl.program_id(0)
    lpt = LEAF // leaf_size
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (leaf_size, 1), 0)

    Q = groups
    rox = rays_ref[0 * Q:1 * Q, :]
    roy = rays_ref[1 * Q:2 * Q, :]
    roz = rays_ref[2 * Q:3 * Q, :]
    rdx = rays_ref[3 * Q:4 * Q, :]
    rdy = rays_ref[4 * Q:5 * Q, :]
    rdz = rays_ref[5 * Q:6 * Q, :]
    tmin = rays_ref[6 * Q:7 * Q, :]
    tmax = rays_ref[7 * Q:8 * Q, :]

    tb_ref[:, :] = tmax
    row_ref[:, :] = jnp.full((groups, q), -1, jnp.int32)
    u_ref[:, :] = jnp.zeros((groups, q), jnp.float32)
    v_ref[:, :] = jnp.zeros((groups, q), jnp.float32)

    is_shadow = pid >= shadow_from if shadow_from >= 0 else None
    any_live = bounds_ref[14, pid] > 0.5

    def mt_quarter(tile, gid, qi):
        sl = slice(qi, qi + 1)
        t_best, best_row, best_u, best_v = _mt_leaf(
            tile,
            rox[sl, :], roy[sl, :], roz[sl, :],
            rdx[sl, :], rdy[sl, :], rdz[sl, :],
            tmin[sl, :], tmax[sl, :], sub_iota,
            gid, tb_ref[sl, :], row_ref[sl, :],
            u_ref[sl, :], v_ref[sl, :],
            leaf_size=leaf_size,
        )
        tb_ref[sl, :] = t_best
        row_ref[sl, :] = best_row
        u_ref[sl, :] = best_u
        v_ref[sl, :] = best_v

    def mt_quarter_any(tile, gid, qi):
        sl = slice(qi, qi + 1)
        hit_any = _mt_leaf_any(
            tile,
            rox[sl, :], roy[sl, :], roz[sl, :],
            rdx[sl, :], rdy[sl, :], rdz[sl, :],
            tmin[sl, :],
            jnp.minimum(tb_ref[sl, :], tmax[sl, :]),
            leaf_id=gid, leaf_size=leaf_size,
        )
        row_ref[sl, :] = jnp.where(
            hit_any, gid * leaf_size, row_ref[sl, :]
        )

    def scan_closest(_):
        def body(leaf_id, carry):
            m = mask_ref[0, leaf_id]

            @pl.when(m > 0)
            def _():
                tile = tris_ref[pl.ds((leaf_id // lpt) * 16, 16), :]
                for qi in range(groups):
                    @pl.when((m >> qi) & 1 != 0)
                    def _(qi=qi):
                        mt_quarter(tile, leaf_id, qi)

            return carry

        jax.lax.fori_loop(0, num_leaves, body, 0, unroll=False)

    def scan_shadow(_):
        def cond(c):
            return (c[0] < num_leaves) & (c[2] < b)

        def body(c):
            leaf_id, since, nhit = c
            m = mask_ref[0, leaf_id]

            @pl.when(m > 0)
            def _():
                tile = tris_ref[pl.ds((leaf_id // lpt) * 16, 16), :]
                for qi in range(groups):
                    @pl.when((m >> qi) & 1 != 0)
                    def _(qi=qi):
                        mt_quarter_any(tile, leaf_id, qi)

            since = since + (m > 0).astype(jnp.int32)
            refresh = since >= 16
            nhit = jax.lax.cond(
                refresh,
                lambda: jnp.sum(
                    ((row_ref[:, :] >= 0) | (tmax <= tmin)).astype(jnp.int32)
                ),
                lambda: nhit,
            )
            since = jnp.where(refresh, 0, since)
            return (leaf_id + 1, since, nhit)

        jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        )

    def _issue(leaf_id, slot):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(leaf_id * 16, 16), :],
            tile_ref.at[pl.ds(slot * 16, 16), :],
            sem_t.at[slot],
        ).start()

    def _wait_tile(leaf_id, slot):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(leaf_id * 16, 16), :],
            tile_ref.at[pl.ds(slot * 16, 16), :],
            sem_t.at[slot],
        ).wait()
        return tile_ref[pl.ds(slot * 16, 16), :]

    def _flush_stream(pending, slot, mp, any_hit):
        tile = _wait_tile(pending, slot)
        for qi in range(groups):
            @pl.when((mp >> qi) & 1 != 0)
            def _(qi=qi):
                if any_hit:
                    mt_quarter_any(tile, pending, qi)
                else:
                    mt_quarter(tile, pending, qi)

    def scan_closest_stream(_):
        def body(leaf_id, carry):
            pending, mp, k = carry
            m = mask_ref[0, leaf_id]
            take = m > 0

            @pl.when(take)
            def _():
                _issue(leaf_id, jax.lax.rem(k, 2))

            @pl.when(take & (pending >= 0))
            def _():
                _flush_stream(pending, jax.lax.rem(k + 1, 2), mp, False)

            pending = jnp.where(take, leaf_id, pending)
            mp = jnp.where(take, m, mp)
            return (pending, mp, k + take.astype(jnp.int32))

        pending, mp, k = jax.lax.fori_loop(
            0, num_leaves, body,
            (jnp.int32(-1), jnp.int32(0), jnp.int32(0)), unroll=False,
        )

        @pl.when(pending >= 0)
        def _():
            _flush_stream(pending, jax.lax.rem(k + 1, 2), mp, False)

    def scan_shadow_stream(_):
        def cond(c):
            return (c[0] < num_leaves) & (c[5] < b)

        def body(c):
            leaf_id, pending, mp, k, since, nhit = c
            m = mask_ref[0, leaf_id]
            take = m > 0

            @pl.when(take)
            def _():
                _issue(leaf_id, jax.lax.rem(k, 2))

            @pl.when(take & (pending >= 0))
            def _():
                _flush_stream(pending, jax.lax.rem(k + 1, 2), mp, True)

            pending = jnp.where(take, leaf_id, pending)
            mp = jnp.where(take, m, mp)
            k = k + take.astype(jnp.int32)
            since = since + take.astype(jnp.int32)
            refresh = since >= 16
            nhit = jax.lax.cond(
                refresh,
                lambda: jnp.sum(
                    ((row_ref[:, :] >= 0) | (tmax <= tmin)).astype(jnp.int32)
                ),
                lambda: nhit,
            )
            since = jnp.where(refresh, 0, since)
            return (leaf_id + 1, pending, mp, k, since, nhit)

        leaf_id, pending, mp, k, since, nhit = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(-1), jnp.int32(0), jnp.int32(0),
             jnp.int32(0), jnp.int32(0)),
        )

        @pl.when(pending >= 0)
        def _():
            _flush_stream(pending, jax.lax.rem(k + 1, 2), mp, True)

    if stream:
        scan_closest = scan_closest_stream  # noqa: F811
        scan_shadow = scan_shadow_stream  # noqa: F811

    if shadow_from < 0:
        pl.when(any_live)(lambda: scan_closest(0))
    elif shadow_from == 0:
        pl.when(any_live)(lambda: scan_shadow(0))
    else:
        @pl.when(any_live)
        def _():
            jax.lax.cond(is_shadow, scan_shadow, scan_closest, 0)

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
        "num_leaves", "block", "shadow_from", "interpret", "leaf_size",
        "stream", "groups",
    ),
)
def _traverse4(aabbs, tri_tiles, rays, num_leaves: int, block: int,
               shadow_from: int = -1, interpret: bool = False,
               leaf_size: int = LEAF, stream: bool = False,
               groups: int = QUARTERS):
    if block % (groups * 128) != 0:
        raise ValueError(
            f"v4 pre-cull block must be a multiple of {groups * 128} "
            f"(group rows ride 128-wide lanes), got {block}"
        )
    if stream and leaf_size != LEAF:
        raise ValueError(
            f"streamed v4 needs leaf_size == {LEAF} (one 8 KB HBM tile "
            f"per leaf), got {leaf_size}"
        )
    n = rays.shape[1]
    nb = n // block
    if nb > MAX_BLOCKS:
        outs = []
        for s in range(0, nb, MAX_BLOCKS):
            e = min(s + MAX_BLOCKS, nb)
            if shadow_from < 0 or shadow_from - s >= e - s:
                sf = -1
            else:
                sf = max(0, shadow_from - s)
            outs.append(
                _traverse4(
                    aabbs, tri_tiles, rays[:, s * block:e * block],
                    num_leaves=num_leaves, block=block, shadow_from=sf,
                    interpret=interpret, leaf_size=leaf_size, stream=stream,
                    groups=groups,
                )
            )
        return jnp.concatenate(outs, axis=1)
    rays = jax.lax.optimization_barrier(rays)
    bounds = block_bounds(rays, block)
    mask, any_flag = leaf_masks_xla(rays, aabbs, block, groups)
    bounds = bounds.at[14].set(any_flag)
    lpad = aabbs.shape[1]
    # Mosaic SMEM windows need sublane-8-aligned block shapes: land the
    # (nb, Lpad) mask as (nb*8, Lpad) with the row in sublane 0 per block
    mask8 = jnp.pad(mask[:, None, :], ((0, 0), (0, 7), (0, 0))).reshape(
        nb * 8, lpad
    )
    q = block // groups
    rays_q = jnp.reshape(
        jnp.transpose(
            jnp.reshape(rays, (8, nb, groups, q)), (0, 2, 1, 3)
        ),
        (8 * groups, nb * q),
    )
    grid = (nb,)
    kernel = functools.partial(
        _kernel4, num_leaves=num_leaves, block=block,
        shadow_from=shadow_from, leaf_size=leaf_size, stream=stream,
        groups=groups,
    )
    scratch = [
        pltpu.VMEM((groups, block // groups), jnp.float32),
        pltpu.VMEM((groups, block // groups), jnp.int32),
        pltpu.VMEM((groups, block // groups), jnp.float32),
        pltpu.VMEM((groups, block // groups), jnp.float32),
    ]
    if stream:
        scratch += [
            pltpu.VMEM((2 * 16, LEAF), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        tiles_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    else:
        tiles_spec = pl.BlockSpec(
            tri_tiles.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
    out_q = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                bounds.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((8, lpad), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            tiles_spec,
            pl.BlockSpec((8 * groups, q), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4 * groups, q), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
        out_shape=jax.ShapeDtypeStruct((4 * groups, nb * q), jnp.float32),
        interpret=interpret,
    )(bounds, mask8, tri_tiles, rays_q)
    return jnp.reshape(
        jnp.transpose(
            jnp.reshape(out_q, (4, groups, nb, q)), (0, 2, 1, 3)
        ),
        (4, n),
    )


def closest_hit_pallas4(
    bb: PallasBVH3Buffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, map_tri: bool = True,
    compact: bool = False, groups: int = QUARTERS,
):
    """v3 entry point with the per-ray XLA pre-cull (leaf_masks_xla)."""
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
        _compact,
        _uncompact,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    if compact:
        rays, inv = _compact(rays, bb.scene_lo, bb.scene_hi)
    out = _traverse4(
        bb.aabbs, bb.tri_tiles, rays, num_leaves=bb.num_leaves,
        block=block, interpret=INTERPRET, leaf_size=bb.leaf_size,
        stream=bool(getattr(bb, "stream", False)), groups=groups,
    )
    if compact:
        out = _uncompact(out, inv)
    return _out_to_hit(bb.bb, out, n, map_tri)


def occluded_pallas4(
    bb: PallasBVH3Buffers, ro, rd, t_min=0.0, t_max=_INF,
    block: int = DEFAULT_BLOCK, comps=None, compact: bool = False,
    groups: int = QUARTERS,
):
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
        _compact,
        _uncompact,
    )

    rays, n = _prep_rays(ro, rd, t_min, t_max, block, comps=comps, wide=True)
    if compact:
        rays, inv = _compact(rays, bb.scene_lo, bb.scene_hi)
    out = _traverse4(
        bb.aabbs, bb.tri_tiles, rays, num_leaves=bb.num_leaves,
        block=block, shadow_from=0, interpret=INTERPRET,
        leaf_size=bb.leaf_size,
        stream=bool(getattr(bb, "stream", False)), groups=groups,
    )
    if compact:
        rowbits = _uncompact(out[1:2], inv)[0, :n]
    else:
        rowbits = out[1, :n]
    return jax.lax.bitcast_convert_type(rowbits, jnp.int32) >= 0


def closest_and_occluded_pallas3(
    bb: PallasBVH3Buffers,
    comps_c, t_min_c, t_max_c,
    comps_s, t_min_s, t_max_s,
    block: int = DEFAULT_BLOCK, map_tri: bool = True,
    compact: bool = False, groups: int = QUARTERS,
):
    """ONE launch for the wavefront's two per-bounce queues (see
    traverse_pallas2.closest_and_occluded_pallas2)."""
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
        _prep_rays,
    )
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
        _compact,
        _uncompact,
    )

    rays_c, n = _prep_rays(None, None, t_min_c, t_max_c, block,
                           comps=comps_c, wide=True)
    rays_s, n2 = _prep_rays(None, None, t_min_s, t_max_s, block,
                            comps=comps_s, wide=True)
    if compact:
        lo, hi = bb.scene_lo, bb.scene_hi
        rays_c, inv_c = _compact(rays_c, lo, hi)
        rays_s, inv_s = _compact(rays_s, lo, hi)
    rays = jnp.concatenate([rays_c, rays_s], axis=1)
    shadow_from = rays_c.shape[1] // block
    out = _traverse3(
        bb.aabbs, bb.tri_tiles, rays, num_leaves=bb.num_leaves,
        block=block, shadow_from=shadow_from, interpret=INTERPRET,
        leaf_size=bb.leaf_size,
        stream=bool(getattr(bb, "stream", False)), groups=groups,
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
    hit = _out_to_hit(bb.bb, out_c, n, map_tri)
    blocked = jax.lax.bitcast_convert_type(srow, jnp.int32) >= 0
    return hit, blocked
