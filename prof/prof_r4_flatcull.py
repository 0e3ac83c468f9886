"""Round-4 host analysis: flush work vs block granularity (village).

The chip measurements (prof_r4_block.py) show the streamed/resident walk
is FLUSH-dominated at block>=512 and WALK-dominated below: the scalar
tree walk costs ~50 cycles/node x ~1.2k nodes per block, so shrinking
blocks to tighten packet bounds multiplies a fixed 60-70 us/block cost.
A v3 kernel would replace the scalar tree walk with a flat VECTORIZED
leaf cull (all leaf AABBs tested on the VPU in a handful of vreg ops,
mask DMA'd to SMEM to drive the flush loop) making small blocks nearly
free — IF tighter bounds actually cut the lane x leaf pair count.

This script computes exactly that: for the coherence-SORTED village
queues (primary/bounce/shadow), the total lane-leaf MT pairs at block
512 / 256 / 128 with per-block conservative bounds at leaf (128-tri)
granularity, with and without the exact-t cap (the unavoidable closest-
hit pruning bound).

Host-only: PYTHONPATH=/root/repo python prof/prof_r4_flatcull.py
"""

import numpy as np

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene

N = 65536
W, H = 512, 128
LEAF = 128


def part1by2(x):
    x = x.astype(np.uint32) & np.uint32(0x3FF)
    x = (x | (x << 16)) & np.uint32(0x30000FF)
    x = (x | (x << 8)) & np.uint32(0x300F00F)
    x = (x | (x << 4)) & np.uint32(0x30C30C3)
    x = (x | (x << 2)) & np.uint32(0x9249249)
    return x


def coherence_key(ro, rd, live, lo, hi):
    inv = 127.0 / np.maximum(hi - lo, 1e-12)
    q = np.clip((ro - lo[None]) * inv[None], 0, 127).astype(np.uint32)
    morton = part1by2(q[:, 0]) | (part1by2(q[:, 1]) << 1) | (
        part1by2(q[:, 2]) << 2)
    octant = ((rd[:, 0] < 0).astype(np.uint32) << 2
              | (rd[:, 1] < 0).astype(np.uint32) << 1
              | (rd[:, 2] < 0).astype(np.uint32))
    return ((~live).astype(np.uint32) << 31) | (octant << 21) | morton


def main():
    sc = Scene.from_vkr_scene(procedural.village())
    flat = sc.flatten_world()
    v0, e1, e2 = flat.v0, flat.e1, flat.e2
    v1, v2 = v0 + e1, v0 + e2
    centroid = (v0 + v1 + v2) / 3
    print(f"village: {flat.num_tris} tris")

    # leaf chunks: median splits at 128 tris (SAH leaves are close)
    from prof.prof_r4_overlap import median_chunks  # noqa: E402

    leaves = median_chunks(centroid, LEAF)
    L = len(leaves)
    bmin = np.stack([np.minimum(np.minimum(v0[c].min(0), v1[c].min(0)),
                                v2[c].min(0)) for c in leaves])
    bmax = np.stack([np.maximum(np.maximum(v0[c].max(0), v1[c].max(0)),
                                v2[c].max(0)) for c in leaves])
    print(f"leaves: {L}")

    # ---- queues (same camera/bounce construction as prof_r4_overlap)
    eye = np.array([0, 4.0, 13.0], np.float32)
    look = np.array([0, 0.5, 0], np.float32)
    fwd = look - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    t = np.tan(np.radians(55) / 2)
    px, py = np.meshgrid(
        (np.arange(W) + 0.5) / W * 2 - 1, (np.arange(H) + 0.5) / H * 2 - 1
    )
    d = (fwd[None, None]
         + right[None, None] * (px * t * W / H)[..., None]
         + up[None, None] * (-py * t)[..., None]).reshape(-1, 3)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    ro = np.broadcast_to(eye, (N, 3)).astype(np.float32).copy()

    def exact_t(ro_, rd_, tmax_):
        tb = np.minimum(tmax_, 2.0e32).astype(np.float32).copy()
        for rs in range(0, N, 8192):
            re_ = min(rs + 8192, N)
            tbb = tb[rs:re_]
            for s in range(0, len(v0), 16384):
                e = min(s + 16384, len(v0))
                p = np.cross(rd_[rs:re_, None], e2[None, s:e])
                det = np.einsum("tj,ntj->nt", e1[s:e], p)
                ok = np.abs(det) > 1e-12
                inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
                tv = ro_[rs:re_, None] - v0[None, s:e]
                u = np.einsum("ntj,ntj->nt", tv, p) * inv
                q = np.cross(tv, e1[None, s:e])
                v = np.einsum("nj,ntj->nt", rd_[rs:re_], q) * inv
                tt = np.einsum("tj,ntj->nt", e2[s:e], q) * inv
                hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (tt > 1e-4)
                tt = np.where(hit, tt, 2.0e32)
                tbb = np.minimum(tbb, tt.min(axis=1))
            tb[rs:re_] = tbb
        return tb

    t_prim = exact_t(ro, d, np.full(N, 2.0e32, np.float32))
    hit_mask = t_prim < 1e30
    p = ro + d * np.minimum(t_prim, 1e3)[:, None]
    gn = np.where(hit_mask[:, None], np.array([[0, 1, 0]], np.float32), d)
    rng = np.random.default_rng(0)
    u1, u2 = rng.random(N, np.float32), rng.random(N, np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    lz = np.sqrt(np.maximum(1 - u1, 0))
    a = np.where(np.abs(gn[:, 2:3]) < 0.9, [0, 0, 1],
                 [1, 0, 0]).astype(np.float32)
    tx = np.cross(a, gn)
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-20)
    ty = np.cross(gn, tx)
    bd = (tx * (r * np.cos(phi))[:, None] + ty * (r * np.sin(phi))[:, None]
          + gn * lz[:, None]).astype(np.float32)
    bro = (p + gn * 1e-3).astype(np.float32)
    btmax = np.where(hit_mask, 2.0e32, 0.0).astype(np.float32)
    t_bounce = exact_t(bro, bd, btmax)
    sun = np.array([0.35, 0.8, 0.3], np.float32)
    sun /= np.linalg.norm(sun)
    sd = np.broadcast_to(sun, (N, 3)).astype(np.float32).copy()
    t_shadow = exact_t(bro, sd, btmax)

    scene_lo = v0.min(0)
    scene_hi = v0.max(0)

    def pairs(name, ro_, rd_, tmax_, tbest):
        tmin_ = np.full(N, 1e-4, np.float32)
        live = tmax_ > tmin_
        key = coherence_key(ro_, rd_, live, scene_lo, scene_hi)
        order = np.argsort(key, kind="stable")
        ro_s, rd_s = ro_[order], rd_[order]
        tmin_s, tmax_s = tmin_[order], tmax_[order]
        tb_s = np.minimum(tbest, tmax_)[order]
        inv = np.where(rd_s >= 0, 1.0, -1.0) / np.maximum(np.abs(rd_s),
                                                          1e-20)
        print(f"  {name} (live {live.mean():.2f}):")
        for block in (512, 256, 128):
            nb = N // block

            def rmin(x):
                return np.where(tmax_s > tmin_s, x, 3e38).reshape(
                    nb, block, -1).min(1)

            def rmax(x):
                return np.where(tmax_s > tmin_s, x, -3e38).reshape(
                    nb, block, -1).max(1)

            olo, ohi = rmin(ro_s), rmax(ro_s)
            ilo, ihi = rmin(inv), rmax(inv)
            tlo = rmin(tmin_s[:, None])[:, 0]
            thi = rmax(tmax_s[:, None])[:, 0]
            tcap = rmax(tb_s[:, None])[:, 0]  # per-block exact-t cap
            total = 0
            total_cap = 0
            for s in range(L):
                # conservative interval slab per block vs leaf AABB
                Lb = np.full(nb, -3e38, np.float32)
                Ub = np.minimum(thi, np.minimum(tcap, 3e38))
                Ub_nc = thi.copy()
                Lb2 = np.full(nb, -3e38, np.float32)
                ok_exp = np.ones(nb, bool)
                for k in range(3):
                    alo = bmin[s, k] - ohi[:, k]
                    ahi = bmin[s, k] - olo[:, k]
                    blo = bmax[s, k] - ohi[:, k]
                    bhi = bmax[s, k] - olo[:, k]
                    c0 = np.stack([alo * ilo[:, k], alo * ihi[:, k],
                                   ahi * ilo[:, k], ahi * ihi[:, k]])
                    c1 = np.stack([blo * ilo[:, k], blo * ihi[:, k],
                                   bhi * ilo[:, k], bhi * ihi[:, k]])
                    lo_k = np.minimum(c0.min(0), c1.min(0))
                    hi_k = np.maximum(c0.max(0), c1.max(0))
                    Lb = np.maximum(Lb, lo_k)
                    Lb2 = np.maximum(Lb2, lo_k)
                    Ub = np.minimum(Ub, hi_k)
                    Ub_nc = np.minimum(Ub_nc, hi_k)
                    ok_exp &= np.maximum(alo, -bhi) <= thi
                hit_nc = (Lb2 <= Ub_nc) & ok_exp & (thi > tlo)
                hit_c = (Lb <= Ub) & ok_exp & (thi > tlo)
                total += hit_nc.sum()
                total_cap += hit_c.sum()
            print(f"    block={block:4d}: pairs {total * block / 1e6:8.1f}M"
                  f"  (cap-pruned {total_cap * block / 1e6:8.1f}M)"
                  f"  leaf-visits/block {total / nb:6.1f}")

    pairs("primary", ro, d, np.full(N, 2e32, np.float32), t_prim)
    pairs("bounce", bro, bd, btmax, t_bounce)
    pairs("shadow", bro, sd, btmax, t_shadow)


if __name__ == "__main__":
    main()
