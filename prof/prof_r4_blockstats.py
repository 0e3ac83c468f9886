"""Round-4 host analysis: per-block node steps and leaf visits of the
resident v2 walk on the village scene — the data that decides where the
time goes (scalar walk vs leaf flush) and what the ceiling of each fix
is (sorting, binning granularity, per-ray caps, ordered entry).

Replays the EXACT conservative interval+expansion test of
traverse_pallas2._kernel2 in numpy, block by block, for:
  - primary camera rays (bench camera),
  - coherence-sorted diffuse bounce rays,
  - coherence-sorted sun shadow rays,
and reports steps/leaf-visit distributions plus two counterfactuals:
  a) per-ray EXACT culling (each ray tests every leaf AABB it overlaps
     within its current [tmin, min(t_best, tmax)]) — the floor any
     per-ray-cap scheme can reach,
  b) ordered (front-to-back entry) walk with cap refresh after every
     leaf — the ceiling of ordering alone.

Host-only: python prof/prof_r4_blockstats.py [--scene village]
"""

import sys

import numpy as np

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import bvh as bvh_mod

N = 65536  # enough blocks (128) for stable stats, fast on host
W, H = 512, 128
BLOCK = 512


def build_rays(flat, eye, look, fovy=55):
    fwd = look - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    t = np.tan(np.radians(fovy) / 2)
    px, py = np.meshgrid(
        (np.arange(W) + 0.5) / W * 2 - 1, (np.arange(H) + 0.5) / H * 2 - 1
    )
    d = (
        fwd[None, None]
        + right[None, None] * (px * t * W / H)[..., None]
        + up[None, None] * (-py * t)[..., None]
    ).reshape(-1, 3)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    ro = np.broadcast_to(eye, (N, 3)).astype(np.float32).copy()
    return ro, d


def exact_closest(tb, flat, ro, rd, tmin, tmax):
    """Reference per-ray closest-hit t via brute MT (vectorized chunks)."""
    t_best = np.minimum(tmax, 2.0e32).astype(np.float64)
    v0, e1, e2 = (
        flat.v0.astype(np.float64),
        flat.e1.astype(np.float64),
        flat.e2.astype(np.float64),
    )
    rod, rdd = ro.astype(np.float64), rd.astype(np.float64)
    for s in range(0, len(v0), 4096):
        e = min(s + 4096, len(v0))
        p = np.cross(rdd[:, None], e2[None, s:e])
        det = np.einsum("tj,ntj->nt", e1[s:e], p)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = rod[:, None] - v0[None, s:e]
        u = np.einsum("ntj,ntj->nt", tv, p) * inv
        q = np.cross(tv, e1[None, s:e])
        v = np.einsum("nj,ntj->nt", rdd, q) * inv
        tt = np.einsum("tj,ntj->nt", e2[s:e], q) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (tt > tmin[:, None])
        tt = np.where(hit, tt, 2.0e32)
        t_best = np.minimum(t_best, tt.min(axis=1))
    return t_best


def block_walk_stats(nodes, leaf_of, skip_of, rays8, block=BLOCK,
                     per_leaf_cap_refresh=False, leaf_tris=None):
    """Replay the conservative walk per block; count steps/leaf visits.
    With per_leaf_cap_refresh, refresh the cap with exact per-ray MT
    best-t after every leaf visit (upper bound of flush-cadence pruning
    — LIST_CAP=16 refreshes less often)."""
    n = rays8.shape[1]
    nb = n // block
    steps_all, leaves_all = [], []
    for b in range(nb):
        r = rays8[:, b * block:(b + 1) * block]
        live = r[7] > r[6]
        if not live.any():
            steps_all.append(0)
            leaves_all.append(0)
            continue
        ro = r[0:3][:, live]
        rd = r[3:6][:, live]
        olo, ohi = ro.min(1), ro.max(1)
        inv = np.where(rd >= 0, 1.0, -1.0) / np.maximum(np.abs(rd), 1e-20)
        ilo, ihi = inv.min(1), inv.max(1)
        tlo = r[6][live].min()
        thi = r[7][live].max()
        cap = thi
        t_best = np.minimum(r[7][live], 2.0e32).copy()
        cur = 0
        steps = 0
        leaves = 0
        M = nodes.shape[0]
        while cur < M:
            steps += 1
            bmn = nodes[cur, 0:3]
            bmx = nodes[cur, 3:6]
            U = min(thi, cap)
            L = tlo
            expand_ok = True
            for k in range(3):
                cands = [
                    (bmn[k] - ohi[k]) * ilo[k], (bmn[k] - ohi[k]) * ihi[k],
                    (bmn[k] - olo[k]) * ilo[k], (bmn[k] - olo[k]) * ihi[k],
                ]
                cands2 = [
                    (bmx[k] - ohi[k]) * ilo[k], (bmx[k] - ohi[k]) * ihi[k],
                    (bmx[k] - olo[k]) * ilo[k], (bmx[k] - olo[k]) * ihi[k],
                ]
                L = max(L, min(min(cands), min(cands2)))
                U = min(U, max(max(cands), max(cands2)))
                dist_k = max(bmn[k] - ohi[k], olo[k] - bmx[k])
                expand_ok = expand_ok and (dist_k <= min(thi, cap))
            hit = (L <= U) and expand_ok
            leaf = leaf_of[cur]
            if hit and leaf >= 0:
                leaves += 1
                if per_leaf_cap_refresh and leaf_tris is not None:
                    v0, e1, e2 = leaf_tris[leaf]
                    p = np.cross(rd.T[:, None], e2[None])
                    det = np.einsum("tj,ntj->nt", e1, p)
                    ok = np.abs(det) > 1e-12
                    invd = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
                    tv = ro.T[:, None] - v0[None]
                    u = np.einsum("ntj,ntj->nt", tv, p) * invd
                    q = np.cross(tv, e1[None])
                    v = np.einsum("ntj,ntj->nt", rd.T[:, None] * np.ones_like(q), q) * invd
                    tt = np.einsum("tj,ntj->nt", e2, q) * invd
                    okh = (
                        ok & (u >= 0) & (v >= 0) & (u + v <= 1)
                        & (tt > r[6][live][:, None])
                        & (tt < t_best[:, None])
                    )
                    tt = np.where(okh, tt, 2.0e32)
                    t_best = np.minimum(t_best, tt.min(axis=1))
                    cap = np.minimum(t_best, r[7][live]).max()
            if hit and leaf < 0:
                cur = cur + 1
            else:
                cur = skip_of[cur]
        steps_all.append(steps)
        leaves_all.append(leaves)
    return np.array(steps_all), np.array(leaves_all)


def per_ray_exact_leaf_overlap(nodes, leaf_of, skip_of, rays8, t_best):
    """Mean leaves per ray whose AABB the ray segment [tmin, best]
    overlaps — the floor for any per-ray scheme."""
    n = rays8.shape[1]
    sel = np.arange(0, n, 37)  # sample rays
    counts = []
    leaf_rows = np.where(leaf_of >= 0)[0]
    bmn = nodes[leaf_rows, 0:3]
    bmx = nodes[leaf_rows, 3:6]
    for i in sel:
        if rays8[7, i] <= rays8[6, i]:
            continue
        ro = rays8[0:3, i]
        rd = rays8[3:6, i]
        inv = np.where(rd >= 0, 1.0, -1.0) / np.maximum(np.abs(rd), 1e-20)
        t0 = (bmn - ro) * inv
        t1 = (bmx - ro) * inv
        lo = np.minimum(t0, t1).max(axis=1)
        hi = np.maximum(t0, t1).min(axis=1)
        tm = min(t_best[i], rays8[7, i])
        ok = (hi >= np.maximum(lo, rays8[6, i])) & (lo <= tm)
        counts.append(ok.sum())
    return np.mean(counts)


def main():
    sc = Scene.from_vkr_scene(procedural.village())
    eye = np.array([0, 4.0, 13.0], np.float32)
    look = np.array([0, 0.5, 0], np.float32)
    flat = sc.flatten_world()
    print(f"village: {flat.num_tris} tris")

    tb = bvh_mod.thread_bvh(
        bvh_mod.build_bvh_sah(flat.v0, flat.e1, flat.e2, leaf_size=128),
        flat.v0, flat.e1, flat.e2,
    )
    nodes = tb.nodes[:, 0:6].astype(np.float64)
    skip_of = tb.nodes[:, 6].view(np.int32).astype(int)
    leaf_row = tb.nodes[:, 7].view(np.int32)
    leaf_of = np.where(leaf_row >= 0, leaf_row // tb.leaf_size, -1)
    n_leaves = leaf_of.max() + 1
    print(f"nodes={len(nodes)} leaves={n_leaves} leaf_size={tb.leaf_size}")

    # per-leaf triangle arrays for cap-refresh counterfactual
    rows = tb.tri_rows
    leaf_tris = []
    for l in range(n_leaves):
        sl = rows[l * tb.leaf_size:(l + 1) * tb.leaf_size]
        leaf_tris.append(
            (sl[:, 0:3].astype(np.float64), sl[:, 3:6].astype(np.float64),
             sl[:, 6:9].astype(np.float64))
        )

    ro, d = build_rays(flat, eye, look)
    tmin = np.zeros(N, np.float32)
    tmax = np.full(N, 2.0e32, np.float32)
    t_best = exact_closest(tb, flat, ro, d, tmin, tmax)
    hit_mask = t_best < 1e30
    print(f"primary hit fraction: {hit_mask.mean():.3f}")

    def pack(ro, rd, tmin, tmax):
        return np.concatenate(
            [ro.T, rd.T, tmin[None], tmax[None]], axis=0
        ).astype(np.float64)

    def coh_sort(rays8, lo, hi):
        invs = 127.0 / np.maximum(hi - lo, 1e-12)
        q = [
            np.clip((rays8[k] - lo[k]) * invs[k], 0, 127).astype(np.uint64)
            for k in range(3)
        ]

        def spread(x):
            x = x & 0x3FF
            x = (x | (x << 16)) & 0x30000FF
            x = (x | (x << 8)) & 0x300F00F
            x = (x | (x << 4)) & 0x30C30C3
            x = (x | (x << 2)) & 0x9249249
            return x

        m = spread(q[0]) | (spread(q[1]) << 1) | (spread(q[2]) << 2)
        octant = (
            ((rays8[3] < 0).astype(np.uint64) << 2)
            | ((rays8[4] < 0).astype(np.uint64) << 1)
            | (rays8[5] < 0).astype(np.uint64)
        )
        dead = ~(rays8[7] > rays8[6])
        key = (dead.astype(np.uint64) << 31) | (octant << 21) | m
        perm = np.argsort(key, kind="stable")
        return rays8[:, perm]

    lo = flat.v0.min(axis=0)
    hi = flat.v0.max(axis=0)

    def report(name, rays8):
        s, l = block_walk_stats(nodes, leaf_of, skip_of, rays8)
        s2, l2 = block_walk_stats(
            nodes, leaf_of, skip_of, rays8,
            per_leaf_cap_refresh=True, leaf_tris=leaf_tris,
        )
        # per-ray floor
        tb_exact = exact_closest(
            tb, flat,
            np.ascontiguousarray(rays8[0:3].T.astype(np.float32)),
            np.ascontiguousarray(rays8[3:6].T.astype(np.float32)),
            rays8[6].astype(np.float32), rays8[7].astype(np.float32),
        )
        flr = per_ray_exact_leaf_overlap(
            nodes, leaf_of, skip_of, rays8, tb_exact
        )
        print(
            f"{name:28s} steps mean {s.mean():7.1f} p90 {np.percentile(s, 90):7.0f}"
            f" | leaves mean {l.mean():6.1f} p90 {np.percentile(l, 90):6.0f}"
            f" | capref leaves {l2.mean():6.1f}"
            f" | per-ray floor {flr:5.1f}"
        )

    report("primary (swizzle order)", pack(ro, d, tmin, tmax))

    # bounce rays
    nrm = np.cross(flat.e1, flat.e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    # nearest-tri normal via brute force is costly; approximate with up
    rng = np.random.default_rng(0)
    p = ro + d * np.minimum(t_best, 1e3)[:, None].astype(np.float32)
    gn = np.where(hit_mask[:, None], np.array([[0, 1, 0]], np.float32), d)
    u1, u2 = rng.random(N, np.float32), rng.random(N, np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    lx, ly = r * np.cos(phi), r * np.sin(phi)
    lz = np.sqrt(np.maximum(1 - u1, 0))
    a = np.where(np.abs(gn[:, 2:3]) < 0.9, [0, 0, 1], [1, 0, 0]).astype(
        np.float32
    )
    tx = np.cross(a, gn)
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-20)
    ty = np.cross(gn, tx)
    bd = (tx * lx[:, None] + ty * ly[:, None] + gn * lz[:, None]).astype(
        np.float32
    )
    bro = (p + gn * 1e-3).astype(np.float32)
    btmax = np.where(hit_mask, 2.0e32, 0.0).astype(np.float32)
    bounce = coh_sort(pack(bro, bd, tmin, btmax), lo, hi)
    report("bounce (coh-sorted)", bounce)

    sun = np.array([0.35, 0.8, 0.3], np.float32)
    sun /= np.linalg.norm(sun)
    sd = np.broadcast_to(sun, (N, 3)).astype(np.float32).copy()
    shadow = coh_sort(pack(bro, sd, tmin, btmax), lo, hi)
    report("shadow (coh-sorted)", shadow)


if __name__ == "__main__":
    main()
