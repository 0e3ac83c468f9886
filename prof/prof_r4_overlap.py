"""Round-4 host analysis: per-ray subtree overlap vs chunk granularity.

The binned dispatch's kernel work scales with (pairs = N x overlap) x
(per-subtree walk + flush cost), and its XLA permutation overhead with
the slot count K x N. This script computes, for the village bounce/
shadow/primary queues and several chunk sizes, the distribution of
per-ray overlapping subtrees (restricted to entry < exact closest t,
i.e. the subtrees a perfectly-ordered visitor would touch), giving the
optimal (chunk_tris, K) for the resident-scale binned path.

Host-only: PYTHONPATH=/root/repo python prof/prof_r4_overlap.py
"""

import numpy as np

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene

N = 65536
W, H = 512, 128


def median_chunks(centroid, chunk_tris):
    """Recursive largest-axis median splits snapped to chunk multiples
    (the traverse_stream._split_chunks scheme)."""
    out = []

    def rec(idx):
        if len(idx) <= chunk_tris:
            out.append(idx)
            return
        c = centroid[idx]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        order = idx[np.argsort(c[:, axis], kind="stable")]
        half = (len(idx) // 2 // chunk_tris) * chunk_tris
        if half == 0:
            half = chunk_tris
        rec(order[:half])
        rec(order[half:])

    rec(np.arange(len(centroid)))
    return out


def main():
    sc = Scene.from_vkr_scene(procedural.village())
    flat = sc.flatten_world()
    v0, e1, e2 = flat.v0, flat.e1, flat.e2
    v1 = v0 + e1
    v2 = v0 + e2
    centroid = (v0 + v1 + v2) / 3
    print(f"village: {flat.num_tris} tris")

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
    d = (
        fwd[None, None]
        + right[None, None] * (px * t * W / H)[..., None]
        + up[None, None] * (-py * t)[..., None]
    ).reshape(-1, 3)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    ro = np.broadcast_to(eye, (N, 3)).astype(np.float32).copy()

    # exact closest t via chunked brute MT (f32, small ray batches)
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
    print(f"primary hit fraction: {hit_mask.mean():.3f}")
    p = ro + d * np.minimum(t_prim, 1e3)[:, None]
    gn = np.where(hit_mask[:, None], np.array([[0, 1, 0]], np.float32), d)
    rng = np.random.default_rng(0)
    u1, u2 = rng.random(N, np.float32), rng.random(N, np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    lz = np.sqrt(np.maximum(1 - u1, 0))
    a = np.where(np.abs(gn[:, 2:3]) < 0.9, [0, 0, 1], [1, 0, 0]).astype(np.float32)
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

    for chunk in (1024, 2048, 4096, 8192):
        chunks = median_chunks(centroid, chunk)
        S = len(chunks)
        bmin = np.stack([
            np.minimum(np.minimum(v0[c].min(0), v1[c].min(0)), v2[c].min(0))
            for c in chunks
        ])
        bmax = np.stack([
            np.maximum(np.maximum(v0[c].max(0), v1[c].max(0)), v2[c].max(0))
            for c in chunks
        ])

        def overlap(ro_, rd_, tmin_, tmax_, tbest):
            inv = np.where(rd_ >= 0, 1.0, -1.0) / np.maximum(np.abs(rd_), 1e-20)
            cnt = np.zeros(N, np.int32)
            cnt_best = np.zeros(N, np.int32)
            for s in range(S):
                t0 = (bmin[s][None] - ro_) * inv
                t1 = (bmax[s][None] - ro_) * inv
                lo = np.maximum(np.minimum(t0, t1).max(1), tmin_)
                hi = np.minimum(np.maximum(t0, t1).min(1), tmax_)
                ok = (hi >= lo) & (tmax_ > tmin_)
                cnt += ok
                cnt_best += ok & (lo <= np.minimum(tbest, tmax_))
            return cnt, cnt_best

        rows = []
        for name, (o_, d_, tm) , tbest in (
            ("primary", (ro, d, np.full(N, 2e32, np.float32)), t_prim),
            ("bounce", (bro, bd, btmax), t_bounce),
            ("shadow", (bro, sd, btmax), t_shadow),
        ):
            tmin_ = np.full(N, 1e-4, np.float32)
            cnt, cb = overlap(o_, d_, tmin_, tm, tbest)
            live = tm > tmin_
            c = cb[live]
            rows.append(
                f"  {name:8s} live {live.mean():.2f}"
                f" | useful-overlap mean {c.mean():5.2f} p50 {np.percentile(c, 50):3.0f}"
                f" p90 {np.percentile(c, 90):3.0f} p99 {np.percentile(c, 99):4.0f}"
                f" max {c.max():4d} | raw mean {cnt[live].mean():5.2f}"
            )
        print(f"chunk={chunk} S={S}")
        for r_ in rows:
            print(r_)


if __name__ == "__main__":
    main()
