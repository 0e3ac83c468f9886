"""Round-5: flush-density study for the v3 flat cull on REAL bounce queues.

The v3 kernel's cost is ~proportional to the number of flushed
(leaf x group) pairs: each flush is a (leaf_size tris, q lanes) MT at
full VPU width. This script computes, WITHOUT running the kernel, for
real village bounce-1/2 closest queues and the bounce-2 shadow queue:

  1. the kernel's CURRENT per-group union-box interval mask density
     (exactly _kernel3's predicate) for block/group variants;
  2. the OR-of-per-ray exact slab test per group — the tightest mask a
     per-ray broad phase could give at the same flush granularity;
  3. the per-ray mean leaf count — the flush floor at group size 1;
  4. (3) with t clamped to the ray's true hit distance — what a perfect
     shrinking-t cap would add on top.

Comparing (1) vs (2) decides whether building a per-ray broad phase
into the kernel (v4) pays; (2) vs (3) bounds what finer flush
granularity could add; alternative sort keys are scored with the same
metrics. Also derives ns per flushed-pair from the r5 ledger timings.

Run on chip: PYTHONPATH=.:/root/.axon_site python prof/prof_r5_density.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import bvh as bvh_mod
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas2 as tp2
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas3 as tp3
from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
    _part1by2_u32,
)

N = 524288
W, H = 1024, 512


def morton_key(ro, rd, tmin, tmax, lo, hi, obits=7, dbits=0, dir_major=False):
    """Coherence keys: current = octant<<21 | morton(origin, 7b/axis).
    dbits > 0 quantizes |direction| components to dbits/axis inside the
    octant; dir_major puts those bits above the origin morton."""
    inv = (127.0 if obits == 7 else (2.0 ** obits - 1)) / np.maximum(
        hi - lo, 1e-12
    )
    q = np.clip((ro - lo) * inv, 0, 2 ** obits - 1).astype(np.uint32)
    part = lambda v: np.asarray(_part1by2_u32(jnp.asarray(v)))
    morton = part(q[:, 0]) | (part(q[:, 1]) << 1) | (part(q[:, 2]) << 2)
    octant = (
        ((rd[:, 0] < 0).astype(np.uint32) << 2)
        | ((rd[:, 1] < 0).astype(np.uint32) << 1)
        | (rd[:, 2] < 0).astype(np.uint32)
    )
    dead = (~(tmax > tmin)).astype(np.uint32)
    okey = morton
    if dbits:
        dq = np.clip(
            np.abs(rd) * (2 ** dbits - 1), 0, 2 ** dbits - 1
        ).astype(np.uint32)
        dkey = (dq[:, 0] << (2 * dbits)) | (dq[:, 1] << dbits) | dq[:, 2]
        if dir_major:
            okey = (dkey << (3 * obits)) | morton
        else:
            okey = (morton << (3 * dbits)) | dkey
    bits = 3 * obits + 3 * dbits
    return (dead.astype(np.uint64) << 63) | (octant.astype(np.uint64) << bits) | okey.astype(np.uint64)


@functools.partial(jax.jit, static_argnames=("q",))
def masks_for(ro, rd, tmin, tmax, bmn, bmx, q):
    """Per-chunk: (union-box mask, OR-of-per-ray mask, per-ray count).
    ro/rd (C, 3); bmn/bmx (L, 3). C must be a multiple of q."""
    C = ro.shape[0]
    g = C // q
    live = tmax > tmin
    inv = jnp.where(rd >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(rd), 1e-20)
    # ---- per-ray exact slab test: (C, L)
    t0 = (bmn[None] - ro[:, None]) * inv[:, None]
    t1 = (bmx[None] - ro[:, None]) * inv[:, None]
    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=2), tmin[:, None])
    tf = jnp.minimum(jnp.max(jnp.maximum(t0, t1), axis=2), tmax[:, None])
    tf2 = jnp.min(jnp.maximum(t0, t1), axis=2)
    tn2 = jnp.max(jnp.minimum(t0, t1), axis=2)
    per_ray = (
        (jnp.maximum(tn2, tmin[:, None]) <= jnp.minimum(tf2, tmax[:, None]))
        & live[:, None]
    )
    del t0, t1, tn, tf, tf2, tn2
    or_mask = jnp.any(per_ray.reshape(g, q, -1), axis=1)  # (g, L)
    per_ray_cnt = jnp.sum(per_ray, axis=1)  # (C,)

    # ---- union-box interval test (the kernel's predicate), (g, L)
    big = jnp.float32(3.0e38)
    rog = ro.reshape(g, q, 3)
    invg = inv.reshape(g, q, 3)
    liveg = live.reshape(g, q, 1)
    olo = jnp.min(jnp.where(liveg, rog, big), axis=1)  # (g, 3)
    ohi = jnp.max(jnp.where(liveg, rog, -big), axis=1)
    ilo = jnp.min(jnp.where(liveg, invg, big), axis=1)
    ihi = jnp.max(jnp.where(liveg, invg, -big), axis=1)
    tlo = jnp.min(jnp.where(liveg[..., 0], tmin.reshape(g, q), big), axis=1)
    thi = jnp.max(jnp.where(liveg[..., 0], tmax.reshape(g, q), -big), axis=1)
    U = thi[:, None] * jnp.ones((1, bmn.shape[0]))
    Lb = tlo[:, None] * jnp.ones((1, bmn.shape[0]))
    expand_ok = jnp.ones(U.shape, bool)
    for k in range(3):
        alo = bmn[None, :, k] - ohi[:, k:k + 1]
        ahi = bmn[None, :, k] - olo[:, k:k + 1]
        blo = bmx[None, :, k] - ohi[:, k:k + 1]
        bhi = bmx[None, :, k] - olo[:, k:k + 1]
        lo_k, hi_k = ilo[:, k:k + 1], ihi[:, k:k + 1]
        t0lo = jnp.minimum(jnp.minimum(alo * lo_k, alo * hi_k),
                           jnp.minimum(ahi * lo_k, ahi * hi_k))
        t0hi = jnp.maximum(jnp.maximum(alo * lo_k, alo * hi_k),
                           jnp.maximum(ahi * lo_k, ahi * hi_k))
        t1lo = jnp.minimum(jnp.minimum(blo * lo_k, blo * hi_k),
                           jnp.minimum(bhi * lo_k, bhi * hi_k))
        t1hi = jnp.maximum(jnp.maximum(blo * lo_k, blo * hi_k),
                           jnp.maximum(bhi * lo_k, bhi * hi_k))
        Lb = jnp.maximum(Lb, jnp.minimum(t0lo, t1lo))
        U = jnp.minimum(U, jnp.maximum(t0hi, t1hi))
        expand_ok = expand_ok & (jnp.maximum(alo, -bhi) <= thi[:, None])
    union_mask = (Lb <= U) & expand_ok & (thi > tlo)[:, None]
    return (
        jnp.sum(union_mask, axis=1),  # (g,) leaves per group, kernel
        jnp.sum(or_mask, axis=1),     # (g,) leaves per group, per-ray OR
        per_ray_cnt,
    )


def study(name, ro, rd, tmin, tmax, bmn, bmx, lo, hi, keys, qs=(128, 256)):
    L = bmn.shape[0]
    print(f"\n== {name}: N={len(ro)} L={L} "
          f"live={(tmax > tmin).mean():.3f} ==", flush=True)
    bmn_d, bmx_d = jnp.asarray(bmn), jnp.asarray(bmx)
    for kname, key in keys.items():
        order = np.argsort(key, kind="stable")
        ro_s, rd_s = ro[order], rd[order]
        tn_s, tx_s = tmin[order], tmax[order]
        CH = 32768
        rows = {q: [0, 0] for q in qs}
        pr_tot = 0
        for s in range(0, len(ro), CH):
            e = s + CH
            for q in qs:
                u, o, pr = masks_for(
                    jnp.asarray(ro_s[s:e]), jnp.asarray(rd_s[s:e]),
                    jnp.asarray(tn_s[s:e]), jnp.asarray(tx_s[s:e]),
                    bmn_d, bmx_d, q,
                )
                rows[q][0] += int(jnp.sum(u))
                rows[q][1] += int(jnp.sum(o))
                if q == qs[0]:
                    pr_tot += int(jnp.sum(pr))
        n_rays = len(ro)
        for q in qs:
            g = n_rays // q
            print(f"  key={kname:22s} q={q:4d}: union {rows[q][0]/g:7.1f} "
                  f"leaves/group  per-rayOR {rows[q][1]/g:7.1f}  "
                  f"(x{rows[q][0]/max(rows[q][1],1):.2f} loose)", flush=True)
        print(f"  key={kname:22s} per-ray mean leaves: "
              f"{pr_tot/n_rays:7.2f}", flush=True)


def main():
    import prof.prof_r5_v3b as v3b

    sc = Scene.from_vkr_scene(procedural.village())
    flat = sc.flatten_world()
    tb = bvh_mod.thread_bvh(
        bvh_mod.build_bvh_sah(flat.v0, flat.e1, flat.e2, leaf_size=128),
        flat.v0, flat.e1, flat.e2,
    )
    bb = tp3.PallasBVH3Buffers(tp2.pack_for_pallas2(tb))
    aab = np.asarray(bb.aabbs)
    L = bb.num_leaves
    bmn = aab[0:3, :L].T.copy()
    bmx = aab[3:6, :L].T.copy()
    lo = np.asarray(bb.scene_lo)
    hi = np.asarray(bb.scene_hi)

    # real queues (same construction as prof_r5_v3b)
    eye = np.array([0, 4.0, 13.0], np.float32)
    look = np.array([0, 0.5, 0], np.float32)
    fwd = look - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    tfov = np.tan(np.radians(55) / 2)
    px, py = np.meshgrid(
        (np.arange(W) + 0.5) / W * 2 - 1, (np.arange(H) + 0.5) / H * 2 - 1
    )
    d = (
        fwd[None, None]
        + right[None, None] * (px * tfov * W / H)[..., None]
        + up[None, None] * (-py * tfov)[..., None]
    ).reshape(-1, 3)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    ro = np.broadcast_to(eye, (N, 3)).astype(np.float32).copy()
    rng = np.random.default_rng(0)

    h0 = tp2.closest_hit_pallas2(bb.bb, jnp.asarray(ro), jnp.asarray(d))
    b1_ro, b1_rd, b1_tmax, _, m0 = v3b.diffuse_bounce(
        flat, ro, d, np.asarray(h0.t), np.asarray(h0.tri), rng
    )
    h1 = tp2.closest_hit_pallas2(
        bb.bb, jnp.asarray(b1_ro), jnp.asarray(b1_rd),
        t_max=jnp.asarray(b1_tmax),
    )
    tri1 = np.where(b1_tmax > 0, np.asarray(h1.tri), -1)
    b2_ro, b2_rd, b2_tmax, _, m1 = v3b.diffuse_bounce(
        flat, b1_ro, b1_rd, np.asarray(h1.t), tri1, rng
    )
    print(f"hit fractions: primary {m0.mean():.3f} bounce1 {m1.mean():.3f}",
          flush=True)

    zeros = np.zeros(N, np.float32)
    queues = {
        "b1-closest": (b1_ro, b1_rd, zeros, b1_tmax),
        "b2-closest": (b2_ro, b2_rd, zeros, b2_tmax),
    }
    for qname, (o, dd, tn, tx) in queues.items():
        keys = {
            "octant|morton21(cur)": morton_key(o, dd, tn, tx, lo, hi),
            "oct|mort21|dir6": morton_key(o, dd, tn, tx, lo, hi, dbits=2),
            "oct|dir6|mort21": morton_key(o, dd, tn, tx, lo, hi, dbits=2,
                                          dir_major=True),
            "oct|dir12|mort15": morton_key(o, dd, tn, tx, lo, hi, obits=5,
                                           dbits=4, dir_major=True),
        }
        study(qname, o, dd, tn, tx, bmn, bmx, lo, hi, keys)

    # oracle-t variant on b1: clamp tmax to the true hit t (+eps) — what
    # a perfect shrinking-t cap would leave for the per-ray test
    t1c = np.where(
        (b1_tmax > 0) & (tri1 >= 0), np.asarray(h1.t) * 1.001, b1_tmax
    ).astype(np.float32)
    study(
        "b1-closest ORACLE-t", b1_ro, b1_rd, zeros, t1c, bmn, bmx, lo, hi,
        {"octant|morton21(cur)": morton_key(b1_ro, b1_rd, zeros, t1c, lo, hi)},
    )


if __name__ == "__main__":
    main()
