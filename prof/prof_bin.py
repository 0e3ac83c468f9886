"""Quantify subtree-binning potential on terrain bounce rays.

Current streamed kernel: each 512-ray block walks the top tree and
visits the UNION of subtrees its rays touch. Compare sort keys offline:
  a) current (octant<<21 | origin-morton)
  b) first-subtree-major (first_sid, octant, morton)
  c) exact binned rounds (each ray visits only its own subtrees)
"""
import numpy as np
import jax.numpy as jnp

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import traverse_stream as ts


def bounce_rays(flat, n, seed=11):
    rng = np.random.default_rng(seed)
    v0 = np.asarray(flat.v0)
    e1 = np.asarray(flat.e1)
    e2 = np.asarray(flat.e2)
    ti = rng.integers(0, len(v0), n)
    b1 = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    b2 = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    over = (b1 + b2) > 1
    b1 = np.where(over, 1 - b1, b1)
    b2 = np.where(over, 1 - b2, b2)
    ro = v0[ti] + b1 * e1[ti] + b2 * e2[ti]
    nrm = np.cross(e1[ti], e2[ti])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    nrm *= np.where(nrm[:, 1:2] < 0, -1.0, 1.0)
    u1 = rng.uniform(0, 1, n).astype(np.float32)
    u2 = rng.uniform(0, 1, n).astype(np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t1 = np.cross(nrm, np.where(np.abs(nrm[:, 0:1]) < 0.9,
                                [1.0, 0, 0], [0, 1.0, 0]))
    t1 /= np.maximum(np.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = np.cross(nrm, t1)
    rd = (t1 * (r * np.cos(phi))[:, None] + t2 * (r * np.sin(phi))[:, None]
          + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]).astype(np.float32)
    ro = (ro + 1e-3 * nrm).astype(np.float32)
    return ro, rd


def main():
    scene = Scene.from_vkr_scene(procedural.terrain(grid=500))
    flat = scene.flatten_world()
    print(f"terrain {flat.num_tris} tris")
    bb = ts.pack_streamed(flat.v0, flat.e1, flat.e2)
    S = bb.sub_nodes.shape[0] // ts.SUB_NODE_ROWS
    print(f"subtrees={S} top_nodes={bb.num_top_nodes}")

    top = np.asarray(bb.top_nodes)
    leaf_mask = top[:, 7] >= 0
    sid = top[leaf_mask, 7].astype(np.int32)
    smin = np.zeros((S, 3), np.float32)
    smax = np.zeros((S, 3), np.float32)
    smin[sid] = top[leaf_mask, 0:3]
    smax[sid] = top[leaf_mask, 3:6]

    n = 196608
    ro, rd = bounce_rays(flat, n)

    inv = 1.0 / np.where(np.abs(rd) < 1e-12, 1e-12, rd)
    t0 = (smin[None] - ro[:, None]) * inv[:, None]
    t1s = (smax[None] - ro[:, None]) * inv[:, None]
    lo = np.minimum(t0, t1s).max(axis=2)
    hi = np.maximum(t0, t1s).min(axis=2)
    entry = np.maximum(lo, 0)
    hitm = (hi >= entry) & (lo < 1e30)
    per_ray = hitm.sum(axis=1)
    print(f"per-ray overlapped subtrees: mean {per_ray.mean():.2f} "
          f"p50 {np.percentile(per_ray, 50):.0f} "
          f"p90 {np.percentile(per_ray, 90):.0f} max {per_ray.max()}")

    entry_t = np.where(hitm, entry, np.inf)
    first_sid = np.argmin(entry_t, axis=1).astype(np.uint32)
    no_hit = ~hitm.any(axis=1)
    first_sid[no_hit] = S  # dead-ish

    comps = tuple(jnp.asarray(a) for a in
                  (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2]))
    mkey = np.asarray(ts._coherence_key(bb, comps)).astype(np.uint64)

    B = 512
    nb = n // B

    def report(label, order):
        hs = hitm[order]
        union = hs.reshape(nb, B, S).any(axis=1).sum(axis=1)
        print(f"  {label:34s} union/block mean {union.mean():6.2f} "
              f"p90 {np.percentile(union, 90):5.0f} total {union.sum()}")

    report("unsorted", np.arange(n))
    report("octant|morton (current)", np.argsort(mkey, kind="stable"))
    key_b = (first_sid.astype(np.uint64) << np.uint64(24)) | (mkey >> np.uint64(21) << np.uint64(21)) >> np.uint64(0)
    # (first_sid, octant, morton): first_sid high, keep full mkey low
    key_b = (first_sid.astype(np.uint64) << np.uint64(32)) | mkey
    report("first-subtree | octant | morton", np.argsort(key_b, kind="stable"))
    key_c = (mkey >> np.uint64(21) << np.uint64(32)) | (first_sid.astype(np.uint64) << np.uint64(21)) | (mkey & np.uint64((1 << 21) - 1))
    report("octant | first-subtree | morton", np.argsort(key_c, kind="stable"))
    print(f"  exact binned rounds total visits: {per_ray.sum()} "
          f"(= {per_ray.sum() / B:.0f} block-equivalents)")


if __name__ == "__main__":
    main()
