"""Round-4: village through the STREAMED/BINNED dispatches vs resident.

Usage: ... [--chunk TRIS] [--kmax K]

prof_r4_village.py measured the resident v2 path on the 80k-tri village:
primary 159 ms, bounce 229 ms (sorted), shadow 42.5 ms per 524K rays.
The structural problem: 40% of rays miss to sky, so the per-block scalar
pruning cap never tightens and each block walks its whole frustum of the
single 920-leaf tree. The subtree-binned path gives every ray a per-ray
entry interval and visits only overlapping subtrees — measure whether it
beats the resident walk on the SAME queues.

Run on chip: PYTHONPATH=/root/.axon_site:/root/repo python prof/prof_r4_village2.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import traverse_binned as tbn
from realtimepathtracingresearchframework_tpu.ops import traverse_stream as ts

N = 524288
W, H = 1024, 512


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def timeit(name, fn, iters=8):
    o = fn()
    sync(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn()
    sync(o)
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{name:46s} {dt:9.2f} ms   {N / dt / 1e3:8.2f} Mray/s")
    return dt


def main():
    chunk = None
    if "--chunk" in sys.argv:
        chunk = int(sys.argv[sys.argv.index("--chunk") + 1])
    kmax = tbn.K_MAX
    if "--kmax" in sys.argv:
        kmax = int(sys.argv[sys.argv.index("--kmax") + 1])
    sc = Scene.from_vkr_scene(procedural.village())
    eye = np.array([0, 4.0, 13.0], np.float32)
    look = np.array([0, 0.5, 0], np.float32)
    flat = sc.flatten_world()
    print(f"village: {flat.num_tris} tris")

    bb = ts.pack_streamed(flat.v0, flat.e1, flat.e2, chunk_tris=chunk)
    S = bb.num_subtrees
    print(f"subtrees={S} (chunk {bb.sub_leaves * 128}) "
          f"top_nodes={bb.num_top_nodes} kmax={kmax}")

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

    ro_d, rd_d = jnp.asarray(ro), jnp.asarray(d)

    hit = ts.closest_hit_streamed(bb, ro_d, rd_d, sort=True)
    t_np = np.asarray(hit.t)
    tri_np = np.asarray(hit.tri)
    hit_mask = tri_np >= 0
    print(f"primary hit fraction: {hit_mask.mean():.3f}")
    p = ro + d * np.minimum(t_np, 1e3)[:, None]

    nrm = np.cross(flat.e1, flat.e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    gn = nrm[np.clip(tri_np, 0, flat.num_tris - 1)]
    gn = np.where((np.sum(gn * d, axis=1) > 0)[:, None], -gn, gn)

    rng = np.random.default_rng(0)
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

    sun = np.array([0.35, 0.8, 0.3], np.float32)
    sun /= np.linalg.norm(sun)
    sd = np.broadcast_to(sun, (N, 3)).astype(np.float32).copy()

    bro_d, bd_d = jnp.asarray(bro), jnp.asarray(bd)
    btmax_d = jnp.asarray(btmax)
    sd_d = jnp.asarray(sd)

    timeit("primary streamed sorted",
           lambda: ts.closest_hit_streamed(bb, ro_d, rd_d, sort=True))
    timeit("primary streamed ordered",
           lambda: ts.closest_hit_streamed(bb, ro_d, rd_d, sort=True,
                                           ordered=True))
    timeit("primary binned r2",
           lambda: tbn.closest_hit_binned(bb, ro_d, rd_d))
    timeit("primary multislot",
           lambda: tbn.closest_hit_binned_all(bb, ro_d, rd_d, k_max=kmax))

    timeit("bounce streamed sorted",
           lambda: ts.closest_hit_streamed(bb, bro_d, bd_d, t_max=btmax_d,
                                           sort=True))
    timeit("bounce streamed ordered",
           lambda: ts.closest_hit_streamed(bb, bro_d, bd_d, t_max=btmax_d,
                                           sort=True, ordered=True))
    timeit("bounce binned r2",
           lambda: tbn.closest_hit_binned(bb, bro_d, bd_d, t_max=btmax_d))
    timeit("bounce multislot",
           lambda: tbn.closest_hit_binned_all(bb, bro_d, bd_d,
                                              t_max=btmax_d, k_max=kmax))

    timeit("shadow streamed sorted",
           lambda: ts.occluded_streamed(bb, bro_d, sd_d, t_max=btmax_d,
                                        sort=True))
    timeit("shadow binned r1",
           lambda: tbn.occluded_binned(bb, bro_d, sd_d, t_max=btmax_d,
                                       rounds=1))

    # parity spot check
    h0 = ts.closest_hit_streamed(bb, bro_d, bd_d, t_max=btmax_d, sort=True)
    h1 = tbn.closest_hit_binned_all(bb, bro_d, bd_d, t_max=btmax_d,
                                    k_max=kmax)
    t0a, t1a = np.asarray(h0.t), np.asarray(h1.t)
    print(f"binned_all vs sorted t mismatches: {(t0a != t1a).sum()}")


if __name__ == "__main__":
    main()
