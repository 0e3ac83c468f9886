"""Round-4: v3 flat-cull kernel vs v2 tree walk on the village queues.

Same scene/queue construction as prof_r4_village.py (bench camera
primaries, diffuse bounce + sun shadow from the primary hits); adds the
v3 flat vectorized leaf cull (ops/traverse_pallas3.py) with sorted and
unsorted dispatch at block 512 (quarter flush masks) and block 256.

Run on chip: python prof/prof_r4_v3.py [--scene terrain|village]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import bvh as bvh_mod
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas2 as tp2
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas3 as tp3

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
    print(f"{name:52s} {dt:9.2f} ms   {N / dt / 1e3:8.2f} Mray/s")
    return dt


def main():
    scene_name = "village"
    if "--scene" in sys.argv:
        scene_name = sys.argv[sys.argv.index("--scene") + 1]
    if scene_name == "village":
        sc = Scene.from_vkr_scene(procedural.village())
        eye = np.array([0, 4.0, 13.0], np.float32)
        look = np.array([0, 0.5, 0], np.float32)
    else:
        sc = Scene.from_vkr_scene(procedural.terrain(grid=300))
        eye = np.array([0, 5.0, 12.0], np.float32)
        look = np.array([0, 0, 0], np.float32)
    flat = sc.flatten_world()
    print(f"{scene_name}: {flat.num_tris} tris")

    tb = bvh_mod.thread_bvh(
        bvh_mod.build_bvh_sah(flat.v0, flat.e1, flat.e2, leaf_size=128),
        flat.v0, flat.e1, flat.e2,
    )
    bb = tp2.pack_for_pallas2(tb)
    bb3 = tp3.PallasBVH3Buffers(bb)
    print(f"nodes={bb.num_nodes} leaves={bb3.num_leaves}")

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
    ro_d = jnp.asarray(ro)
    rd_d = jnp.asarray(d)

    hit = tp2.closest_hit_pallas2(bb, ro_d, rd_d)
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

    timeit("primary v2 walk (sorted)",
           lambda: tp2.closest_hit_pallas2(bb, ro_d, rd_d, compact=True))
    timeit("primary v3 flat (sorted)",
           lambda: tp3.closest_hit_pallas3(bb3, ro_d, rd_d, compact=True))
    timeit("primary v3 flat (unsorted)",
           lambda: tp3.closest_hit_pallas3(bb3, ro_d, rd_d))
    timeit("bounce v2 walk (sorted)",
           lambda: tp2.closest_hit_pallas2(
               bb, bro_d, bd_d, t_max=btmax_d, compact=True))
    timeit("bounce v3 flat (sorted)",
           lambda: tp3.closest_hit_pallas3(
               bb3, bro_d, bd_d, t_max=btmax_d, compact=True))
    timeit("bounce v3 flat (sorted, block 1024)",
           lambda: tp3.closest_hit_pallas3(
               bb3, bro_d, bd_d, t_max=btmax_d, compact=True, block=1024))
    timeit("bounce v3 flat (unsorted, block 1024)",
           lambda: tp3.closest_hit_pallas3(
               bb3, bro_d, bd_d, t_max=btmax_d, block=1024))
    timeit("shadow v2 walk (sorted)",
           lambda: tp2.occluded_pallas2(
               bb, bro_d, sd_d, t_max=btmax_d, compact=True))
    timeit("shadow v2 walk (unsorted)",
           lambda: tp2.occluded_pallas2(bb, bro_d, sd_d, t_max=btmax_d))
    timeit("shadow v3 flat (sorted)",
           lambda: tp3.occluded_pallas3(
               bb3, bro_d, sd_d, t_max=btmax_d, compact=True))
    timeit("shadow v3 flat (unsorted)",
           lambda: tp3.occluded_pallas3(bb3, bro_d, sd_d, t_max=btmax_d))
    timeit("shadow v3 flat (unsorted, block 1024)",
           lambda: tp3.occluded_pallas3(
               bb3, bro_d, sd_d, t_max=btmax_d, block=1024))

    h2 = tp2.closest_hit_pallas2(bb, bro_d, bd_d, t_max=btmax_d,
                                 compact=True)
    h3 = tp3.closest_hit_pallas3(bb3, bro_d, bd_d, t_max=btmax_d,
                                 compact=True)
    assert np.array_equal(np.asarray(h2.t), np.asarray(h3.t)), "t mismatch"
    assert np.array_equal(np.asarray(h2.tri), np.asarray(h3.tri))
    o2 = np.asarray(tp2.occluded_pallas2(bb, bro_d, sd_d, t_max=btmax_d))
    o3 = np.asarray(tp3.occluded_pallas3(bb3, bro_d, sd_d, t_max=btmax_d))
    assert np.array_equal(o2, o3)
    print("v3 == v2: bit-exact OK on chip")


if __name__ == "__main__":
    main()
