"""Round-5 terrain A/B (VERDICT r4 #3): stream_closest strategies ON
TERRAIN + the v3 flat-cull route for streamed-scale scenes.

Round 3 A/B'd the streamed closest strategies on village only; this
measures them on the actual terrain workload (500k tris, 512x384-ish
queue sizes), and adds the round-5 candidate: the v3 flat-cull kernel in
STREAM mode (ops/traverse_pallas3.py stream=True — global leaf-AABB
broad phase in VMEM, per-surviving-leaf 8 KB tile DMA double-buffered
from HBM). At 500k tris the global leaf table is 3907 leaves = 254 KB
VMEM + a 254 KB SMEM mask row, so the whole scene takes the flat cull
the way village does — no subtree walk at all, and the only DMA traffic
is leaves that actually survive the cull.

Run on chip: PYTHONPATH=.:/root/.axon_site python prof/prof_r5_terrain.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import bvh as bvh_mod
from realtimepathtracingresearchframework_tpu.ops import traverse_binned as tbn
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas2 as tp2
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas3 as tp3
from realtimepathtracingresearchframework_tpu.ops import traverse_stream as ts

N = 196608  # the terrain frame's actual queue size (512*384)
W, H = 512, 384


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def timeit(name, fn, iters=6):
    o = fn()
    sync(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn()
    sync(o)
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{name:58s} {dt:9.2f} ms   {N / dt / 1e3:8.2f} Mray/s",
          flush=True)
    return dt


def main():
    sc = Scene.from_vkr_scene(procedural.terrain(grid=500))
    flat = sc.flatten_world()
    print(f"terrain: {flat.num_tris} tris", flush=True)
    eye = np.array([0, 5.0, 12.0], np.float32)
    look = np.array([0, 0, 0], np.float32)

    # current streamed pack (f32) at the renderer's default granularity
    sbb = ts.pack_streamed(flat.v0, flat.e1, flat.e2)
    print(f"streamed: {sbb.num_subtrees} subtrees, "
          f"sub_leaves {sbb.sub_leaves}", flush=True)

    # v3-stream pack: flat SAH BVH, 128-tri leaves, tiles in HBM
    tb = bvh_mod.thread_bvh(
        bvh_mod.build_bvh_sah(flat.v0, flat.e1, flat.e2, leaf_size=128),
        flat.v0, flat.e1, flat.e2,
    )
    bb3 = tp3.pack_for_pallas3(tb, stream=True)
    print(f"v3-stream: {bb3.num_leaves} leaves "
          f"(mask {bb3.aabbs.shape[1] * 4 / 1024:.0f} KB/row)", flush=True)

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

    h0 = ts.closest_hit_streamed(
        sbb, jnp.asarray(ro), jnp.asarray(d), sort=True
    )
    t0_np, tri0 = np.asarray(h0.t), np.asarray(h0.tri)
    m0 = tri0 >= 0
    print(f"primary hit fraction: {m0.mean():.3f}", flush=True)

    # diffuse bounce queue from primary hits
    p = ro + d * np.minimum(t0_np, 1e3)[:, None]
    nrm = np.cross(flat.e1, flat.e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    gn = nrm[np.clip(tri0, 0, flat.num_tris - 1)]
    gn = np.where((np.sum(gn * d, axis=1) > 0)[:, None], -gn, gn)
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
    btmax = np.where(m0, 2.0e32, 0.0).astype(np.float32)
    sun = np.array([0.4, 0.7, 0.2], np.float32)
    sun /= np.linalg.norm(sun)
    sd = np.broadcast_to(sun, (N, 3)).astype(np.float32).copy()

    ro_d, d_d = jnp.asarray(ro), jnp.asarray(d)
    bro_d, bd_d = jnp.asarray(bro), jnp.asarray(bd)
    btmax_d = jnp.asarray(btmax)
    sd_d = jnp.asarray(sd)

    # ---- primary queue
    timeit("primary streamed sorted (default)",
           lambda: ts.closest_hit_streamed(sbb, ro_d, d_d, sort=True))
    timeit("primary streamed ordered",
           lambda: ts.closest_hit_streamed(sbb, ro_d, d_d, sort=True,
                                           ordered=True))
    timeit("primary v3-stream blk512 sorted",
           lambda: tp3.closest_hit_pallas3(bb3, ro_d, d_d, compact=True))
    timeit("primary v3-stream blk512 unsorted",
           lambda: tp3.closest_hit_pallas3(bb3, ro_d, d_d))
    timeit("primary v3-stream blk1024 sorted",
           lambda: tp3.closest_hit_pallas3(bb3, ro_d, d_d, compact=True,
                                           block=1024))

    # ---- bounce queue (the VERDICT-asked on-terrain strategy A/B)
    timeit("bounce streamed sorted (default)",
           lambda: ts.closest_hit_streamed(sbb, bro_d, bd_d,
                                           t_max=btmax_d, sort=True))
    timeit("bounce streamed ordered",
           lambda: ts.closest_hit_streamed(sbb, bro_d, bd_d, t_max=btmax_d,
                                           sort=True, ordered=True))
    timeit("bounce binned",
           lambda: tbn.closest_hit_binned(
               sbb, bro_d, bd_d, t_max=btmax_d))
    timeit("bounce multislot",
           lambda: tbn.closest_hit_binned_all(
               sbb, bro_d, bd_d, t_max=btmax_d))
    timeit("bounce v3-stream blk512 sorted",
           lambda: tp3.closest_hit_pallas3(bb3, bro_d, bd_d, t_max=btmax_d,
                                           compact=True))
    timeit("bounce v3-stream blk1024 sorted",
           lambda: tp3.closest_hit_pallas3(bb3, bro_d, bd_d, t_max=btmax_d,
                                           compact=True, block=1024))

    # ---- shadow queue from primary hits
    timeit("shadow binned rounds=1 (default)",
           lambda: tbn.occluded_binned(sbb, bro_d, sd_d, t_max=btmax_d,
                                       rounds=1))
    timeit("shadow streamed sorted",
           lambda: ts.occluded_streamed(sbb, bro_d, sd_d, t_max=btmax_d,
                                        sort=True))
    timeit("shadow v3-stream blk512 sorted",
           lambda: tp3.occluded_pallas3(bb3, bro_d, sd_d, t_max=btmax_d,
                                        compact=True))
    timeit("shadow v3-stream blk512 unsorted",
           lambda: tp3.occluded_pallas3(bb3, bro_d, sd_d, t_max=btmax_d))

    # exactness: v3-stream vs the streamed walk on the bounce queue
    hs = ts.closest_hit_streamed(sbb, bro_d, bd_d, t_max=btmax_d, sort=True)
    h3 = tp3.closest_hit_pallas3(bb3, bro_d, bd_d, t_max=btmax_d,
                                 compact=True)
    ts_t, t3 = np.asarray(hs.t), np.asarray(h3.t)
    live = btmax > 0
    # different BVHs (subtree-chunked vs flat SAH): t must agree to fp
    # noise on live lanes, tri ids can differ on exact ties
    ok = np.isclose(ts_t[live], t3[live], rtol=1e-6, atol=1e-6)
    print(f"t agreement vs streamed walk: {ok.mean() * 100:.3f}%",
          flush=True)
    ov3 = np.asarray(tp3.occluded_pallas3(bb3, bro_d, sd_d, t_max=btmax_d,
                                          compact=True))
    ovs = np.asarray(tbn.occluded_binned(sbb, bro_d, sd_d, t_max=btmax_d,
                                         rounds=1))
    print(f"occluded agreement: {(ov3 == ovs).mean() * 100:.3f}%",
          flush=True)


if __name__ == "__main__":
    main()
