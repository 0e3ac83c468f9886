"""Round-5 v3 kernel A/B: flush granularity (groups), leaf size, and
shadow-sort policy on REALISTIC deep-bounce queues.

prof_r4_v3.py measured bounce queues whose origins are PRIMARY hits
(swizzle-coherent); the round-4 frame's wall is bounce >= 1 queues whose
origins are scattered surface points (prof_r4_shade items 1-3: closest
sorted 486 ms, occluded unsorted 2371 / sorted 584 per 524K worst-case).
This builds bounce-1 AND bounce-2 queues by actually tracing the village
camera + two diffuse bounces, then A/Bs:

  - groups 4 (round-4 quarters) vs 8 (128-lane groups): finer per-group
    packet bounds -> fewer leaves flushed per lane, 2x broad phase;
  - leaf 128 vs 64: tighter leaf boxes -> fewer false tris per flush,
    2x leaf count;
  - shadow queues: unsorted (round-4 policy) vs sorted by own origins,
    block 512 vs 1024.

Run on chip: PYTHONPATH=.:/root/.axon_site python prof/prof_r5_v3b.py
"""

import sys
import time

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

N = 524288
W, H = 1024, 512


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


def diffuse_bounce(flat, ro, rd, t, tri, rng):
    """Cosine-hemisphere bounce from hits (dead lanes get tmax 0)."""
    n = len(t)
    hit_mask = tri >= 0
    p = ro + rd * np.minimum(t, 1e3)[:, None]
    nrm = np.cross(flat.e1, flat.e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    gn = nrm[np.clip(tri, 0, flat.num_tris - 1)]
    gn = np.where((np.sum(gn * rd, axis=1) > 0)[:, None], -gn, gn)
    u1, u2 = rng.random(n, np.float32), rng.random(n, np.float32)
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
    return bro, bd, btmax, gn, hit_mask


def main():
    sc = Scene.from_vkr_scene(procedural.village())
    eye = np.array([0, 4.0, 13.0], np.float32)
    look = np.array([0, 0.5, 0], np.float32)
    flat = sc.flatten_world()
    print(f"village: {flat.num_tris} tris", flush=True)

    bbs = {}
    for ls in (128, 64):
        tb = bvh_mod.thread_bvh(
            bvh_mod.build_bvh_sah(flat.v0, flat.e1, flat.e2, leaf_size=ls),
            flat.v0, flat.e1, flat.e2,
        )
        bbs[ls] = tp3.PallasBVH3Buffers(tp2.pack_for_pallas2(tb))
        print(f"leaf {ls}: nodes={bbs[ls].bb.num_nodes} "
              f"leaves={bbs[ls].num_leaves}", flush=True)

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

    bb = bbs[128]
    h0 = tp2.closest_hit_pallas2(bb.bb, jnp.asarray(ro), jnp.asarray(d))
    t0_np, tri0 = np.asarray(h0.t), np.asarray(h0.tri)
    b1_ro, b1_rd, b1_tmax, _, m0 = diffuse_bounce(flat, ro, d, t0_np, tri0, rng)
    print(f"primary hit fraction: {m0.mean():.3f}", flush=True)

    h1 = tp2.closest_hit_pallas2(
        bb.bb, jnp.asarray(b1_ro), jnp.asarray(b1_rd),
        t_max=jnp.asarray(b1_tmax),
    )
    t1_np, tri1 = np.asarray(h1.t), np.asarray(h1.tri)
    tri1 = np.where(b1_tmax > 0, tri1, -1)
    b2_ro, b2_rd, b2_tmax, _, m1 = diffuse_bounce(
        flat, b1_ro, b1_rd, t1_np, tri1, rng
    )
    print(f"bounce-1 hit fraction: {m1.mean():.3f}", flush=True)

    sun = np.array([0.35, 0.8, 0.3], np.float32)
    sun /= np.linalg.norm(sun)
    sd = np.broadcast_to(sun, (N, 3)).astype(np.float32).copy()

    dev = {
        "b1": (jnp.asarray(b1_ro), jnp.asarray(b1_rd), jnp.asarray(b1_tmax)),
        "b2": (jnp.asarray(b2_ro), jnp.asarray(b2_rd), jnp.asarray(b2_tmax)),
        # shadow-from-bounce1-hits: origins = b2 origins, dir = sun
        "s2": (jnp.asarray(b2_ro), jnp.asarray(sd), jnp.asarray(b2_tmax)),
    }

    for qname in ("b1", "b2"):
        o, dd, tm = dev[qname]
        for ls in (128, 64):
            for g in (4, 8):
                timeit(
                    f"closest {qname} sorted blk1024 leaf{ls} groups{g}",
                    lambda o=o, dd=dd, tm=tm, ls=ls, g=g:
                    tp3.closest_hit_pallas3(
                        bbs[ls], o, dd, t_max=tm, compact=True,
                        block=1024, groups=g,
                    ),
                )

    o, dd, tm = dev["s2"]
    timeit("shadow s2 UNSORTED blk512 leaf128 groups4 (r4 policy)",
           lambda: tp3.occluded_pallas3(bbs[128], o, dd, t_max=tm))
    for ls in (128, 64):
        for g, blk in ((4, 512), (4, 1024), (8, 1024)):
            timeit(
                f"shadow s2 sorted blk{blk} leaf{ls} groups{g}",
                lambda ls=ls, g=g, blk=blk: tp3.occluded_pallas3(
                    bbs[ls], o, dd, t_max=tm, compact=True,
                    block=blk, groups=g,
                ),
            )

    # exactness: groups-8 v3 vs v2 on the b2 queue (leaf 128: the leaf-64
    # node table exceeds v2's SMEM window, and leaf 64 lost the A/B
    # anyway; v3 groups-4 vs groups-8 leaf-64 parity is covered by the
    # CPU interpret tests)
    o, dd, tm = dev["b2"]
    hv2 = tp2.closest_hit_pallas2(bbs[128].bb, o, dd, t_max=tm, compact=True)
    hv3 = tp3.closest_hit_pallas3(bbs[128], o, dd, t_max=tm, compact=True,
                                  block=1024, groups=8)
    assert np.array_equal(np.asarray(hv2.t), np.asarray(hv3.t))
    assert np.array_equal(np.asarray(hv2.tri), np.asarray(hv3.tri))
    so, sdd, stm = dev["s2"]
    ov2 = np.asarray(tp2.occluded_pallas2(bbs[128].bb, so, sdd, t_max=stm))
    ov3 = np.asarray(tp3.occluded_pallas3(bbs[128], so, sdd, t_max=stm,
                                          compact=True, block=1024,
                                          groups=8))
    assert np.array_equal(ov2, ov3)
    print("groups-8 v3 == v2: bit-exact OK on chip", flush=True)


if __name__ == "__main__":
    main()
