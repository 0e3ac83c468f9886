"""Round-5: v4 (per-ray XLA pre-cull) vs v3 (in-kernel union broad
phase) on REAL village bounce queues.

The density study (prof/prof_r5_density.py) quantifies how loose the
per-group union-box mask is vs the OR of exact per-ray slab tests; this
measures whether converting that mask tightening into fewer MT flushes
beats the XLA-side cost of computing (N, Lpad) per-ray tests.

Matrix: queue {b1, b2, s2} x kernel {v3, v4} x block/groups
{512/4, 1024/4, 1024/8} x leaf {128, 64}. Plus on-chip bit-exactness
v4 == v2.

Run on chip: PYTHONPATH=.:/root/.axon_site python prof/prof_r5_v4.py
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
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas2 as tp2
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas3 as tp3

import prof.prof_r5_v3b as v3b

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
    print(f"{name:64s} {dt:9.2f} ms   {N / dt / 1e3:8.2f} Mray/s",
          flush=True)
    return dt


def main():
    sc = Scene.from_vkr_scene(procedural.village())
    flat = sc.flatten_world()
    print(f"village: {flat.num_tris} tris", flush=True)

    bbs = {}
    for ls in (128, 64):
        tb = bvh_mod.thread_bvh(
            bvh_mod.build_bvh_sah(flat.v0, flat.e1, flat.e2, leaf_size=ls),
            flat.v0, flat.e1, flat.e2,
        )
        bbs[ls] = tp3.PallasBVH3Buffers(tp2.pack_for_pallas2(tb))
        print(f"leaf {ls}: leaves={bbs[ls].num_leaves}", flush=True)

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

    bb = bbs[128]
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

    sun = np.array([0.35, 0.8, 0.3], np.float32)
    sun /= np.linalg.norm(sun)
    sd = np.broadcast_to(sun, (N, 3)).astype(np.float32).copy()

    dev = {
        "b1": (jnp.asarray(b1_ro), jnp.asarray(b1_rd), jnp.asarray(b1_tmax)),
        "b2": (jnp.asarray(b2_ro), jnp.asarray(b2_rd), jnp.asarray(b2_tmax)),
        "s2": (jnp.asarray(b2_ro), jnp.asarray(sd), jnp.asarray(b2_tmax)),
    }

    # reference v3 numbers (current defaults: blk1024 g4 sorted)
    for qname in ("b1", "b2"):
        o, dd, tm = dev[qname]
        timeit(
            f"v3 closest {qname} sorted blk1024 g4 leaf128 (current)",
            lambda o=o, dd=dd, tm=tm: tp3.closest_hit_pallas3(
                bbs[128], o, dd, t_max=tm, compact=True, block=1024,
            ),
        )
        for ls in (128, 64):
            for blk, g in ((1024, 4), (1024, 8), (512, 4)):
                timeit(
                    f"v4 closest {qname} sorted blk{blk} g{g} leaf{ls}",
                    lambda o=o, dd=dd, tm=tm, ls=ls, blk=blk, g=g:
                    tp3.closest_hit_pallas4(
                        bbs[ls], o, dd, t_max=tm, compact=True,
                        block=blk, groups=g,
                    ),
                )

    o, dd, tm = dev["s2"]
    timeit(
        "v3 shadow s2 sorted blk512 g4 leaf128 (current)",
        lambda: tp3.occluded_pallas3(bbs[128], o, dd, t_max=tm,
                                     compact=True, block=512),
    )
    for ls in (128, 64):
        for blk, g in ((512, 4), (1024, 4), (1024, 8)):
            timeit(
                f"v4 shadow s2 sorted blk{blk} g{g} leaf{ls}",
                lambda ls=ls, blk=blk, g=g: tp3.occluded_pallas4(
                    bbs[ls], o, dd, t_max=tm, compact=True,
                    block=blk, groups=g,
                ),
            )

    # on-chip exactness: v4 == v2 on the b2 queue + s2 shadow
    o, dd, tm = dev["b2"]
    hv2 = tp2.closest_hit_pallas2(bbs[128].bb, o, dd, t_max=tm, compact=True)
    hv4 = tp3.closest_hit_pallas4(bbs[128], o, dd, t_max=tm, compact=True,
                                  block=1024, groups=4)
    assert np.array_equal(np.asarray(hv2.t), np.asarray(hv4.t))
    assert np.array_equal(np.asarray(hv2.tri), np.asarray(hv4.tri))
    so, sdd, stm = dev["s2"]
    ov2 = np.asarray(tp2.occluded_pallas2(bbs[128].bb, so, sdd, t_max=stm))
    ov4 = np.asarray(tp3.occluded_pallas4(bbs[128], so, sdd, t_max=stm,
                                          compact=True, block=512))
    assert np.array_equal(ov2, ov4)
    print("v4 == v2: bit-exact OK on chip", flush=True)


if __name__ == "__main__":
    main()
