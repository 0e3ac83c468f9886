"""Round-3 microbenchmarks (run on the real TPU chip).

Measures the quantities that drive the traversal-kernel redesign:
  1. resident-kernel closest-hit time on an 80k-tri terrain (262k swizzled
     primaries) + a host-side simulation of the shared-cursor walk to get
     node-steps/block -> per-step cost,
  2. same with incoherent bounce-like rays,
  3. argsort + packed permutation-gather cost at 524288 (the compaction
     machinery building blocks),
  4. dense MT leaf cost in isolation (cornell: 1-leaf scene).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import bvh as bvh_mod
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas as tp
from realtimepathtracingresearchframework_tpu.ops.integrator import _swizzle_host


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0:1]


def timeit(fn, iters=8):
    fn()  # compile
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def flatten_scene(grid):
    sc = Scene.from_vkr_scene(procedural.terrain(grid=grid))
    fl = sc.flatten_world()
    v0 = np.asarray(fl.v0, np.float32)
    e1 = np.asarray(fl.e1, np.float32)
    e2 = np.asarray(fl.e2, np.float32)
    return v0, e1, e2


def camera_rays(n_rays, v0):
    """Swizzled primaries aimed at the terrain from above."""
    w, h = 512, 512
    px, py, valid, _lin, _inv, nc, chunk = _swizzle_host(w, h)
    px, py = px[:n_rays], py[:n_rays]
    eye = np.array([0, 5.0, 12.0], np.float32)
    center = np.array([0, 0, 0], np.float32)
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    fov = np.tan(np.radians(55 / 2))
    u = (px + 0.5) / w * 2 - 1
    v = (py + 0.5) / h * 2 - 1
    rd = (fwd[None] + u[:, None] * fov * right[None] + v[:, None] * fov * up[None])
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    ro = np.broadcast_to(eye, rd.shape).copy()
    return ro.astype(np.float32), rd.astype(np.float32)


def incoherent_rays(n_rays, v0):
    rng = np.random.default_rng(0)
    lo, hi = v0.min(axis=0), v0.max(axis=0)
    ro = rng.uniform(lo, hi, (n_rays, 3)).astype(np.float32)
    rd = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return ro, rd


def sim_walk_steps(tb, ro, rd, block=512, max_blocks=32):
    """Host simulation of the shared-cursor walk: returns (internal-steps,
    leaf-steps) averaged per block."""
    nodes = tb.nodes
    bmin = nodes[:, 0:3]
    bmax = nodes[:, 3:6]
    skip = nodes[:, 6].view(np.int32)
    leaf_row = nodes[:, 7].view(np.int32)
    n_nodes = len(nodes)
    tot_int, tot_leaf = 0, 0
    nb = min(len(ro) // block, max_blocks)
    for b in range(nb):
        o = ro[b * block:(b + 1) * block]
        d = rd[b * block:(b + 1) * block]
        inv = np.where(d >= 0, 1.0, -1.0) / np.maximum(np.abs(d), 1e-20)
        cur = 0
        tbest = np.full(block, 2.0e32, np.float32)
        steps_i = steps_l = 0
        while cur < n_nodes:
            t0 = (bmin[cur] - o) * inv
            t1 = (bmax[cur] - o) * inv
            te = np.maximum(np.minimum(t0, t1).max(axis=1), 0.0)
            tx = np.minimum(np.maximum(t0, t1).min(axis=1), tbest.max())
            live = np.any(te <= tx)
            if leaf_row[cur] >= 0:
                steps_l += 1
                # approximate leaf hit effect: clip tbest by entry distance
                if live:
                    tbest = np.minimum(tbest, np.where(te <= tx, tx, tbest))
                cur = skip[cur]
            else:
                steps_i += 1
                cur = cur + 1 if live else skip[cur]
        tot_int += steps_i
        tot_leaf += steps_l
    return tot_int / nb, tot_leaf / nb


def main():
    print("device:", jax.devices()[0])
    n = 262144

    for grid, label in [(126, "80k"), (316, "500k")]:
        v0, e1, e2 = flatten_scene(grid)
        t = len(v0)
        print(f"--- terrain {label}: {t} tris")
        for ls in (128,):
            tb = bvh_mod.build_threaded_bvh(v0, e1, e2, leaf_size=ls)
            print(f"  leaf={ls} nodes={tb.num_nodes}")
            ro, rd = camera_rays(n, v0)
            si, sl = sim_walk_steps(tb, ro, rd)
            print(f"  coherent walk: {si:.0f} internal + {sl:.0f} leaf steps/block")
            roi, rdi = incoherent_rays(n, v0)
            si2, sl2 = sim_walk_steps(tb, roi, rdi)
            print(f"  incoherent walk: {si2:.0f} internal + {sl2:.0f} leaf steps/block")
            if t < 100000:
                bb = tp.pack_for_pallas(tb)
                ro_d = jnp.asarray(ro); rd_d = jnp.asarray(rd)

                def run():
                    return tp.closest_hit_pallas(bb, ro_d, rd_d)

                ms = timeit(run)
                tot = si + sl
                print(f"  pallas resident closest: {ms:.1f} ms "
                      f"({n/ms/1e3:.2f} Mray/s), "
                      f"~{ms*1e6/(n/512)/max(tot,1):.0f} ns/step/block")
                roi_d = jnp.asarray(roi); rdi_d = jnp.asarray(rdi)

                def run2():
                    return tp.closest_hit_pallas(bb, roi_d, rdi_d)

                ms2 = timeit(run2)
                print(f"  pallas resident incoherent: {ms2:.1f} ms "
                      f"({n/ms2/1e3:.2f} Mray/s)")

    # --- sort / gather costs at 524288
    m = 524288
    rng = np.random.default_rng(1)
    keys = jnp.asarray(rng.integers(0, 2**31, m, dtype=np.int32))
    state = jnp.asarray(rng.normal(size=(32, m)).astype(np.float32))

    @jax.jit
    def do_sort(k):
        return jnp.argsort(k)

    ms = timeit(lambda: do_sort(keys))
    print(f"argsort 524288 i32: {ms:.2f} ms")

    @jax.jit
    def do_sort1(k):
        return jnp.argsort((k & 1).astype(jnp.uint8), stable=True)

    ms = timeit(lambda: do_sort1(keys))
    print(f"argsort 524288 1-bit stable: {ms:.2f} ms")

    perm = do_sort(keys)

    @jax.jit
    def do_gather(s, p):
        return jnp.take(s, p, axis=1)

    ms = timeit(lambda: do_gather(state, perm))
    print(f"packed (32, 524288) perm-gather: {ms:.2f} ms")

    @jax.jit
    def do_cumsum(k):
        a = (k & 1)
        return jnp.cumsum(a)

    ms = timeit(lambda: do_cumsum(keys))
    print(f"cumsum 524288: {ms:.2f} ms")

    # 1-D gathers, separate (the current integrator finding)
    cols = [jnp.asarray(rng.normal(size=m).astype(np.float32)) for _ in range(4)]

    @jax.jit
    def do_g1(cs, p):
        return [c[p] for c in cs]

    ms = timeit(lambda: do_g1(cols, perm))
    print(f"4 separate 1-D 524288 gathers: {ms:.2f} ms")


if __name__ == "__main__":
    main()
