"""Cornell-scale dispatch cost: v1 vs v2 resident kernel, isolated."""
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
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas as tp
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas2 as tp2
from prof_micro import timeit


def main():
    print("device:", jax.devices()[0])
    scene = Scene.from_vkr_scene(procedural.cornell_box())
    flat = scene.flatten_world()
    print(f"cornell {flat.num_tris} tris")
    tb = bvh_mod.build_threaded_bvh(flat.v0, flat.e1, flat.e2, leaf_size=128)
    bb1 = tp.pack_for_pallas(tb)
    bb2 = tp2.pack_for_pallas2(tb)
    print(f"nodes={tb.num_nodes}")

    n = 524288
    rng = np.random.default_rng(7)
    # interior bounce-like rays: origins in the box, random dirs
    ro = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    ro[:, 1] = rng.uniform(0.1, 1.9, n).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro_d, rd_d = jnp.asarray(ro), jnp.asarray(rd)
    comps = (ro_d[:, 0], ro_d[:, 1], ro_d[:, 2],
             rd_d[:, 0], rd_d[:, 1], rd_d[:, 2])

    # 90%-dead queue: the bounce-wave shape (tmax=0 on dead lanes)
    alive = (np.arange(n) % 10) == 0
    tmax_dead = jnp.asarray(np.where(alive, 2e32, 0.0).astype(np.float32))

    def pair(label, f1, f2, iters=24):
        a1 = timeit(f1, iters)
        a2 = timeit(f2, iters)
        b1 = timeit(f1, iters)
        b2 = timeit(f2, iters)
        print(f"{label}: v1 {min(a1, b1):.2f} ms  v2 {min(a2, b2):.2f} ms"
              f"   (runs v1 {a1:.1f}/{b1:.1f} v2 {a2:.1f}/{b2:.1f})")

    pair("closest 524k",
         lambda: tp.closest_hit_pallas(bb1, None, None, comps=comps),
         lambda: tp2.closest_hit_pallas2(bb2, None, None, comps=comps))
    pair("closest 90%dead",
         lambda: tp.closest_hit_pallas(bb1, None, None, comps=comps,
                                       t_max=tmax_dead),
         lambda: tp2.closest_hit_pallas2(bb2, None, None, comps=comps,
                                         t_max=tmax_dead))
    pair("occluded 524k",
         lambda: tp.occluded_pallas(bb1, None, None, comps=comps, t_max=2.0),
         lambda: tp2.occluded_pallas2(bb2, None, None, comps=comps, t_max=2.0))
    pair("occl 90%dead",
         lambda: tp.occluded_pallas(bb1, None, None, comps=comps,
                                    t_max=tmax_dead),
         lambda: tp2.occluded_pallas2(bb2, None, None, comps=comps,
                                      t_max=tmax_dead))
    pair("merged 2x524k",
         lambda: tp.closest_and_occluded_pallas(
             bb1, comps, 0.0, 2e32, comps, 0.0, 2.0),
         lambda: tp2.closest_and_occluded_pallas2(
             bb2, comps, 0.0, 2e32, comps, 0.0, 2.0))


if __name__ == "__main__":
    main()
