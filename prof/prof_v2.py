"""v2 traversal kernel: correctness (vs XLA threaded) + perf vs v1."""

import os
import sys
import time

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.ops import bvh as bvh_mod
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas as tp
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas2 as tp2
from realtimepathtracingresearchframework_tpu.ops.traverse import (
    closest_hit_threaded,
    occluded_threaded,
    threaded_to_device,
)
from prof_micro import camera_rays, flatten_scene, incoherent_rays, timeit


def main():
    cpu = "--cpu" in sys.argv
    if cpu:
        tp2.INTERPRET = True
    print("device:", jax.devices()[0])

    grid = 33 if cpu else 126
    n = 4096 if cpu else 262144
    v0, e1, e2 = flatten_scene(grid)
    t = len(v0)
    print(f"terrain {t} tris")
    tb = bvh_mod.build_threaded_bvh(v0, e1, e2, leaf_size=128)
    bb2 = tp2.pack_for_pallas2(tb)
    print(f"nodes={tb.num_nodes} leaves={bb2.num_leaves}")

    for name, mk in [("coherent", camera_rays), ("incoherent", incoherent_rays)]:
        ro, rd = mk(n, v0)
        ro_d, rd_d = jnp.asarray(ro), jnp.asarray(rd)
        h2 = tp2.closest_hit_pallas2(bb2, ro_d, rd_d)
        if cpu:
            href = closest_hit_threaded(
                threaded_to_device(tb), ro_d, rd_d, leaf_size=128
            )
            t2 = np.asarray(h2.t)
            tr = np.asarray(href.t)
            match_t = np.mean((t2 == tr) | (~np.isfinite(t2) & (tr >= 1e30)))
            match_tri = np.mean(np.asarray(h2.tri) == np.asarray(href.tri))
            print(f"  {name}: t-match {match_t*100:.3f}% tri-match {match_tri*100:.3f}%")
            # occlusion
            tmax_occ = np.asarray(href.t) * 0.999
            tmax_occ[~np.isfinite(tmax_occ) | (tmax_occ > 1e30)] = 1e30
            o2 = tp2.occluded_pallas2(bb2, ro_d, rd_d, t_max=jnp.asarray(tmax_occ))
            oref = occluded_threaded(
                threaded_to_device(tb), ro_d, rd_d, t_max=jnp.asarray(tmax_occ),
                leaf_size=128,
            )
            print(f"  {name}: occl-match {np.mean(np.asarray(o2)==np.asarray(oref))*100:.3f}%")

        if not cpu:
            bb1 = tp.pack_for_pallas(tb)
            ms1 = timeit(lambda: tp.closest_hit_pallas(bb1, ro_d, rd_d))
            ms2 = timeit(lambda: tp2.closest_hit_pallas2(bb2, ro_d, rd_d))
            print(f"  {name}: v1 {ms1:.1f} ms ({n/ms1/1e3:.2f} Mray/s)  "
                  f"v2 {ms2:.1f} ms ({n/ms2/1e3:.2f} Mray/s)  {ms1/ms2:.2f}x")
            h1 = tp.closest_hit_pallas(bb1, ro_d, rd_d)
            bit = np.array_equal(np.asarray(h1.t), np.asarray(h2.t)) and \
                np.array_equal(np.asarray(h1.u), np.asarray(h2.u))
            print(f"  {name}: v1/v2 bit-identical: {bit}")


if __name__ == "__main__":
    main()
