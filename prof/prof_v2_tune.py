"""Tune v2 kernel: block size x LIST_CAP, cornell + terrain."""
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
from prof_micro import camera_rays, incoherent_rays, timeit


def flatten(vkr_scene):
    fl = Scene.from_vkr_scene(vkr_scene).flatten_world()
    return (np.asarray(fl.v0, np.float32), np.asarray(fl.e1, np.float32),
            np.asarray(fl.e2, np.float32))


def main():
    print("device:", jax.devices()[0])
    n = 262144

    scenes = [
        ("cornell", flatten(procedural.cornell_box())),
        ("terrain31k", flatten(procedural.terrain(grid=126))),
    ]
    for name, (v0, e1, e2) in scenes:
        tb = bvh_mod.build_threaded_bvh(v0, e1, e2, leaf_size=128)
        bb1 = tp.pack_for_pallas(tb)
        bb2 = tp2.pack_for_pallas2(tb)
        print(f"--- {name}: {len(v0)} tris, {tb.num_nodes} nodes")
        for rays_name, mk in [("coh", camera_rays), ("inc", incoherent_rays)]:
            ro, rd = mk(n, v0)
            ro_d, rd_d = jnp.asarray(ro), jnp.asarray(rd)
            ms1 = timeit(lambda: tp.closest_hit_pallas(bb1, ro_d, rd_d))
            print(f"  {rays_name}: v1 block512 {ms1:7.1f} ms ({n/ms1/1e3:7.2f} Mray/s)")
            for block in (256, 512, 1024, 2048):
                ms2 = timeit(
                    lambda: tp2.closest_hit_pallas2(bb2, ro_d, rd_d, block=block)
                )
                print(f"  {rays_name}: v2 block{block:<5} {ms2:7.1f} ms "
                      f"({n/ms2/1e3:7.2f} Mray/s)  {ms1/ms2:5.2f}x")


if __name__ == "__main__":
    main()
