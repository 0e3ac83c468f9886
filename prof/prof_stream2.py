"""Streamed kernel v2: parity vs resident v2 + perf on 500k terrain."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.ops import bvh as bvh_mod
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas2 as tp2
from realtimepathtracingresearchframework_tpu.ops import traverse_stream as ts
from prof_micro import camera_rays, flatten_scene, incoherent_rays, timeit


def main():
    print("device:", jax.devices()[0])
    n = 262144

    # parity on a small scene vs resident v2 (both walk the same data)
    v0, e1, e2 = flatten_scene(80)
    sb = ts.pack_streamed(v0, e1, e2)
    tb = bvh_mod.build_threaded_bvh(v0, e1, e2, leaf_size=128)
    bb2 = tp2.pack_for_pallas2(tb)
    ro, rd = camera_rays(65536, v0)
    ro_d, rd_d = jnp.asarray(ro), jnp.asarray(rd)
    hs = ts.closest_hit_streamed(sb, ro_d, rd_d)
    hr = tp2.closest_hit_pallas2(bb2, ro_d, rd_d)
    t_s, t_r = np.asarray(hs.t), np.asarray(hr.t)
    print("parity small coherent: t-match",
          np.mean((t_s == t_r) | ((t_s >= 1e30) & (t_r >= 1e30))))
    roi, rdi = incoherent_rays(65536, v0)
    hs = ts.closest_hit_streamed(sb, jnp.asarray(roi), jnp.asarray(rdi))
    hr = tp2.closest_hit_pallas2(bb2, jnp.asarray(roi), jnp.asarray(rdi))
    t_s, t_r = np.asarray(hs.t), np.asarray(hr.t)
    print("parity small incoherent: t-match",
          np.mean((t_s == t_r) | ((t_s >= 1e30) & (t_r >= 1e30))))
    os = ts.occluded_streamed(sb, ro_d, rd_d, t_max=8.0)
    orr = tp2.occluded_pallas2(bb2, ro_d, rd_d, t_max=8.0)
    print("parity occl:", np.mean(np.asarray(os) == np.asarray(orr)))

    # perf on 500k
    v0, e1, e2 = flatten_scene(501)
    print(f"terrain {len(v0)} tris")
    sb = ts.pack_streamed(v0, e1, e2)
    print(f"subtrees={sb.sub_nodes.shape[0] // ts.SUB_NODE_ROWS} "
          f"top_nodes={sb.num_top_nodes}")
    for name, mk in [("coh", camera_rays), ("inc", incoherent_rays)]:
        ro, rd = mk(n, v0)
        ro_d, rd_d = jnp.asarray(ro), jnp.asarray(rd)
        for sort in (False, True):
            comps = (ro_d[:, 0], ro_d[:, 1], ro_d[:, 2],
                     rd_d[:, 0], rd_d[:, 1], rd_d[:, 2])
            ms = timeit(lambda: ts.closest_hit_streamed(
                sb, None, None, comps=comps, sort=sort))
            print(f"  {name} sort={sort}: {ms:8.1f} ms ({n/ms/1e3:7.2f} Mray/s)")


if __name__ == "__main__":
    main()
