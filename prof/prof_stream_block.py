"""Streamed kernel: block-size sweep for incoherent (bounce-like) rays."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.ops import traverse_stream as ts
from prof_micro import camera_rays, flatten_scene, incoherent_rays, timeit


def main():
    print("device:", jax.devices()[0])
    n = 262144
    v0, e1, e2 = flatten_scene(501)
    print(f"terrain {len(v0)} tris")
    sb = ts.pack_streamed(v0, e1, e2)
    print(f"subtrees={sb.sub_nodes.shape[0] // ts.SUB_NODE_ROWS} "
          f"top_nodes={sb.num_top_nodes}")
    for name, mk in [("coh", camera_rays), ("inc", incoherent_rays)]:
        ro, rd = mk(n, v0)
        ro_d, rd_d = jnp.asarray(ro), jnp.asarray(rd)
        comps = (ro_d[:, 0], ro_d[:, 1], ro_d[:, 2],
                 rd_d[:, 0], rd_d[:, 1], rd_d[:, 2])
        for block in (128, 256, 512):
            for sort in ((False, True) if block == 512 else (True,)):
                try:
                    ms = timeit(lambda: ts.closest_hit_streamed(
                        sb, None, None, comps=comps, sort=sort, block=block))
                    print(f"  {name} block={block} sort={sort}: {ms:8.1f} ms "
                          f"({n/ms/1e3:6.2f} Mray/s)")
                except Exception as e:
                    print(f"  {name} block={block} sort={sort}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
