"""Decompose binned-closest cost: entry/select/bin vs kernel vs cleanup."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import traverse_binned as tb
from realtimepathtracingresearchframework_tpu.ops import traverse_stream as ts
from realtimepathtracingresearchframework_tpu.ops.traverse_pallas import (
    _prep_rays,
)
from prof_micro import timeit
from prof_bin import bounce_rays


def main():
    print("device:", jax.devices()[0], flush=True)
    scene = Scene.from_vkr_scene(procedural.terrain(grid=500))
    flat = scene.flatten_world()
    bb = ts.pack_streamed(flat.v0, flat.e1, flat.e2)
    n = 196608
    ro_b, rd_b = bounce_rays(flat, n)
    comps = tuple(jnp.asarray(a) for a in
                  (ro_b[:, 0], ro_b[:, 1], ro_b[:, 2],
                   rd_b[:, 0], rd_b[:, 1], rd_b[:, 2]))
    rays, _ = _prep_rays(None, None, 0.0, tb._INF, 512, comps=comps,
                         wide=True)
    block = 512
    sb = tb.subtree_bounds(bb)
    s = sb.shape[0]
    n_pad = ((rays.shape[1] + (s + 1) * (block - 1)) // block + 1) * block

    @jax.jit
    def prep_only(rays):
        rays2, inv = tb._coherence_perm(bb, rays)
        entry = tb._entry_table(sb, rays2)
        cap = rays2[7]
        sid, mt = tb._next_subtree(
            entry, jnp.full((rays.shape[1],), -tb._INF),
            jnp.full((rays.shape[1],), -1, jnp.int32), cap)
        pos, sid_blk = tb._bin_positions(sid, s, block, n_pad)
        stack = jnp.concatenate(
            [rays2, jnp.zeros((4, rays.shape[1]), jnp.float32)], axis=0)
        padded = jnp.zeros((12, n_pad), jnp.float32).at[:, pos].set(stack)
        return padded.ravel()[0:1], sid_blk[0:1], inv[0:1]

    @jax.jit
    def round1_no_cleanup(rays):
        rays2, inv = tb._coherence_perm(bb, rays)
        entry = tb._entry_table(sb, rays2)
        best = jnp.concatenate(
            [jnp.full((1, rays.shape[1]), tb._INF, jnp.float32),
             jax.lax.bitcast_convert_type(
                 jnp.full((1, rays.shape[1]), -1, jnp.int32), jnp.float32),
             jnp.zeros((2, rays.shape[1]), jnp.float32)], axis=0)
        cap = jnp.minimum(best[0], rays2[7])
        sid, mt = tb._next_subtree(
            entry, jnp.full((rays.shape[1],), -tb._INF),
            jnp.full((rays.shape[1],), -1, jnp.int32), cap)
        pos, sid_blk = tb._bin_positions(sid, s, block, n_pad)
        init = jnp.zeros((12, n_pad), jnp.float32).at[8, :].set(tb._INF)
        init = init.at[9, :].set(
            jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32))
        padded = init.at[:, pos].set(
            jnp.concatenate([rays2, best], axis=0))
        out = tb._dispatch_binned(sid_blk, bb.sub_nodes, bb.tri_tiles,
                                  padded, block=block, shadow=False)
        return out[:, pos][:, inv]

    print(f"  prep-only (perm+entry+select+bin+scatter): "
          f"{timeit(lambda: prep_only(rays)):8.1f} ms", flush=True)
    print(f"  round1 (prep + kernel + unpermute):        "
          f"{timeit(lambda: round1_no_cleanup(rays)):8.1f} ms", flush=True)
    h = tb.closest_hit_binned(bb, None, None, comps=comps, rounds=1)
    print("  (full rounds=1 incl cleanup measured 918 ms earlier)")

    # live-for-cleanup statistics, offline
    rays_np = np.asarray(rays)
    entry = np.asarray(tb._entry_table(sb, jnp.asarray(rays_np)))
    t1 = np.asarray(h.t)  # final t (upper bound on per-round best)
    order = np.argsort(np.asarray(
        ts._coherence_key(bb, tuple(rays_np[k] for k in range(6)))),
        kind="stable")
    ent_sorted = entry[:, order]
    cnt_front = (ent_sorted < np.minimum(t1[order], 2e32)[None]).sum(0)
    print(f"  subtrees with entry < final_t per ray: "
          f"mean {cnt_front.mean():.2f} p90 {np.percentile(cnt_front, 90):.0f}",
          flush=True)


if __name__ == "__main__":
    main()
