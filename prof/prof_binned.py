"""On-chip: binned vs sorted-streamed traversal on 500k-tri terrain."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import traverse_binned as tbin
from realtimepathtracingresearchframework_tpu.ops import traverse_stream as ts
from prof_micro import timeit
from prof_bin import bounce_rays


def main():
    print("device:", jax.devices()[0], flush=True)
    scene = Scene.from_vkr_scene(procedural.terrain(grid=500))
    flat = scene.flatten_world()
    bb = ts.pack_streamed(flat.v0, flat.e1, flat.e2)
    print(f"terrain {flat.num_tris} tris, "
          f"S={bb.sub_nodes.shape[0] // ts.SUB_NODE_ROWS}", flush=True)

    n = 196608
    ro_b, rd_b = bounce_rays(flat, n)
    comps_b = tuple(jnp.asarray(a) for a in
                    (ro_b[:, 0], ro_b[:, 1], ro_b[:, 2],
                     rd_b[:, 0], rd_b[:, 1], rd_b[:, 2]))

    # coherent camera primaries
    eye = np.array([0, 5.0, 12.0], np.float32)
    side = 512
    u = np.linspace(-0.6, 0.6, side, dtype=np.float32)
    uu, vv = np.meshgrid(u, u * 0.45)
    d = np.stack([uu.ravel(), -0.5 + vv.ravel(),
                  -np.ones(side * side, np.float32)], axis=-1)[:n]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro_c = np.broadcast_to(eye, d.shape).copy()
    comps_c = tuple(jnp.asarray(a) for a in
                    (ro_c[:, 0], ro_c[:, 1], ro_c[:, 2],
                     d[:, 0], d[:, 1], d[:, 2]))

    mray = n / 1e6

    def bench(label, fn, iters=8):
        a = timeit(fn, iters)
        b = timeit(fn, iters)
        ms = min(a, b)
        print(f"  {label:44s} {ms:8.1f} ms ({mray / ms * 1e3:6.2f} Mray/s)",
              flush=True)
        return ms

    kinds = [("coh", comps_c), ("inc", comps_b)]
    if "--inc" in sys.argv:
        kinds = kinds[1:]
    for kind, comps in kinds:
        bench(f"{kind} closest sorted-streamed (current)",
              lambda c=comps: ts.closest_hit_streamed(
                  bb, None, None, comps=c, sort=True).t)
        for r in (1, 2, 3):
            bench(f"{kind} closest binned rounds={r}",
                  lambda c=comps, r=r: tbin.closest_hit_binned(
                      bb, None, None, comps=c, rounds=r).t)
        bench(f"{kind} occluded sorted-streamed",
              lambda c=comps: ts.occluded_streamed(
                  bb, None, None, comps=c, t_max=30.0, sort=True))
        bench(f"{kind} occluded binned rounds=1",
              lambda c=comps: tbin.occluded_binned(
                  bb, None, None, comps=c, t_max=30.0, rounds=1))

    # correctness spot-check on chip (vs each other)
    h0 = ts.closest_hit_streamed(bb, None, None, comps=comps_b, sort=True)
    h1 = tbin.closest_hit_binned(bb, None, None, comps=comps_b, rounds=2)
    t0, t1 = np.asarray(h0.t), np.asarray(h1.t)
    eq = (t0 == t1) | (np.isclose(t0, t1, rtol=1e-6) & (t0 < 1e30))
    print(f"on-chip t agreement binned vs streamed: {eq.mean() * 100:.4f}%",
          flush=True)


def multislot():
    """Quick multi-slot measurement (run with --ms)."""
    print("device:", jax.devices()[0], flush=True)
    scene = Scene.from_vkr_scene(procedural.terrain(grid=500))
    flat = scene.flatten_world()
    bb = ts.pack_streamed(flat.v0, flat.e1, flat.e2)
    n = 196608
    ro_b, rd_b = bounce_rays(flat, n)
    comps = tuple(jnp.asarray(a) for a in
                  (ro_b[:, 0], ro_b[:, 1], ro_b[:, 2],
                   rd_b[:, 0], rd_b[:, 1], rd_b[:, 2]))
    mray = n / 1e6
    for k in (6, 8, 12):
        ms = min(
            timeit(lambda k=k: tbin.closest_hit_binned_all(
                bb, None, None, comps=comps, k_max=k).t, 8),
            timeit(lambda k=k: tbin.closest_hit_binned_all(
                bb, None, None, comps=comps, k_max=k).t, 8),
        )
        print(f"  inc closest multislot k_max={k:2d}: {ms:8.1f} ms "
              f"({mray / ms * 1e3:6.2f} Mray/s)", flush=True)
    h0 = ts.closest_hit_streamed(bb, None, None, comps=comps, sort=True)
    h1 = tbin.closest_hit_binned_all(bb, None, None, comps=comps)
    t0, t1 = np.asarray(h0.t), np.asarray(h1.t)
    eq = (t0 == t1) | (np.isclose(t0, t1, rtol=1e-6) & (t0 < 1e30))
    print(f"  t agreement multislot vs streamed: {eq.mean() * 100:.4f}%",
          flush=True)


if __name__ == "__main__":
    if "--ms" in sys.argv:
        multislot()
    else:
        main()
