"""Round-5 cornell headline attack (VERDICT r4 #2): where do 76 ms go?

cornell = 32 tris, v2 resident kernel (leaf 32), depth 9 unrolled,
4 pipelined passes of 524K rays. Traversal is trivial; the frame cost
is wave base cost + per-bounce shading + per-pass fixed dispatch tax.
Measures:

  1. frame time (megakernel, current default) — baseline;
  2. wavefront variant frame (merged closest+shadow dispatch per bounce
     — the round-2 'merged dispatch' lever, re-measured on today's
     kernels);
  3. depth sweep at one 524K pass: wave base cost + marginal per bounce
     (round-2 measured 17.7 ms base, ~2.5-3.2 ms/bounce — what is it
     NOW?);
  4. RAYS_PER_PASS sweep: 524K x 4 / 1M x 2 / 2M x 1 (round-2 swept this
     on the v1 kernel; the fixed per-pass tax may have shifted);
  5. dispatch-tax microbench: trivial jitted programs with K scalar args
     vs 1 packed arg, and with/without a 2 MB array arg — how much of a
     pass is argument plumbing on the axon relay?

Run on chip: PYTHONPATH=.:/root/.axon_site python prof/prof_r5_cornell.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.backend.renderer import (
    FrameConfig, Renderer,
)
from realtimepathtracingresearchframework_tpu.backend.params import (
    RenderParams,
)
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.camera import (
    OrientedCamera,
)
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import integrator as intg
from realtimepathtracingresearchframework_tpu.ops import pointsets


def sync1(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def frame_ms(r, cfg, frames=16):
    r.render(cfg)
    r.render(cfg)
    np.asarray(r.readback_framebuffer()[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        r.render(cfg)
    if r._planar:
        _ = np.asarray(r._acc_chunks[-1][0].ravel()[0:1])
    else:
        np.asarray(r.readback_framebuffer()[0, 0])
    return (time.perf_counter() - t0) / frames * 1e3


def main():
    scene = Scene.from_vkr_scene(procedural.cornell_box())
    cam = OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50)

    # ---- 1+2: frame baseline, both variants
    for variant in ("PT_MEGAKERNEL", "PT_WAVEFRONT"):
        r = Renderer()
        r.set_variant(variant)
        r.initialize(1920, 1080)
        r.set_scene(scene)
        cfg = FrameConfig(
            camera=cam,
            params=RenderParams(batch_spp=1, max_path_depth=9),
        )
        ms = frame_ms(r, cfg)
        print(f"[frame {variant:14s}] {ms:8.2f} ms "
              f"({1000.0 / ms:6.2f} fps)", flush=True)
        del r

    # ---- 3: single-pass depth sweep (wave base + marginal)
    r = Renderer()
    r.initialize(1920, 1080)
    r.set_scene(scene)
    ds = r.device_scene
    px_c, py_c, valid_c, _inv, nc, chunk = intg._swizzle_tables(1920, 1080)
    dims = jnp.array([1920.0, 1080.0], jnp.float32)
    view_np = cam.view_basis(1920, 1080)
    view = intg.ViewBuffers(*(jnp.asarray(a) for a in view_np))
    fp = intg.FrameParams(
        rr_path_depth=jnp.int32(2),
        glossy_only_mode=jnp.int32(0),
        sample_offset=jnp.uint32(0),
        shot_offset=jnp.uint32(0),
    )
    prev = 0.0
    for depth in (1, 2, 3, 5, 9):
        cfg_i = r._integrator_config(
            RenderParams(batch_spp=1, max_path_depth=depth)
        )

        @jax.jit
        def f(fp, view, px, py, valid):
            state = pointsets.make_state(
                cfg_i.rng_variant, fp.sample_offset, fp.shot_offset,
                px, py, 1920, bufs=ds.rng,
            )
            state, ro, rd = intg.camera_setup(
                ds, cfg_i, fp, view, px, py, dims, state
            )
            rgb, alpha, nrays = intg.trace_paths(
                ds, cfg_i, fp, ro, rd, state, lane_mask=valid,
            )
            return rgb.x

        o = f(fp, view, px_c[1], py_c[1], valid_c[1])
        sync1(o)
        t0 = time.perf_counter()
        for _ in range(8):
            o = f(fp, view, px_c[1], py_c[1], valid_c[1])
        sync1(o)
        ms = (time.perf_counter() - t0) / 8 * 1e3
        print(f"[wave depth {depth}] {ms:8.2f} ms "
              f"(marginal {ms - prev:+7.2f})", flush=True)
        prev = ms

    # ---- 4: RAYS_PER_PASS sweep (pass-size vs count at fixed work)
    del r
    for rpp in (524288, 1048576, 2097152):
        intg.RAYS_PER_PASS = rpp
        intg._TABLE_CACHE.clear()
        intg._MAP_CACHE.clear()
        r = Renderer()
        r.initialize(1920, 1080)
        r.set_scene(scene)
        cfg = FrameConfig(
            camera=cam,
            params=RenderParams(batch_spp=1, max_path_depth=9),
        )
        ms = frame_ms(r, cfg)
        print(f"[frame megakernel rpp={rpp:8d}] {ms:8.2f} ms", flush=True)
        del r
    intg.RAYS_PER_PASS = 524288
    intg._TABLE_CACHE.clear()
    intg._MAP_CACHE.clear()

    # ---- 5: dispatch-tax microbench
    def timeit_fn(name, f, args, iters=32):
        o = f(*args)
        sync1(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*args)
        sync1(o)
        print(f"[tax] {name:40s} "
              f"{(time.perf_counter() - t0) / iters * 1e3:7.3f} ms",
              flush=True)

    big = jnp.zeros((524288,), jnp.float32)
    scalars = [jnp.float32(i) for i in range(14)]
    packed = jnp.arange(14, dtype=jnp.float32)

    @jax.jit
    def f_scalars(b, *s):
        acc = b
        for x in s:
            acc = acc + x
        return acc

    @jax.jit
    def f_packed(b, p):
        return b + jnp.sum(p)

    @jax.jit
    def f_one(b):
        return b + 1.0

    timeit_fn("big + 14 scalar args", f_scalars, (big, *scalars))
    timeit_fn("big + 1 packed arg", f_packed, (big, packed))
    timeit_fn("big only", f_one, (big,))

    @jax.jit
    def f_donate(a, b):
        return a + b, (a * b).sum()

    timeit_fn("two 2MB args", f_donate, (big, big + 1))


if __name__ == "__main__":
    main()
