"""Round-5: isolate the in-frame bounce-1 cost.

prof_r5_frame.py measured the village depth-2 marginal at 5585 ms/frame
(1396 ms/chunk) while the standalone pieces sum to ~500 ms (closest 214
+ shading ~170 + scatter ~100, prof_r5_v3b + prof_r4_shade). This runs
trace_paths DIRECTLY (no renderer, no pass accumulation) on one real
camera chunk at depth 1 vs 2, with the compaction loop on/off and
textures on/off, to find where the extra ~900 ms/chunk lives.

Run on chip: PYTHONPATH=.:/root/.axon_site python prof/prof_r5_bounce.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.backend.renderer import Renderer
from realtimepathtracingresearchframework_tpu.backend.params import (
    RenderParams, SceneConfig,
)
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.camera import (
    OrientedCamera,
)
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import integrator as intg
from realtimepathtracingresearchframework_tpu.ops import pointsets


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def timeit(name, fn, *args, iters=4):
    o = fn(*args)
    sync(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    sync(o)
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{name:58s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    scfg = SceneConfig(sun_dir=(0.35, 0.8, 0.3), turbidity=3.0)
    scene = Scene.from_vkr_scene(procedural.village())
    r = Renderer()
    r.initialize(1920, 1080)
    r.set_scene(scene, scene_config=scfg)
    ds = r.device_scene
    base_cfg = r._integrator_config(
        RenderParams(batch_spp=1, max_path_depth=9, rr_path_depth=2)
    )
    print(f"cfg: v3={base_cfg.kernel_v3} lanes={base_cfg.compact_lanes} "
          f"rng={base_cfg.rng_variant} tex={base_cfg.has_textures}",
          flush=True)

    cam = OrientedCamera.look_at([0, 4.0, 13.0], [0, 0.5, 0], fovy=55)
    pos, du, dv, tl = cam.view_basis(1920, 1080)
    view = intg.ViewBuffers(
        jnp.asarray(pos), jnp.asarray(du), jnp.asarray(dv), jnp.asarray(tl)
    )
    fp = intg.FrameParams(
        rr_path_depth=jnp.int32(2),
        glossy_only_mode=jnp.int32(0),
        sample_offset=jnp.uint32(0),
        shot_offset=jnp.uint32(0),
    )
    px_c, py_c, valid_c, _inv, nc, chunk = intg._swizzle_tables(1920, 1080)
    dims = jnp.array([1920.0, 1080.0], jnp.float32)

    def run(cfg, depth):
        cfg = cfg._replace(max_path_depth=depth)

        @jax.jit
        def f(fp, view, px, py, valid):
            state = pointsets.make_state(
                cfg.rng_variant, fp.sample_offset, fp.shot_offset, px, py,
                1920, bufs=ds.rng,
            )
            state, ro, rd = intg.camera_setup(
                ds, cfg, fp, view, px, py, dims, state
            )
            rgb, alpha, nrays = intg.trace_paths(
                ds, cfg, fp, ro, rd, state, lane_mask=valid,
                footprint0=intg.camera_footprint0(cfg, fp, view, dims, rd),
            )
            return rgb.x

        return f

    # per-chunk cost: the swizzle is row-major 16x16 blocks, so chunk 0
    # is the top (sky-heavy, cheap) band and chunks 2-3 the ground —
    # measuring chunk 0 alone understates the frame ~16x (first run of
    # this script did exactly that)
    import os

    variants = [
        ("default (lanes ON)", base_cfg),
        ("lanes ON, NO textures", base_cfg._replace(has_textures=False)),
        ("lanes OFF (static loop)",
         base_cfg._replace(compact_lanes=False, compact=True)),
    ]
    depths = tuple(
        int(d) for d in os.environ.get("RPTR_PROF_DEPTHS", "1,2").split(",")
    )
    for name, cfg in variants:
        for depth in depths:
            f = run(cfg, depth)
            tot = 0.0
            per = []
            for c in range(nc):
                ms = timeit(
                    f"{name} depth {depth} chunk {c}",
                    f, fp, view, px_c[c], py_c[c], valid_c[c],
                )
                per.append(ms)
                tot += ms
            print(f"{name} depth {depth}: frame-equiv "
                  f"{tot:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
