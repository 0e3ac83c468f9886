"""Round-4 frame A/B: carry-level lane compaction (compact_lanes).

The bounce decomposition (prof/prof_r4_shade.py) found the in-frame
killer: v3 occluded dispatches on incoherent-origin queues cost
~2.4 s/524K UNSORTED vs ~0.6 s sorted — the "shadow inherits parent
order" policy only holds for pixel-coherent primary-hit queues.
compact_lanes sorts the whole carry (origin-morton) so BOTH per-bounce
dispatches and all shading run coherent AND prefix-sized.

Measures full render() frames at the bench workload (1080p 1spp d9):
village with compact_lanes off (r3 behavior: per-dispatch sort) vs on,
megakernel + wavefront, plus cornell as the small-scene guard (policy
keeps compact_lanes OFF there — _use_pallas3 gate).

Usage: python prof/prof_r4_frame2.py [--frames N]
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.backend.renderer import (
    FrameConfig, Renderer,
)
from realtimepathtracingresearchframework_tpu.backend.params import (
    RenderParams, SceneConfig,
)
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.camera import (
    OrientedCamera,
)
from realtimepathtracingresearchframework_tpu.models.scene import Scene


def run_one(scene, cam, scfg, variant, lanes_env, frames):
    if lanes_env is None:
        os.environ.pop("RPTR_COMPACT_LANES", None)
    else:
        os.environ["RPTR_COMPACT_LANES"] = lanes_env
    r = Renderer()
    r.set_variant(variant)
    r.initialize(1920, 1080)
    r.set_scene(scene, scene_config=scfg)
    cfg = FrameConfig(
        camera=cam,
        params=RenderParams(batch_spp=1, max_path_depth=9, rr_path_depth=2),
        scene_config=scfg,
    )
    r.render(cfg)  # compile + warm
    r.render(cfg)
    np.asarray(r.readback_framebuffer()[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        r.render(cfg)
    np.asarray(r.readback_framebuffer()[0, 0])
    ms = (time.perf_counter() - t0) / frames * 1e3
    mean = float(np.asarray(r.readback_framebuffer()[..., :3]).mean())
    del r
    return ms, mean


def main():
    frames = 4
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])

    scfg = SceneConfig(sun_dir=(0.35, 0.8, 0.3), turbidity=3.0)
    village = Scene.from_vkr_scene(procedural.village())
    vcam = OrientedCamera.look_at([0, 4.0, 13.0], [0, 0.5, 0], fovy=55)
    for variant in ("PT_MEGAKERNEL", "PT_WAVEFRONT"):
        for label, env in (("off(r3)", "0"), ("ON", "1")):
            ms, mean = run_one(village, vcam, scfg, variant, env, frames)
            print(f"[village {variant:14s} lanes={label:8s}] "
                  f"{ms:9.1f} ms/frame  mean={mean:.5f}", flush=True)

    cornell = Scene.from_vkr_scene(procedural.cornell_box())
    ccam = OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50)
    ms, mean = run_one(cornell, ccam, SceneConfig(), "PT_MEGAKERNEL",
                       None, max(frames, 8))
    print(f"[cornell megakernel default     ] {ms:9.1f} ms/frame  "
          f"mean={mean:.5f}", flush=True)


if __name__ == "__main__":
    main()
