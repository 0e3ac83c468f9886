"""Round-4 frame-level measurement: village 2x2 (variant x compact).

The per-queue measurements (prof_r4_village*.py) say sorted dispatch
cut the bounce queue 1053 -> ~205-240 ms/524K; the frame-level village
number is what BENCH records. This measures full render() frames at the
bench workload (1080p, 1 spp, depth 9) for megakernel/wavefront with
live-lane compaction (now a coherence sort, traverse_pallas2._compact)
off/on, plus cornell as the no-regression guard.

Usage: python prof/prof_r4_frame.py [village] [cornell] [--frames N]
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


def run_one(scene, cam, scfg, variant, compact, width, height, frames):
    os.environ["RPTR_COMPACT"] = "1" if compact else "0"
    r = Renderer()
    r.set_variant(variant)
    r.initialize(width, height)
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
    st = r.stats(force_rays=True)
    mrays = float(st.rays_per_second) / 1e6 if st.rays_per_second else 0.0
    print(f"  {variant:14s} compact={int(compact)}: {ms:8.1f} ms/frame "
          f"({mrays:6.2f} Mray/s)")
    return ms


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    frames = 4
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    sections = args or ["village", "cornell"]

    if "village" in sections:
        scene = Scene.from_vkr_scene(procedural.village())
        cam = OrientedCamera(
            pos=np.array([0, 4.0, 13.0]),
            dir=np.array([0, -0.25, -0.95]) / np.linalg.norm(
                [0, -0.25, -0.95]),
            up=np.array([0.0, 1.0, 0.0]), fovy=55.0,
        )
        scfg = SceneConfig(sun_dir=(0.35, 0.8, 0.3), turbidity=3.0)
        print(f"village 1080p 1spp d9 ({frames} frames):")
        for variant in ("PT_MEGAKERNEL", "PT_WAVEFRONT"):
            for compact in (False, True):
                run_one(scene, cam, scfg, variant, compact, 1920, 1080,
                        frames)

    if "cornell" in sections:
        scene = Scene.from_vkr_scene(procedural.cornell_box())
        cam = OrientedCamera(
            pos=np.array([0.0, 1.0, 3.2]), dir=np.array([0.0, 0.0, -1.0]),
            up=np.array([0.0, 1.0, 0.0]), fovy=65.0,
        )
        scfg = SceneConfig()
        print(f"cornell 1080p 1spp d9 ({frames} frames):")
        for variant in ("PT_MEGAKERNEL", "PT_WAVEFRONT"):
            for compact in (False, True):
                run_one(scene, cam, scfg, variant, compact, 1920, 1080,
                        frames)


if __name__ == "__main__":
    main()
