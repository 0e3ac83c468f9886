"""Round-4 frame-composition profile: village cost vs max_path_depth.

The 4-config frame A/B (prof_r4_frame.py) measured 15.3 s/frame sorted
at depth 9 while the per-queue traversal numbers sum to ~2.1 s at equal
lane count — something OTHER than traversal dominates the frame. The
depth sweep decomposes it: frame(d) - frame(d-1) isolates the marginal
cost of one bounce (traversal + shading + NEE + RNG at 2.07M lanes),
and the untextured re-run isolates texture-fetch cost.

Usage: python prof/prof_r4_depth.py [--frames N]
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


def frame_ms(r, cfg, frames):
    r.render(cfg); r.render(cfg)
    np.asarray(r.readback_framebuffer()[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        r.render(cfg)
    np.asarray(r.readback_framebuffer()[0, 0])
    return (time.perf_counter() - t0) / frames * 1e3


def main():
    frames = 4
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    os.environ["RPTR_COMPACT"] = "1"
    scfg = SceneConfig(sun_dir=(0.35, 0.8, 0.3), turbidity=3.0)
    cam = OrientedCamera(
        pos=np.array([0, 4.0, 13.0]),
        dir=np.array([0, -0.25, -0.95]) / np.linalg.norm([0, -0.25, -0.95]),
        up=np.array([0.0, 1.0, 0.0]), fovy=55.0,
    )
    for name, vkrs in (("village", procedural.village()),
                       ("village-notex", None)):
        if vkrs is None:
            vkrs = procedural.village()
            # strip textures: same geometry/materials, no atlas fetches
            for m in vkrs.materials:
                m.tex_base_color = None
                m.tex_normal = None
                m.tex_specular = None
        scene = Scene.from_vkr_scene(vkrs)
        prev = 0.0
        for depth in (1, 2, 3, 5, 9):
            r = Renderer()
            r.initialize(1920, 1080)
            r.set_scene(scene, scene_config=scfg)
            cfg = FrameConfig(
                camera=cam,
                params=RenderParams(batch_spp=1, max_path_depth=depth,
                                    rr_path_depth=2),
                scene_config=scfg,
            )
            ms = frame_ms(r, cfg, frames)
            print(f"[{name}] depth {depth}: {ms:8.1f} ms/frame "
                  f"(marginal {ms - prev:+8.1f})", flush=True)
            prev = ms
            del r


if __name__ == "__main__":
    main()
