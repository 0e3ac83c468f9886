"""Round-5 artifact #1: full accounting of the village frame.

VERDICT r4 weak #2/#3: the 10.9 s village frame was never decomposed
with the shipped configuration (v3 + sort + compact_lanes ON), and the
carry-compaction A/B never ran on chip. This script produces both:

  A. frame-level A/B: compact_lanes OFF(r3 behavior) / ON, megakernel,
     village + cornell guard (the prof_r4_frame2 matrix, condensed);
  B. depth sweep with the DEFAULT config (lanes ON): frame(d) -
     frame(d-1) = the marginal cost of bounce d-1 across the 4 chunks;
  C. per-bounce live-lane counts from the traced-ray counter:
     rays(d) - rays(d-1) = live_visit(d-1) + live_scatter(d-2), and the
     compaction prefix each bounce would dispatch (sizes are n >> k,
     quantum 1024, max 5 halvings) — the prefix-size histogram VERDICT
     asked for, derived from exact ray counts instead of kernel probes.

Usage: PYTHONPATH=. python prof/prof_r5_frame.py [--frames N]
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


def make_renderer(scene, scfg, depth, lanes_env):
    if lanes_env is None:
        os.environ.pop("RPTR_COMPACT_LANES", None)
    else:
        os.environ["RPTR_COMPACT_LANES"] = lanes_env
    r = Renderer()
    r.initialize(1920, 1080)
    r.set_scene(scene, scene_config=scfg)
    return r


def frame_ms(r, cfg, frames):
    r.render(cfg)
    r.render(cfg)
    np.asarray(r.readback_framebuffer()[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        r.render(cfg)
    np.asarray(r.readback_framebuffer()[0, 0])
    ms = (time.perf_counter() - t0) / frames * 1e3
    rays = r.last_frame_rays()
    return ms, rays


def main():
    frames = 4
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])

    scfg = SceneConfig(sun_dir=(0.35, 0.8, 0.3), turbidity=3.0)
    village = Scene.from_vkr_scene(procedural.village())
    vcam = OrientedCamera.look_at([0, 4.0, 13.0], [0, 0.5, 0], fovy=55)

    # ---- A: carry-compaction frame A/B (VERDICT r4 #5 receipt)
    print("== A: compact_lanes frame A/B (village, megakernel) ==",
          flush=True)
    for label, env in (("off(r3)", "0"), ("ON", "1")):
        r = make_renderer(village, scfg, 9, env)
        cfg = FrameConfig(
            camera=vcam,
            params=RenderParams(batch_spp=1, max_path_depth=9,
                                rr_path_depth=2),
            scene_config=scfg,
        )
        ms, rays = frame_ms(r, cfg, frames)
        print(f"[village lanes={label:8s}] {ms:9.1f} ms/frame  "
              f"rays/frame={rays/1e6:.2f}M  "
              f"mrays={rays/ms/1e3:.3f}", flush=True)
        del r

    cornell = Scene.from_vkr_scene(procedural.cornell_box())
    ccam = OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50)
    for label, env in (("default", None), ("ON", "1")):
        r = make_renderer(cornell, SceneConfig(), 9, env)
        cfg = FrameConfig(
            camera=ccam,
            params=RenderParams(batch_spp=1, max_path_depth=9),
        )
        ms, rays = frame_ms(r, cfg, max(frames, 8))
        print(f"[cornell lanes={label:8s}] {ms:9.1f} ms/frame  "
              f"rays/frame={rays/1e6:.2f}M  "
              f"mrays={rays/ms/1e3:.3f}", flush=True)
        del r

    # ---- B + C: depth sweep with the DEFAULT config + live counts
    print("== B/C: village depth sweep (default cfg) + live lanes ==",
          flush=True)
    prev_ms = 0.0
    prev_rays = 0
    ray_tot = {}
    for depth in (1, 2, 3, 5, 9):
        r = make_renderer(village, scfg, depth, None)
        cfg = FrameConfig(
            camera=vcam,
            params=RenderParams(batch_spp=1, max_path_depth=depth,
                                rr_path_depth=2),
            scene_config=scfg,
        )
        ms, rays = frame_ms(r, cfg, frames)
        ray_tot[depth] = rays
        marg_rays = rays - prev_rays
        print(f"[depth {depth}] {ms:9.1f} ms/frame  "
              f"(marginal {ms - prev_ms:+9.1f} ms, "
              f"{marg_rays/1e6:+7.3f}M rays)", flush=True)
        prev_ms, prev_rays = ms, rays
        del r

    # prefix sizes the compaction would pick per bounce (n = 524288,
    # 4 chunks/frame): live_visit(b) estimated from the ray deltas
    n = 524288
    sizes = [n >> j for j in range(6)]
    print("== C: estimated per-chunk live lanes -> compaction prefix ==",
          flush=True)
    # rays(d) - rays(d-1) = live_visit(d-1) + live_scatter(d-2);
    # live_scatter(b) ~= live_visit(b+1) (next bounce's queue), so
    # live_visit(b) ~= delta(b) - live_visit(b) ... report raw deltas and
    # the solved estimate: visit(0)=2.07M (all), scatter(b)=visit(b+1)
    ds_sorted = sorted(ray_tot)
    deltas = {}
    for i, d in enumerate(ds_sorted):
        if i > 0:
            span = d - ds_sorted[i - 1]
            deltas[d] = (ray_tot[d] - ray_tot[ds_sorted[i - 1]]) / span
    visit = {0: ray_tot[1]}  # depth-1 frame traces exactly bounce 0
    for d, avg in deltas.items():
        # delta per added depth = visit(b) + scatter(b-1); scatter(b-1)
        # == visit(b) exactly (RR kills at scatter time), so visit ~ /2
        visit[d - 1] = max(int(avg) // 2, 0)
    for b, v in visit.items():
        per_chunk = v / 4.0
        pick = next((s for s in reversed(sizes) if per_chunk <= s),
                    sizes[0])
        print(f"bounce {b}: ~{v/1e6:6.3f}M visit rays/frame "
              f"(~{per_chunk/1e3:7.1f}K/chunk) -> prefix {pick}",
              flush=True)


if __name__ == "__main__":
    main()
