"""Round-5: frame-level A/B of the bounce-major host-wavefront executor
(ops/wavefront_host.py) vs the monolithic pass program, on the BENCH
scenes at BENCH settings (village + cornell, 1080p 1spp depth 9).

Also prints the per-bounce live-lane profile the executor records, the
dispatch-width ladder it used, and compile wall per mode — the village
frame decomposition artifact VERDICT r4 asked to keep current.

Run on chip: PYTHONPATH=/root/repo python prof/prof_r5_wf.py
"""

import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.backend.params import (
    RenderParams, SceneConfig,
)
from realtimepathtracingresearchframework_tpu.backend.renderer import (
    FrameConfig, Renderer,
)
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.camera import (
    OrientedCamera,
)
from realtimepathtracingresearchframework_tpu.models.scene import Scene


def hard_sync(r):
    for c in r._acc_chunks:
        _ = np.asarray(jax.tree_util.tree_leaves(c)[0].ravel()[0:1])


def measure(r, cc, nframes):
    rays = []
    t0 = time.perf_counter()
    for _ in range(nframes):
        r.render(cc)
        rays.append(r._last_rays)
    hard_sync(r)
    total_s = time.perf_counter() - t0
    total_rays = 0
    for fr in rays:
        fr = fr if isinstance(fr, list) else [fr]
        total_rays += sum(int(x) for x in fr)
    return total_s / nframes * 1000.0, total_rays / total_s / 1e6


def run_scene(name, scene, cam, frames=6):
    scfg = SceneConfig(sun_dir=(0.35, 0.8, 0.3), turbidity=3.0)
    cc = FrameConfig(
        camera=cam,
        params=RenderParams(batch_spp=1, max_path_depth=9, rr_path_depth=2),
        scene_config=scfg,
    )
    for mode in ("0", "1"):
        os.environ["RPTR_HOST_WAVEFRONT"] = mode
        r = Renderer()
        r.initialize(1920, 1080)
        r.set_scene(scene, scene_config=scfg)
        t0 = time.perf_counter()
        r.render(cc)
        hard_sync(r)
        warm = time.perf_counter() - t0
        ms, mrays = measure(r, cc, frames)
        prof = getattr(r, "_wf_live_profile", None)
        print(
            f"{name} wf={mode}: {ms:9.1f} ms/frame  {mrays:7.3f} Mray/s"
            f"  warm {warm:6.1f} s  live_profile={prof}",
            flush=True,
        )
    os.environ.pop("RPTR_HOST_WAVEFRONT", None)


def main():
    run_scene(
        "village",
        Scene.from_vkr_scene(procedural.village()),
        OrientedCamera.look_at([0, 4.0, 13.0], [0, 0.5, 0], fovy=55),
    )
    run_scene(
        "cornell",
        Scene.from_vkr_scene(procedural.cornell_box()),
        OrientedCamera.look_at([0, 1.2, 3.0], [0, 0.8, 0.0], fovy=55),
        frames=16,
    )


if __name__ == "__main__":
    main()
