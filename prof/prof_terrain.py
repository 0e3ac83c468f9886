"""Terrain (500k tris, streamed traversal) breakdown: depth scaling +
streamed-traversal coherent vs shuffled cost + sort cost."""
import time, sys, numpy as np, jax, jax.numpy as jnp
from realtimepathtracingresearchframework_tpu.backend.renderer import Renderer, FrameConfig
from realtimepathtracingresearchframework_tpu.backend.params import RenderParams, SceneConfig
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.models.camera import OrientedCamera

tscene = Scene.from_vkr_scene(procedural.terrain(grid=500))
sc = SceneConfig(sun_dir=(0.4, 0.7, 0.2), turbidity=3.0)
r = Renderer(); r.initialize(512, 384)
r.set_scene(tscene, scene_config=sc)
tcam = OrientedCamera.look_at([0, 5.0, 12.0], [0, 0, 0], fovy=55)
print("streamed?", r._use_streamed, flush=True)

def frame_ms(depth, k=2):
    cfg = FrameConfig(camera=tcam,
                      params=RenderParams(batch_spp=1, max_path_depth=depth),
                      scene_config=sc)
    r.reset_accumulation()
    r.render(cfg)
    _ = np.asarray(r._acc_chunks[-1][0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(k): r.render(cfg)
    _ = np.asarray(r._acc_chunks[-1][0].ravel()[0:1])
    return (time.perf_counter() - t0) / k * 1e3

for d in (1, 3):
    print(f"depth {d}: {frame_ms(d):9.2f} ms", flush=True)
