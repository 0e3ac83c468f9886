import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.backend.params import RenderParams
from realtimepathtracingresearchframework_tpu.backend.renderer import Renderer
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.camera import OrientedCamera
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import integrator as I

W, H = 1920, 1080
scene = Scene.from_vkr_scene(procedural.cornell_box())
r = Renderer(); r.initialize(W, H); r.set_scene(scene)
cam = OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50)
pos, du, dv, tl = cam.view_basis(W, H)
view = I.ViewBuffers(jnp.asarray(pos), jnp.asarray(du), jnp.asarray(dv), jnp.asarray(tl))
fp = I.FrameParams(rr_path_depth=jnp.int32(2), glossy_only_mode=jnp.int32(0),
                   sample_offset=jnp.uint32(0), shot_offset=jnp.uint32(0))
cfg = r._integrator_config(RenderParams(max_path_depth=9))
ds = r.device_scene
px_c, py_c, valid_c, inv, nc, chunk = I._swizzle_tables(W, H)
px, py, valid = px_c[0], py_c[0], valid_c[0]

def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]

def timeit(name, pass_fn, reps=10):
    def full():
        a = tuple(jnp.zeros((chunk,), jnp.float32) for _ in range(4))
        return pass_fn(fp, view, a, px, py, valid, jnp.uint32(0), jnp.uint32(0))
    o = full(); sync(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = full()
    sync(o)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:44s} {dt:8.2f} ms")
    return o, dt

om, tm = timeit("megakernel depth9", I.make_pass_fn(ds, cfg, W, H))
ow, tw = timeit("wavefront (merged 2-queue) depth9", I.make_pass_fn(ds, cfg._replace(wavefront=True), W, H))

# image parity
am = np.stack([np.asarray(x) for x in om[0]])
aw = np.stack([np.asarray(x) for x in ow[0]])
rel = np.abs(am - aw) / np.maximum(np.abs(am), 1e-12)
print(f"max rel diff: {rel.max():.3e}  speedup {tm/tw:.3f}x")
