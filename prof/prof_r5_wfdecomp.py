"""Round-5: per-program decomposition of the host-wavefront frame.

prof_r5_wf.py measured the executor 1.9x SLOWER than the monolith on
village despite exact-width dispatch; this times each program in
isolation (bounce0, each ladder bounce width actually used, resolve,
accum) plus the host-sync cost, so the regression is attributable.

Run on chip: PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_r5_wfdecomp.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.backend.params import (
    RenderParams, SceneConfig,
)
from realtimepathtracingresearchframework_tpu.backend.renderer import Renderer
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.camera import (
    OrientedCamera,
)
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import integrator as intg
from realtimepathtracingresearchframework_tpu.ops import wavefront_host as wfh


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
    print(f"{name:52s} {dt:9.2f} ms", flush=True)
    return dt, o


def main():
    scfg = SceneConfig(sun_dir=(0.35, 0.8, 0.3), turbidity=3.0)
    r = Renderer()
    r.initialize(1920, 1080)
    r.set_scene(Scene.from_vkr_scene(procedural.village()), scene_config=scfg)
    cfg = r._integrator_config(
        RenderParams(batch_spp=1, max_path_depth=9, rr_path_depth=2)
    )
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
    progs = wfh.build_programs(r.device_scene, cfg, 1920, 1080)
    print(f"ladder: {progs.ladder}", flush=True)
    s = jnp.uint32(0)

    t0 = time.perf_counter()
    _, (packed0, live0) = timeit("bounce0 (2.07M camera+visit+scatter+sort)",
                                 progs.bounce0_fn, fp, view, s)
    live_n = int(live0)
    print(f"  live after b0: {live_n}", flush=True)

    # host-sync cost: one int() readback
    t0 = time.perf_counter()
    for _ in range(10):
        _ = int(live0)
    print(f"int(live) readback avg {1000*(time.perf_counter()-t0)/10:.2f} ms",
          flush=True)

    packed = packed0
    b = 1
    while live_n > 0 and b < progs.depth:
        w = wfh.ladder_cover(progs.ladder, live_n)
        # time WITHOUT donating the measured buffer: pass a fresh copy
        fn = progs.bounce_fns[w]
        t = []
        for it in range(4):
            pk = jnp.copy(packed)
            sync(pk)
            t1 = time.perf_counter()
            out, lv = fn(fp, pk, jnp.int32(b))
            sync(out)
            t.append(time.perf_counter() - t1)
        print(f"bounce {b} width {w:8d}: {1000*min(t):9.2f} ms (min of 4)",
              flush=True)
        packed, live = fn(fp, jnp.copy(packed), jnp.int32(b))
        live_n = int(live)
        print(f"  live after b{b}: {live_n}", flush=True)
        b += 1

    _, planes = timeit("resolve (argsort lane_id + gather)",
                       progs.resolve_fn, packed)
    accs = list(r._acc_chunks)
    t1 = time.perf_counter()
    for c in range(len(accs)):
        accs[c], nr = progs.accum_fns[c](planes, accs[c], s, jnp.uint32(0))
    sync(accs[-1])
    print(f"accum x{len(accs)}: {1000*(time.perf_counter()-t1):9.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
