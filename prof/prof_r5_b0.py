"""Round-5: decompose the bounce-0 program (the frame's dominant term).

prof_r5_wfdecomp measured bounce0 (camera + visit + scatter + sort at
2.07M lanes) at 4,832 ms while its parts by per-queue receipts sum to
~1 s; the monolith shows the same wall (frame 5,667 ms, depth-1 888 ms).
This times the pieces cumulatively at one 524K chunk (env RPTR_PROF_CHUNK,
default 2 = ground band):

  A camera + visit_hit            (closest + sky + attrs + shading ctx)
  B A + scatter unsorted shadow   (NEE + occlusion + BSDF + next ray)
  C A + scatter sorted shadow
  D C + live-first coherence sort (the full bounce0 body)

B-A / C-A isolate the scatter; if it dwarfs the ~150 ms the shadow
receipts predict, the next split goes inside scatter_tail.

Run on chip: PYTHONPATH=.:/root/.axon_site python prof/prof_r5_b0.py
"""

import os
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
from realtimepathtracingresearchframework_tpu.ops import pointsets
from realtimepathtracingresearchframework_tpu.ops.vec3 import Vec3


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
    r = Renderer()
    r.initialize(1920, 1080)
    r.set_scene(Scene.from_vkr_scene(procedural.village()), scene_config=scfg)
    ds = r.device_scene
    cfg = r._integrator_config(
        RenderParams(batch_spp=1, max_path_depth=9, rr_path_depth=2)
    )._replace(compact=False, compact_lanes=False, unroll=False)

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
    ci = int(os.environ.get("RPTR_PROF_CHUNK", "2"))
    px, py, valid = px_c[ci], py_c[ci], valid_c[ci]
    blo, bhi = intg._scene_bounds_of(ds)

    def init_carry(fp, view, px, py, valid):
        state = pointsets.make_state(
            cfg.rng_variant, fp.sample_offset, fp.shot_offset, px, py, 1920,
            bufs=ds.rng,
        )
        state, ro, rd = intg.camera_setup(
            ds, cfg, fp, view, px, py, dims, state
        )
        n = px.shape[0]
        zero = jnp.zeros((n,), jnp.float32)
        one = jnp.ones((n,), jnp.float32)
        carry = (
            ro, rd, zero, Vec3(zero, zero, zero), Vec3(one, one, one),
            valid, jnp.full((n,), 2.0e16, jnp.float32),
            jnp.zeros((n,), jnp.int32), zero, state,
            jnp.zeros((n,), jnp.int32),
        )
        f0 = intg.camera_footprint0(cfg, fp, view, dims, rd)
        return carry + (tuple(jnp.broadcast_to(f, (n,)) for f in f0),)

    @jax.jit
    def f_visit(fp, view, px, py, valid):
        visit_hit, _ = intg._make_bounce_fns(ds, cfg, fp)
        carry = init_carry(fp, view, px, py, valid)
        carry, ctx = visit_hit(carry, compact=False)
        return carry[3].x, carry[5]

    def make_scatter(sort_shadow, with_sort):
        @jax.jit
        def f(fp, view, px, py, valid):
            visit_hit, scatter_tail = intg._make_bounce_fns(ds, cfg, fp)
            carry = init_carry(fp, view, px, py, valid)
            carry, ctx = visit_hit(carry, compact=False)
            carry = scatter_tail(
                (carry, ctx, jnp.int32(0)), compact=False,
                sort_shadow=sort_shadow,
            )
            if with_sort:
                live = carry[5]
                key = intg._carry_coherence_key(
                    carry[0], carry[1], live, blo, bhi
                )
                perm = jnp.argsort(key, stable=True)
                carry = jax.tree_util.tree_map(lambda a: a[perm], carry)
            return carry[3].x, carry[5]

        return f

    a = timeit("A camera+visit (524K)", f_visit, fp, view, px, py, valid)
    b = timeit("B A+scatter shadow-unsorted",
               make_scatter(False, False), fp, view, px, py, valid)
    c = timeit("C A+scatter shadow-sorted",
               make_scatter(True, False), fp, view, px, py, valid)
    d = timeit("D C+carry-sort (full bounce0 body)",
               make_scatter(True, True), fp, view, px, py, valid)
    print(f"scatter unsorted {b - a:8.2f} ms | sorted {c - a:8.2f} ms | "
          f"carry sort {d - c:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
