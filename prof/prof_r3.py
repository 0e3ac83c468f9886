"""Round-3 on-chip measurement queue (run when the axon tunnel is up).

Usage: python prof_r3.py [section ...]   (default: all)
Sections: cornell terrain binned quant tlas wavefront
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(x):
    return np.asarray(x.ravel()[0:1])


def timeit(fn, k=20, warm=2):
    for _ in range(warm):
        out = fn()
    sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn()
    sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / k * 1e3


def bounce_rays(flat, n, seed=11):
    rng = np.random.default_rng(seed)
    v0 = np.asarray(flat.v0); e1 = np.asarray(flat.e1); e2 = np.asarray(flat.e2)
    ti = rng.integers(0, len(v0), n)
    b1 = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    b2 = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    over = (b1 + b2) > 1
    b1 = np.where(over, 1 - b1, b1); b2 = np.where(over, 1 - b2, b2)
    ro = v0[ti] + b1 * e1[ti] + b2 * e2[ti]
    nrm = np.cross(e1[ti], e2[ti])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    nrm *= np.where(nrm[:, 1:2] < 0, -1.0, 1.0)
    u1 = rng.uniform(0, 1, n).astype(np.float32)
    u2 = rng.uniform(0, 1, n).astype(np.float32)
    r = np.sqrt(u1); phi = 2 * np.pi * u2
    t1 = np.cross(nrm, np.where(np.abs(nrm[:, 0:1]) < 0.9, [1.0, 0, 0], [0, 1.0, 0]))
    t1 /= np.maximum(np.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = np.cross(nrm, t1)
    rd = (t1 * (r * np.cos(phi))[:, None] + t2 * (r * np.sin(phi))[:, None]
          + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]).astype(np.float32)
    return (ro + 1e-3 * nrm).astype(np.float32), rd


def frame_ms(r, cfg, frames=16):
    r.render(cfg)
    if r._planar:
        _ = np.asarray(r._acc_chunks[-1][0].ravel()[0:1])
    else:
        _ = np.asarray(r.framebuffer.ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(frames):
        r.render(cfg)
    if r._planar:
        _ = np.asarray(r._acc_chunks[-1][0].ravel()[0:1])
    else:
        _ = np.asarray(r.framebuffer.ravel()[0:1])
    return (time.perf_counter() - t0) / frames * 1e3


def main():
    sections = set(sys.argv[1:]) or {
        "cornell", "terrain", "binned", "quant", "tlas", "wavefront",
    }
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
    from realtimepathtracingresearchframework_tpu.ops import (
        traverse_binned as tbin,
        traverse_stream as ts,
    )

    if "cornell" in sections:
        r = Renderer(); r.initialize(1920, 1080)
        r.set_scene(Scene.from_vkr_scene(procedural.cornell_box()))
        cfg = FrameConfig(
            camera=OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50),
            params=RenderParams(batch_spp=1, max_path_depth=9),
        )
        ms = frame_ms(r, cfg)
        print(f"[cornell] 1080p d9: {ms:.1f} ms/frame "
              f"({1920*1080*10/ms/1e3:.1f} Mray/s)", flush=True)

    if sections & {"terrain", "binned", "quant"}:
        sc = Scene.from_vkr_scene(procedural.terrain(grid=500))
        flat = sc.flatten_world()
        ro, rd = bounce_rays(flat, 262144)
        comps = tuple(jnp.asarray(a) for a in
                      (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2]))

    if "terrain" in sections:
        import os as _os
        tsc = SceneConfig(sun_dir=(0.4, 0.7, 0.2), turbidity=3.0)
        cfg = FrameConfig(
            camera=OrientedCamera.look_at([0, 5.0, 12.0], [0, 0, 0], fovy=55),
            params=RenderParams(batch_spp=1, max_path_depth=3),
            scene_config=tsc,
        )
        # full-frame A/B over the streamed closest-hit strategy
        # (RPTR_STREAM_CLOSEST; results identical, scheduling differs)
        for strategy in ("sorted", "ordered", "binned", "multislot"):
            _os.environ["RPTR_STREAM_CLOSEST"] = strategy
            rt = Renderer(); rt.initialize(512, 384)
            rt.set_scene(sc, scene_config=tsc)
            ms = frame_ms(rt, cfg, frames=4)
            print(f"[terrain] 500k 512x384 d3 frame ({strategy}): "
                  f"{ms:.1f} ms", flush=True)
        _os.environ.pop("RPTR_STREAM_CLOSEST", None)

    if "binned" in sections:
        bb = ts.pack_streamed(flat.v0, flat.e1, flat.e2)
        ms = timeit(lambda: ts.closest_hit_streamed(
            bb, None, None, comps=comps, sort=True).t)
        print(f"[binned] streamed sorted closest 262k bounce: {ms:.1f} ms", flush=True)
        ms = timeit(lambda: ts.closest_hit_streamed(
            bb, None, None, comps=comps, sort=True, ordered=True).t)
        print(f"[binned] streamed ORDERED closest 262k bounce: {ms:.1f} ms", flush=True)
        for rounds in (1, 2, 3):
            ms = timeit(lambda: tbin.closest_hit_binned(
                bb, None, None, comps=comps, rounds=rounds).t)
            print(f"[binned] binned closest rounds={rounds}: {ms:.1f} ms", flush=True)
        ms = timeit(lambda: tbin.closest_hit_binned_all(
            bb, None, None, comps=comps).t)
        print(f"[binned] multislot closest: {ms:.1f} ms", flush=True)
        ms = timeit(lambda: tbin.occluded_binned(
            bb, None, None, comps=comps, t_max=30.0, rounds=1))
        print(f"[binned] binned occluded r1: {ms:.1f} ms", flush=True)
        # packet-tightness vs dispatch-count: sorted-walk block sweep
        for blk in (256, 1024):
            ms = timeit(lambda: ts.closest_hit_streamed(
                bb, None, None, comps=comps, sort=True, block=blk).t)
            print(f"[binned] sorted closest block={blk}: {ms:.1f} ms",
                  flush=True)

    if "quant" in sections:
        bq = ts.pack_streamed(flat.v0, flat.e1, flat.e2, quantize=True)
        ms = timeit(lambda: ts.closest_hit_streamed(
            bq, None, None, comps=comps, sort=True).t)
        print(f"[quant] q16 streamed sorted closest: {ms:.1f} ms", flush=True)
        ms = timeit(lambda: tbin.occluded_binned(
            bq, None, None, comps=comps, t_max=30.0, rounds=1))
        print(f"[quant] q16 binned occluded r1: {ms:.1f} ms", flush=True)

    if "wavefront" in sections:
        # VERDICT r2 #1 gate: PT_WAVEFRONT (merged closest+occluded
        # dispatch, v2 kernel) vs megakernel at the headline workload,
        # each with and without live-lane compaction — the flagship
        # combination is wavefront+compact (stream-compacted queues)
        import os as _os
        for variant in ("PT_MEGAKERNEL", "PT_WAVEFRONT"):
            for flag in ("", "1"):
                if flag:
                    _os.environ["RPTR_COMPACT"] = flag
                else:
                    _os.environ.pop("RPTR_COMPACT", None)
                rw = Renderer(); rw.set_variant(variant)
                rw.initialize(1920, 1080)
                rw.set_scene(Scene.from_vkr_scene(procedural.cornell_box()))
                wcfg = FrameConfig(
                    camera=OrientedCamera.look_at(
                        [0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50),
                    params=RenderParams(batch_spp=1, max_path_depth=9),
                )
                ms = frame_ms(rw, wcfg, frames=8)
                print(f"[wavefront] cornell 1080p d9 {variant} "
                      f"compact={bool(flag)}: {ms:.1f} ms "
                      f"({1920*1080*10/ms/1e3:.1f} Mray/s)", flush=True)
        _os.environ.pop("RPTR_COMPACT", None)

    if "tlas" in sections:
        vsc = SceneConfig(sun_dir=(0.35, 0.8, 0.3), turbidity=3.0)
        cam = FrameConfig(
            camera=OrientedCamera.look_at([0, 4.0, 13.0], [0, 0.5, 0], fovy=55),
            params=RenderParams(batch_spp=1, max_path_depth=3),
            scene_config=vsc,
        )
        vscene = Scene.from_vkr_scene(procedural.village())
        rf = Renderer(); rf.initialize(960, 540)
        rf.set_scene(vscene, scene_config=vsc)
        ms_flat = frame_ms(rf, cam, frames=8)
        rp = Renderer()
        rp.options = rp.options.replace(use_tlas=True)
        rp.initialize(960, 540)
        rp.set_scene(vscene, scene_config=vsc)
        mode = "pallas" if rp._use_tlas_pallas else "xla"
        ms_tlas = frame_ms(rp, cam, frames=8)
        print(f"[tlas] village 540p d3: flattened {ms_flat:.1f} ms, "
              f"two-level({mode}) {ms_tlas:.1f} ms "
              f"({ms_tlas/ms_flat:.2f}x)", flush=True)
        # ordered (front-to-back) instance entry on the same scene
        import os as _os
        _os.environ["RPTR_STREAM_CLOSEST"] = "ordered"
        ro_ = Renderer()
        ro_.options = ro_.options.replace(use_tlas=True)
        ro_.initialize(960, 540)
        ro_.set_scene(vscene, scene_config=vsc)
        ms_ord = frame_ms(ro_, cam, frames=8)
        _os.environ.pop("RPTR_STREAM_CLOSEST", None)
        print(f"[tlas] village 540p d3 two-level ORDERED: {ms_ord:.1f} ms "
              f"({ms_ord/ms_tlas:.2f}x vs preorder)", flush=True)


if __name__ == "__main__":
    main()
