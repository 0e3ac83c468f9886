"""Round-4 bounce decomposition: what does ONE full-width bounce's
NON-traversal work cost, op by op, at 524K lanes on village?

The depth sweep (prof/prof_r4_depth.py) measured a full-width bounce at
~5.7 s/frame = ~1.43 s per 524K-lane chunk, while the measured sorted
traversal sums to ~260 ms — and stripping textures only saved ~10%. So
~1.1 s/chunk-bounce hides in shading-adjacent ops. This times each
suspect in isolation with WORST-CASE incoherent inputs (random tri ids,
random surface points, random dirs — the deep-bounce regime):

  1. v3 closest, coherence-sorted (sanity vs ledger 220 ms)
  2. v3 occluded, unsorted incoherent origins   <- in-frame shadow rays
  3. v3 occluded, morton-sorted origins
  4. attr fetch (current take, 16 rows) random vs coherent idx
  5. attr fetch via transposed (T, W) row gather
  6. material fetch (one-hot MXU path)
  7. 3x texture atlas samples at random uv/mip
  8. _nee_candidate (light selection + contribution, no trace)
  9. BSDF sample (sample_gltf_brdf_v) + ortho frame
 10. sky eval (_sky_illum-equivalent Hosek eval)
 11. RNG draws: 4x draw2t + draw1
 12. carry permute: 34-row packed gather (carry-compaction round trip)

Run on the chip: python prof/prof_r4_shade.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.backend.renderer import Renderer
from realtimepathtracingresearchframework_tpu.backend.params import SceneConfig
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import integrator as intg
from realtimepathtracingresearchframework_tpu.ops import nee as nee_mod
from realtimepathtracingresearchframework_tpu.ops import pointsets
from realtimepathtracingresearchframework_tpu.ops import vec3 as v3
from realtimepathtracingresearchframework_tpu.ops.vec3 import Vec3
from realtimepathtracingresearchframework_tpu.ops.bsdf_gltf import (
    sample_gltf_brdf_v,
)
from realtimepathtracingresearchframework_tpu.ops.texture_atlas import (
    sample_atlas,
)
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas3 as tp3
from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
    _compact,
)

N = 524288


def timeit(name, fn, *args, iters=8):
    f = jax.jit(fn)
    o = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), o)
    first = jax.tree_util.tree_leaves(o)[0]
    _ = np.asarray(first.ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    first = jax.tree_util.tree_leaves(o)[0]
    _ = np.asarray(first.ravel()[0:1])
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{name:52s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    scfg = SceneConfig(sun_dir=(0.35, 0.8, 0.3), turbidity=3.0)
    scene = Scene.from_vkr_scene(procedural.village())
    r = Renderer()
    r.initialize(256, 256)
    r.set_scene(scene, scene_config=scfg)
    ds = r.device_scene
    from realtimepathtracingresearchframework_tpu.backend.params import (
        RenderParams,
    )
    cfg = r._integrator_config(RenderParams(batch_spp=1, max_path_depth=9))
    print("cfg: v3=%s compact=%s compact_lanes=%s textures=%s lights=%d"
          % (cfg.kernel_v3, cfg.compact, cfg.compact_lanes,
             cfg.has_textures, cfg.num_lights), flush=True)

    bb = ds.bvh
    T = int(ds.attr_packed.shape[1])
    rng = np.random.default_rng(7)
    lo = np.asarray(bb.scene_lo)
    hi = np.asarray(bb.scene_hi)

    # worst-case incoherent "bounce state"
    p_np = rng.uniform(lo, hi, (N, 3)).astype(np.float32)
    d_np = rng.normal(size=(N, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    tri_np = rng.integers(0, T, N).astype(np.int32)
    tri_coh = np.sort(tri_np).astype(np.int32)

    ro = Vec3(*(jnp.asarray(p_np[:, k]) for k in range(3)))
    rd = Vec3(*(jnp.asarray(d_np[:, k]) for k in range(3)))
    tri = jnp.asarray(tri_np)
    tric = jnp.asarray(tri_coh)
    t_min = jnp.zeros((N,), jnp.float32)
    t_max = jnp.full((N,), 2.0e16, jnp.float32)

    # 1-3: traversal sanity
    timeit("1. v3 closest sorted (block 1024)",
           lambda *a: tp3.closest_hit_pallas3(
               bb, None, None, t_min=a[6], t_max=a[7],
               comps=a[:6], compact=True, block=1024).t,
           *(*ro, *rd), t_min, t_max, iters=4)
    timeit("2. v3 occluded UNSORTED incoherent",
           lambda *a: tp3.occluded_pallas3(
               bb, None, None, t_min=a[6], t_max=a[7], comps=a[:6]),
           *(*ro, *rd), t_min, t_max, iters=4)
    timeit("3. v3 occluded SORTED incoherent",
           lambda *a: tp3.occluded_pallas3(
               bb, None, None, t_min=a[6], t_max=a[7], comps=a[:6],
               compact=True),
           *(*ro, *rd), t_min, t_max, iters=4)

    # 4: attr fetch as the integrator does it
    ranges_tex = [(intg._A_E1, intg._A_MID + 1)]
    ranges_notex = [(intg._A_E1, intg._A_UV0),
                    (intg._A_MID, intg._A_MID + 1)]
    timeit("4a. attr fetch take, tex rows, RANDOM idx",
           lambda i: intg._fetch_cols_ranges(
               ds.attr_packed, i, ranges_tex)[intg._A_E1],
           tri)
    timeit("4b. attr fetch take, tex rows, SORTED idx",
           lambda i: intg._fetch_cols_ranges(
               ds.attr_packed, i, ranges_tex)[intg._A_E1],
           tric)
    timeit("4c. attr fetch take, notex rows, RANDOM idx",
           lambda i: intg._fetch_cols_ranges(
               ds.attr_packed, i, ranges_notex)[intg._A_E1],
           tri)
    timeit("4d. attr fetch take, CONSTANT idx (dead lanes)",
           lambda i: intg._fetch_cols_ranges(
               ds.attr_packed, i, ranges_tex)[intg._A_E1],
           jnp.zeros((N,), jnp.int32))

    # 5: transposed row gather prototype
    attr_t = jnp.asarray(np.ascontiguousarray(
        np.asarray(ds.attr_packed).T))  # (T, W)
    timeit("5a. attr row-gather (T, W)[idx] RANDOM",
           lambda i: attr_t[i].T[0], tri)
    timeit("5b. attr row-gather (T, W)[idx] SORTED",
           lambda i: attr_t[i].T[0], tric)

    # 6: material fetch (one-hot MXU small table)
    nmat = int(ds.mat_packed.shape[1])
    mid = jnp.asarray(rng.integers(0, nmat, N).astype(np.int32))
    timeit("6. mat fetch one-hot (T=%d)" % nmat,
           lambda i: intg._fetch_cols_ranges(
               ds.mat_packed, i, [(intg._M_BASE, intg._M_NMTEX + 1)]
           )[intg._M_BASE], mid)

    # 7: texture samples
    if ds.atlas is not None:
        ntex = int(ds.atlas.desc.shape[0])
        tid = jnp.asarray(rng.integers(0, ntex, N).astype(np.int32))
        uv = jnp.asarray(rng.uniform(0, 8, (N, 2)).astype(np.float32))
        mip = jnp.asarray(rng.uniform(0, 4, N).astype(np.float32))
        timeit("7. ONE atlas bilinear sample, random uv",
               lambda t, u, m: sample_atlas(ds.atlas, t, u, m),
               tid, uv, mip)

    # 8: NEE candidate
    nrm = Vec3(*(jnp.asarray(
        (d_np / np.linalg.norm(d_np, axis=1, keepdims=True))[:, k])
        for k in range(3)))
    mat_cols = intg._fetch_cols_ranges(
        ds.mat_packed, jnp.zeros((N,), jnp.int32),
        [(intg._M_BASE, intg._M_NMTEX + 1)])
    mat = intg._material_from_cols(mat_cols)
    # samples are (u0, u1) tuples of (N,) arrays (SoA draw2t outputs)
    pos_s = tuple(
        jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
        for _ in range(2)
    )
    sel_s = tuple(
        jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
        for _ in range(2)
    )
    total_t = jnp.ones((N,), jnp.float32)
    timeit("8. _nee_candidate (no trace)",
           lambda p, n_, w, p0, p1, s0, s1, tt: intg._nee_candidate(
               ds, cfg, p, n_, n_, mat, w, (p0, p1), (s0, s1), tt
           ).contrib.x,
           ro, nrm, rd, *pos_s, *sel_s, total_t)

    # 9: BSDF sample
    dir_s = tuple(
        jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
        for _ in range(2)
    )
    lobe_s = tuple(
        jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
        for _ in range(2)
    )

    def bsdf(n_, w, d0, d1, l0, l1):
        vx, vy = nee_mod.ortho_frame_v(n_)
        wgt, w_i, spdf, wpdf = sample_gltf_brdf_v(
            mat, n_, w, vx, vy, (d0, d1), (l0, l1), True, False)
        return wgt.x + w_i.x + spdf + wpdf
    timeit("9. BSDF sample + frame", bsdf, nrm, rd, *dir_s, *lobe_s)

    # 10: sky eval
    timeit("10. sky eval (_sky_illum)",
           lambda d, pp: intg._sky_illum(ds, d, pp, cfg).x,
           rd, total_t)

    # 11: RNG draws (one bounce's worth)
    st = pointsets.RngState(
        s0=jnp.asarray(rng.integers(0, 1 << 31, N).astype(np.uint32)),
        s1=jnp.asarray(rng.integers(0, 1 << 31, N).astype(np.uint32)),
    )

    def draws(st):
        acc = jnp.zeros((N,), jnp.float32)
        for dim in (2, 0, 6, 4):
            st, s = pointsets.draw2t(cfg.rng_variant, ds.rng, st,
                                     jnp.int32(10 + dim))
            acc = acc + s[0]
        st, s1 = pointsets.draw1(cfg.rng_variant, ds.rng, st, jnp.int32(17))
        return acc + s1
    timeit("11. RNG draws (4x draw2t + draw1)", draws, st)

    # 12: carry permute round trip (34 rows)
    carry34 = jnp.asarray(rng.normal(size=(34, N)).astype(np.float32))
    perm = jnp.asarray(np.random.permutation(N).astype(np.int32))
    timeit("12. (34, N) packed lane gather", lambda c, p: c[:, p],
           carry34, perm)

    # 13: full _compact round trip on an (8, N) operand for reference
    rays8 = jnp.asarray(rng.normal(size=(8, N)).astype(np.float32))
    rays8 = rays8.at[7].set(jnp.abs(rays8[7]) + 1.0)
    timeit("13. _compact (8, N) sort+gather",
           lambda rr: _compact(rr, bb.scene_lo, bb.scene_hi)[0],
           rays8)


if __name__ == "__main__":
    main()
