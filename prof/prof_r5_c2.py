"""Round-5 cornell bounce decomposition (VERDICT r4 #2, second artifact).

prof_r5_cornell.py established: frame = 4 x depth-9 waves exactly
(20.5 ms/wave, base 4.6 + ~2.1 ms/bounce at 524K lanes), rpp=1M/2M
LOSE, relay dispatch tax ~0.9 ms/program (4 programs/frame = 3.6 ms
floor). To reach <= 45 ms/frame the WAVE must drop to ~11 ms, i.e.
~0.85 ms/bounce. This times every piece of one cornell bounce at 524K
lanes, plus a pure-XLA brute-force traversal prototype: cornell is 32
tris padded to a 128-row leaf, so the v2 kernel pays 4x padding math
per leaf visit AND an unfusable custom-call boundary each dispatch; a
32-row unrolled Moller-Trumbore chain in plain XLA does 4x less math
and fuses into the surrounding shading.

Run on chip: PYTHONPATH=.:/root/.axon_site python prof/prof_r5_c2.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rptr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtimepathtracingresearchframework_tpu.backend.renderer import Renderer
from realtimepathtracingresearchframework_tpu.backend.params import (
    RenderParams,
)
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import integrator as intg
from realtimepathtracingresearchframework_tpu.ops import nee as nee_mod
from realtimepathtracingresearchframework_tpu.ops import pointsets
from realtimepathtracingresearchframework_tpu.ops.vec3 import Vec3
from realtimepathtracingresearchframework_tpu.ops.bsdf_gltf import (
    sample_gltf_brdf_v,
)
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas as tp

N = 524288
_INF = jnp.float32(2.0e32)


def timeit(name, fn, *args, iters=16):
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


def brute_rows(tri_tiles, nrows):
    """Static per-row (v0,e1,e2) scalars from the v2 (L*16, 128) tile
    layout: row k field c lives at tri_tiles[(k // 128) * 16 + c, k % 128]."""
    rows = []
    for k in range(nrows):
        tile, lane = k // 128, k % 128
        rows.append(tuple(
            float(tri_tiles[tile * 16 + c, lane]) for c in range(9)
        ))
    return rows


def brute_closest(rows, ro, rd, t_min, t_max):
    """Unrolled MT chain over all rows; lowest row wins exact-t ties
    (same rule as the v2 kernel's order-independent leaf merge)."""
    best_t = t_max
    best_row = jnp.full(ro.x.shape, -1, jnp.int32)
    best_u = jnp.zeros_like(ro.x)
    best_v = jnp.zeros_like(ro.x)
    for k, (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) in enumerate(rows):
        px = rd.y * e2z - rd.z * e2y
        py = rd.z * e2x - rd.x * e2z
        pz = rd.x * e2y - rd.y * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = ro.x - v0x
        tvy = ro.y - v0y
        tvz = ro.z - v0z
        uu = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        vv = (rd.x * qx + rd.y * qy + rd.z * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = (
            (jnp.abs(det) > 1e-12)
            & (uu >= 0.0)
            & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt > t_min)
            & (tt < jnp.minimum(best_t, t_max))
        )
        best_t = jnp.where(hit, tt, best_t)
        best_row = jnp.where(hit, k, best_row)
        best_u = jnp.where(hit, uu, best_u)
        best_v = jnp.where(hit, vv, best_v)
    return jnp.where(best_row < 0, _INF, best_t), best_row, best_u, best_v


def brute_occluded(rows, ro, rd, t_min, t_max):
    blocked = jnp.zeros(ro.x.shape, bool)
    for (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) in rows:
        px = rd.y * e2z - rd.z * e2y
        py = rd.z * e2x - rd.x * e2z
        pz = rd.x * e2y - rd.y * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = ro.x - v0x
        tvy = ro.y - v0y
        tvz = ro.z - v0z
        uu = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        vv = (rd.x * qx + rd.y * qy + rd.z * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        blocked = blocked | (
            (jnp.abs(det) > 1e-12)
            & (uu >= 0.0)
            & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt > t_min)
            & (tt < t_max)
        )
    return blocked


def main():
    scene = Scene.from_vkr_scene(procedural.cornell_box())
    r = Renderer()
    r.initialize(256, 256)
    r.set_scene(scene)
    ds = r.device_scene
    cfg = r._integrator_config(RenderParams(batch_spp=1, max_path_depth=9))
    bb = ds.bvh
    # real (non-padding) rows: padding rows are all-zero (degenerate)
    tiles_np = np.asarray(bb.tri_tiles)
    nt = tiles_np.shape[0] // 16
    e_norm = np.zeros(nt * 128, np.float32)
    for t in range(nt):
        e_norm[t * 128:(t + 1) * 128] = np.abs(
            tiles_np[t * 16 + 3:t * 16 + 9]).sum(axis=0)
    nz = np.nonzero(e_norm > 0)[0]
    nrows = int(nz[-1]) + 1 if len(nz) else 0
    print(f"cfg: pallas={cfg.use_pallas} v3={cfg.kernel_v3} "
          f"lights={cfg.num_lights} rows={nrows} "
          f"tiles={bb.tri_tiles.shape} nodes={bb.nodes.shape} "
          f"leaf={bb.leaf_size}", flush=True)

    rng = np.random.default_rng(11)
    # in-box ray state (cornell interior)
    p_np = rng.uniform([-1, 0, -1], [1, 2, 1], (N, 3)).astype(np.float32)
    d_np = rng.normal(size=(N, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    ro = Vec3(*(jnp.asarray(p_np[:, k]) for k in range(3)))
    rd = Vec3(*(jnp.asarray(d_np[:, k]) for k in range(3)))
    t_min = jnp.zeros((N,), jnp.float32)
    t_max = jnp.full((N,), 2.0e16, jnp.float32)

    rows = brute_rows(np.asarray(bb.tri_tiles), nrows)

    # 1-2: v2 kernel dispatches (the current cornell path)
    timeit("1. v2 closest kernel",
           lambda *a: tp.closest_hit_pallas(
               bb, None, None, t_min=a[6], t_max=a[7], comps=a[:6]).t,
           *(*ro, *rd), t_min, t_max)
    timeit("2. v2 occluded kernel",
           lambda *a: tp.occluded_pallas(
               bb, None, None, t_min=a[6], t_max=a[7], comps=a[:6]),
           *(*ro, *rd), t_min, t_max)
    timeit("2b. v2 merged closest+occluded (one launch)",
           lambda *a: tp.closest_and_occluded_pallas(
               bb, a[:6], a[6], a[7], a[:6], a[6], a[7])[0].t,
           *(*ro, *rd), t_min, t_max)

    # 3-4: brute-force XLA prototype
    timeit(f"3. brute closest XLA ({nrows} rows)",
           lambda *a: brute_closest(
               rows, Vec3(*a[:3]), Vec3(*a[3:6]), a[6], a[7])[0],
           *(*ro, *rd), t_min, t_max)
    timeit(f"4. brute occluded XLA ({nrows} rows)",
           lambda *a: brute_occluded(
               rows, Vec3(*a[:3]), Vec3(*a[3:6]), a[6], a[7]),
           *(*ro, *rd), t_min, t_max)

    # 4b: correctness spot check vs the kernel
    hk = tp.closest_hit_pallas(bb, None, None, t_min=t_min, t_max=t_max,
                               comps=(*ro, *rd))
    tb_, rb_, ub_, vb_ = jax.jit(
        lambda *a: brute_closest(rows, Vec3(*a[:3]), Vec3(*a[3:6]),
                                 a[6], a[7])
    )(*ro, *rd, t_min, t_max)
    tri_b = np.where(np.asarray(rb_) >= 0,
                     np.asarray(bb.row_tri)[np.maximum(np.asarray(rb_), 0)],
                     -1)
    t_match = np.mean(np.asarray(hk.t) == np.asarray(tb_))
    tri_match = np.mean(np.asarray(hk.tri) == tri_b)
    print(f"   brute vs v2: t bit-match {t_match:.6f} "
          f"tri match {tri_match:.6f}", flush=True)
    ok = tp.occluded_pallas(bb, None, None, t_min=t_min, t_max=t_max,
                            comps=(*ro, *rd))
    ob = jax.jit(
        lambda *a: brute_occluded(rows, Vec3(*a[:3]), Vec3(*a[3:6]),
                                  a[6], a[7])
    )(*ro, *rd, t_min, t_max)
    print(f"   occluded match {np.mean(np.asarray(ok) == np.asarray(ob)):.6f}",
          flush=True)

    # 5-8: shading-side pieces on cornell
    nrm = rd
    mat_cols = intg._fetch_cols_ranges(
        ds.mat_packed, jnp.zeros((N,), jnp.int32),
        [(intg._M_BASE, intg._M_NMTEX + 1)])
    mat = intg._material_from_cols(mat_cols)
    us = [jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
          for _ in range(8)]
    total_t = jnp.ones((N,), jnp.float32)
    timeit("5. _nee_candidate (no trace)",
           lambda p, n_, w, p0, p1, s0, s1, tt: intg._nee_candidate(
               ds, cfg, p, n_, n_, mat, w, (p0, p1), (s0, s1), tt
           ).contrib.x,
           ro, nrm, rd, *us[:4], total_t)

    def bsdf(n_, w, d0, d1, l0, l1):
        vx, vy = nee_mod.ortho_frame_v(n_)
        wgt, w_i, spdf, wpdf = sample_gltf_brdf_v(
            mat, n_, w, vx, vy, (d0, d1), (l0, l1), True, False)
        return wgt.x + w_i.x + spdf + wpdf
    timeit("6. BSDF sample + frame", bsdf, nrm, rd, *us[4:8])

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
    timeit("7. RNG draws (4x draw2t + draw1)", draws, st)

    tri = jnp.asarray(rng.integers(0, 32, N).astype(np.int32))
    timeit("8. attr fetch (one-hot, 32 tris)",
           lambda i: intg._fetch_cols_ranges(
               ds.attr_packed, i,
               [(intg._A_E1, intg._A_UV0), (intg._A_MID, intg._A_MID + 1)]
           )[intg._A_E1], tri)
    timeit("9. sky eval (_sky_illum)",
           lambda d, pp: intg._sky_illum(ds, d, pp, cfg).x,
           rd, total_t)


if __name__ == "__main__":
    main()
