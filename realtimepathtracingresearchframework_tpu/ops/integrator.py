"""Megakernel path-tracing integrator (jitted JAX).

The TPU analogue of the flagship ``PT_MEGAKERNEL`` compute integrator
(vulkan/pt_megakernel.glsl): one traced program per sample batch that
generates camera rays, then runs a statically-unrolled bounce loop of
{traverse -> hit attributes -> emitter MIS -> NEE + shadow ray -> BSDF
sample -> Russian roulette}, with lane masks instead of the reference's
EXPLICIT_MASK subgroup trick (pt_megakernel.glsl:369-415).

Semantics ported 1:1 (so validation images are self-consistent across our
variants, like the reference's integrator variants):
- camera ray setup + box pixel filter (pt_megakernel.glsl:311-326,
  gpu_params.glsl:42),
- LCG RNG sequence order: pixel filter, then per bounce NEE position,
  light selection, BSDF lobe, BSDF direction, RR
  (mc/shade_base_material.glsl:60-84, pt_megakernel.glsl:713-730),
- normal facing rules for two-sided materials (pt_megakernel.glsl:622-634),
- emitter-hit MIS with prev-bounce pdf init 2e16
  (mc/shading_interface.glsl:20-22, shade_base_material.glsl:33-39),
- NEE sun/area selection by sun_radiance.w with balance heuristic
  (mc/nee.glsl:40-90),
- ray epsilon (|origin| + total_t) * 5e-6 (vulkan/geometry.glsl:76-78),
- RR from rr_path_depth, prob clamped to 0.95 beyond bounce 6
  (pt_megakernel.glsl:713-730),
- alpha = 0 for primary miss else 1 (pt_megakernel.glsl:737).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from realtimepathtracingresearchframework_tpu.models.material import (
    BASE_MATERIAL_NOALPHA,
    BASE_MATERIAL_ONESIDED,
    BASE_MATERIAL_VOLUME,
)
from realtimepathtracingresearchframework_tpu.models.sky import (
    SkyParams,
    sky_radiance,
)
from realtimepathtracingresearchframework_tpu.ops import nee as nee_mod
from realtimepathtracingresearchframework_tpu.ops import pointsets
from realtimepathtracingresearchframework_tpu.ops import rng as rng_mod
from realtimepathtracingresearchframework_tpu.ops.bsdf_gltf import (
    GLTFMaterial,
    gltf_bsdf,
    gltf_wpdf,
    sample_gltf_brdf,
)
from realtimepathtracingresearchframework_tpu.ops.intersect import T_MAX
from realtimepathtracingresearchframework_tpu.ops.traverse import (
    ThreadedBuffers,
    TriBuffers,
    closest_hit_threaded,
    occluded_threaded,
)
from realtimepathtracingresearchframework_tpu.ops.smallgather import select_rows
from realtimepathtracingresearchframework_tpu.ops import tlas as tlas_mod
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas
from realtimepathtracingresearchframework_tpu.ops.texture_atlas import (
    TextureAtlas,
    sample_atlas,
)

RAY_EPSILON = 5.0e-6  # vulkan/gpu_params.glsl:28
RAYS_PER_PASS = 262144  # HBM working-set bound for one integrator pass


class MaterialBuffers(NamedTuple):
    base_color: jnp.ndarray
    roughness: jnp.ndarray
    specular: jnp.ndarray
    metallic: jnp.ndarray
    ior: jnp.ndarray
    specular_transmission: jnp.ndarray
    emission_intensity: jnp.ndarray
    flags: jnp.ndarray
    base_color_tex: jnp.ndarray  # i32, -1 = constant
    specular_tex: jnp.ndarray  # .g roughness, .b metallic (scene.cpp:946-951)
    normal_tex: jnp.ndarray

    @staticmethod
    def from_table(table) -> "MaterialBuffers":
        return MaterialBuffers(
            base_color=jnp.asarray(table.base_color),
            roughness=jnp.asarray(table.roughness),
            specular=jnp.asarray(table.specular),
            metallic=jnp.asarray(table.metallic),
            ior=jnp.asarray(table.ior),
            specular_transmission=jnp.asarray(table.specular_transmission),
            emission_intensity=jnp.asarray(table.emission_intensity),
            flags=jnp.asarray(table.flags),
            base_color_tex=jnp.asarray(table.base_color_tex),
            specular_tex=jnp.asarray(table.specular_tex),
            normal_tex=jnp.asarray(table.normal_tex),
        )


class ShadingBuffers(NamedTuple):
    """Per-triangle shading attributes (SoA)."""

    n0: jnp.ndarray  # (T,3)
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray  # (T,2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    material_id: jnp.ndarray  # (T,)
    texel_density: jnp.ndarray  # (T,) uv-units per world-unit
    tangent: jnp.ndarray  # (T,4) tangent xyz + handedness


class DeviceScene(NamedTuple):
    """Everything the integrator needs, as one pytree of device arrays."""

    bvh: ThreadedBuffers
    tris: TriBuffers
    shading: ShadingBuffers
    materials: MaterialBuffers
    lights: nee_mod.TriLightBuffers
    sky: SkyParams
    atlas: TextureAtlas  # dummy 1-texel atlas when cfg.has_textures is False
    rng: pointsets.RngBuffers  # pointset tables (dummy for the LCG variant)
    tlas: object = None  # TwoLevelBuffers when cfg.two_level (else None)
    attr_packed: object = None  # (T, ATTR_W) f32 fused per-tri attribute rows
    mat_packed: object = None  # (M, MAT_W) f32 fused material rows


# ---------------------------------------------------------------------------
# Packed attribute/material rows. On TPU each distinct gather index vector
# costs ~2ms/262K lanes at the scalar-memory staging boundary regardless of
# table size, so the per-bounce attribute fetch (edges, normals, uvs,
# tangent, material id + 11 material fields) is fused into ONE (T, 32) row
# gather + one (M, 16) material row fetch: measured 4.1ms -> ~1.2ms per
# bounce per 262K rays. Integer columns are bitcast into the f32 rows.
# ---------------------------------------------------------------------------

ATTR_W = 32
_A_E1, _A_E2 = 0, 3
_A_N0, _A_N1, _A_N2 = 6, 9, 12
_A_UV0, _A_UV1, _A_UV2 = 15, 17, 19
_A_TAN = 21  # 4 wide (xyz + handedness)
_A_DENS = 25
_A_MID = 26  # material id, i32 bitcast

MAT_W = 16
_M_BASE = 0  # 3 wide
_M_ROUGH, _M_SPEC, _M_METAL, _M_IOR = 3, 4, 5, 6
_M_STRANS, _M_EMIT = 7, 8
_M_FLAGS, _M_BCTEX, _M_SPTEX, _M_NMTEX = 9, 10, 11, 12  # i32 bitcast


def pack_attr_table(tris: TriBuffers, shading: ShadingBuffers) -> jnp.ndarray:
    """Fuse the per-triangle shading attributes into (T, ATTR_W) f32 rows."""
    t = shading.n0.shape[0]
    cols = [
        tris.e1, tris.e2, shading.n0, shading.n1, shading.n2,
        shading.uv0, shading.uv1, shading.uv2, shading.tangent,
        shading.texel_density[:, None],
        jax.lax.bitcast_convert_type(
            jnp.asarray(shading.material_id, jnp.int32), jnp.float32
        )[:, None],
    ]
    packed = jnp.concatenate([jnp.asarray(c, jnp.float32) for c in cols], axis=1)
    pad = ATTR_W - packed.shape[1]
    return jnp.pad(packed, ((0, 0), (0, pad)))


def pack_material_table(mats: MaterialBuffers) -> jnp.ndarray:
    """Fuse the material fields into (M, MAT_W) f32 rows."""

    def as_f32_bits(a):
        return jax.lax.bitcast_convert_type(
            jnp.asarray(a, jnp.int32), jnp.float32
        )[:, None]

    cols = [
        jnp.asarray(mats.base_color, jnp.float32),
        jnp.asarray(mats.roughness, jnp.float32)[:, None],
        jnp.asarray(mats.specular, jnp.float32)[:, None],
        jnp.asarray(mats.metallic, jnp.float32)[:, None],
        jnp.asarray(mats.ior, jnp.float32)[:, None],
        jnp.asarray(mats.specular_transmission, jnp.float32)[:, None],
        jnp.asarray(mats.emission_intensity, jnp.float32)[:, None],
        as_f32_bits(mats.flags),
        as_f32_bits(mats.base_color_tex),
        as_f32_bits(mats.specular_tex),
        as_f32_bits(mats.normal_tex),
    ]
    packed = jnp.concatenate(cols, axis=1)
    pad = MAT_W - packed.shape[1]
    return jnp.pad(packed, ((0, 0), (0, pad)))


def _material_from_rows(mrow) -> GLTFMaterial:
    """Unpack a gathered (N, MAT_W) material-row batch."""
    base = mrow[:, _M_BASE:_M_BASE + 3]
    flags = jax.lax.bitcast_convert_type(mrow[:, _M_FLAGS], jnp.int32)
    return GLTFMaterial(
        base_color=base,
        metallic=mrow[:, _M_METAL],
        specular=mrow[:, _M_SPEC],
        roughness=mrow[:, _M_ROUGH],
        ior=mrow[:, _M_IOR],
        specular_transmission=mrow[:, _M_STRANS],
        transmission_color=base,
        onesided=(flags & BASE_MATERIAL_ONESIDED) != 0,
    )


class ViewBuffers(NamedTuple):
    """ViewParams analogue (vulkan/gpu_params.glsl:61-87)."""

    cam_pos: jnp.ndarray  # (3,)
    cam_du: jnp.ndarray
    cam_dv: jnp.ndarray
    cam_dir_top_left: jnp.ndarray


class IntegratorConfig(NamedTuple):
    """Static (trace-time) configuration — the RBO_*/compile-time subset."""

    max_path_depth: int = 9
    light_bin_size: int = 16
    use_light_bins: bool = False
    num_lights: int = 0
    stack_depth: int = 32
    enable_sun_sky: bool = True
    unroll: bool = False  # RBO unroll_bounces (render_params.glsl.h:85)
    use_pallas: bool = False  # Pallas traversal kernel (TPU, VMEM-resident)
    wavefront: bool = False  # stream-compact ray queues between bounces
    has_textures: bool = False  # trace the texture-lookup stage
    rng_variant: int = 0  # RNG_VARIANT_* (render_params.glsl.h:34-43)
    alpha_test: bool = False  # any-hit alpha-cutout emulation
    two_level: bool = False  # BLAS/TLAS instanced traversal (ops/tlas.py)
    row_attrs: bool = False  # attribute tables are BVH-row-ordered (pallas)


class FrameParams(NamedTuple):
    """Dynamic per-frame params (RenderParams subset, traced values)."""

    rr_path_depth: jnp.ndarray
    glossy_only_mode: jnp.ndarray
    sample_offset: jnp.ndarray  # accumulation frame offset (uint32)
    shot_offset: jnp.ndarray  # frame_offset randomization (uint32)
    pixel_spread: jnp.ndarray = jnp.float32(0.001)  # radians/px, for mip LOD
    bump_scale: jnp.ndarray = jnp.float32(1.0)  # SceneConfig.bump_scale


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def _gather_material(mats: MaterialBuffers, mid) -> GLTFMaterial:
    base = select_rows(mats.base_color, mid)
    return GLTFMaterial(
        base_color=base,
        metallic=select_rows(mats.metallic, mid),
        specular=select_rows(mats.specular, mid),
        roughness=select_rows(mats.roughness, mid),
        ior=select_rows(mats.ior, mid),
        specular_transmission=select_rows(mats.specular_transmission, mid),
        transmission_color=base,
        onesided=(select_rows(mats.flags, mid) & BASE_MATERIAL_ONESIDED) != 0,
    )


def _sky_illum(ds: DeviceScene, ro, rd, prev_pdf, cfg: IntegratorConfig):
    """compute_sky_illum (pt_megakernel.glsl:113-149)."""
    if not cfg.enable_sun_sky:
        return jnp.zeros(ro.shape[:-1] + (3,), jnp.float32)
    atm = jnp.abs(sky_radiance(ds.sky, rd))
    # sun disk with MIS vs NEE sun sampling
    y = rd[..., 1]
    ocean = jnp.where(y <= 0.0, 0.7 * jnp.maximum(1.0 - jnp.abs(y), 0.0) ** 5, 1.0)
    dm = jnp.stack([rd[..., 0], jnp.abs(y), rd[..., 2]], axis=-1)
    dm = _normalize(dm)
    in_cap = _dot(dm, ds.sky.sun_dir) >= ds.sky.sun_cos_angle
    sun = jnp.where(
        in_cap[..., None], ds.sky.sun_radiance[:3] * ocean[..., None], 0.0
    )
    light_pdf = ds.sky.sun_radiance[3] * nee_mod.sun_dir_pdf(ds.sky.sun_cos_angle)
    w = nee_mod.nee_mis_heuristic(1.0, prev_pdf, 1.0, light_pdf)
    return atm + w[..., None] * jnp.abs(sun)


MAX_ALPHA_HOPS = 4  # candidate-hit re-trace budget (generate_candidate_hit)
ALPHA_CUTOFF = 0.5  # punch-through threshold


def _hit_alpha_cut(ds: DeviceScene, tri, u, v):
    """True where the hit texel is alpha-cut — the any-hit alpha test
    emulation of ``generate_candidate_hit`` (pt_megakernel.glsl:153-211,
    any_hit.glsl). Samples mip 0 of the base-color texture."""
    t = jnp.maximum(tri, 0)
    row = ds.attr_packed[t]
    b0 = 1.0 - u - v
    uv = (
        row[..., _A_UV0:_A_UV0 + 2] * b0[..., None]
        + row[..., _A_UV1:_A_UV1 + 2] * u[..., None]
        + row[..., _A_UV2:_A_UV2 + 2] * v[..., None]
    )
    mid = jax.lax.bitcast_convert_type(row[..., _A_MID], jnp.int32)
    mrow = select_rows(ds.mat_packed, mid)
    bc_tid = jax.lax.bitcast_convert_type(mrow[..., _M_BCTEX], jnp.int32)
    flags = jax.lax.bitcast_convert_type(mrow[..., _M_FLAGS], jnp.int32)
    a = sample_atlas(ds.atlas, bc_tid, uv, jnp.zeros_like(u))[..., 3]
    can_cut = (bc_tid >= 0) & ((flags & BASE_MATERIAL_NOALPHA) == 0)
    return (tri >= 0) & can_cut & (a < ALPHA_CUTOFF)


def _closest_hit_dispatch(ds: DeviceScene, cfg: IntegratorConfig, ro, rd,
                          t_min, t_max, comps=None):
    if cfg.use_pallas:
        return traverse_pallas.closest_hit_pallas(
            ds.bvh, ro, rd, t_min=t_min, t_max=t_max, comps=comps,
            map_tri=not cfg.row_attrs,
        )
    return closest_hit_threaded(ds.bvh, ro, rd, t_min=t_min, t_max=t_max)


def closest_hit_alpha(ds: DeviceScene, cfg: IntegratorConfig, ro, rd,
                      t_min, t_max, comps=None):
    """Closest hit honoring alpha-cutout textures: re-traces past cut
    texels up to MAX_ALPHA_HOPS (the reference's candidate-hit loop).
    Static no-op unless ``cfg.alpha_test``."""
    hit = _closest_hit_dispatch(ds, cfg, ro, rd, t_min, t_max, comps=comps)
    if not (cfg.alpha_test and cfg.has_textures):
        return hit
    from realtimepathtracingresearchframework_tpu.ops.traverse import Hit

    cut0 = _hit_alpha_cut(ds, hit.tri, hit.u, hit.v)

    def cond(c):
        i = c[0]
        return (i < MAX_ALPHA_HOPS) & jnp.any(c[5])

    def body(c):
        i, t, tri, u, v, cut = c
        eps = jnp.abs(t) * 1e-4 + 1e-5
        nxt_tmin = jnp.where(cut, t + eps, t_min)
        nxt_tmax = jnp.where(cut, t_max, 0.0)  # settled lanes trace nothing
        h = _closest_hit_dispatch(ds, cfg, ro, rd, nxt_tmin, nxt_tmax)
        t = jnp.where(cut, h.t, t)
        tri = jnp.where(cut, h.tri, tri)
        u = jnp.where(cut, h.u, u)
        v = jnp.where(cut, h.v, v)
        cut = cut & _hit_alpha_cut(ds, tri, u, v)
        return (i + 1, t, tri, u, v, cut)

    _, t, tri, u, v, cut = jax.lax.while_loop(
        cond, body, (jnp.int32(0), hit.t, hit.tri, hit.u, hit.v, cut0)
    )
    # hops exhausted while still cut: treat as opaque (reference behavior)
    return Hit(t=t, tri=tri, u=u, v=v)


def occluded_alpha(ds: DeviceScene, cfg: IntegratorConfig, ro, rd,
                   t_min, t_max):
    """Shadow-ray visibility honoring alpha cutouts (any_hit.rahit): walks
    candidate hits until a solid blocker or segment end."""
    if cfg.two_level:
        # alpha cutouts are resolved in the flattened path only for now
        return tlas_mod.occluded_two_level(ds.tlas, ro, rd, t_min, t_max)
    if not (cfg.alpha_test and cfg.has_textures):
        if cfg.use_pallas:
            return traverse_pallas.occluded_pallas(
                ds.bvh, ro, rd, t_min=t_min, t_max=t_max
            )
        return occluded_threaded(ds.bvh, ro, rd, t_min=t_min, t_max=t_max)

    hit = _closest_hit_dispatch(ds, cfg, ro, rd, t_min, t_max)
    in_seg = (hit.tri >= 0) & (hit.t < t_max)
    cut0 = _hit_alpha_cut(ds, hit.tri, hit.u, hit.v)
    blocked0 = in_seg & ~cut0
    live0 = in_seg & cut0

    def cond(c):
        i = c[0]
        return (i < MAX_ALPHA_HOPS) & jnp.any(c[3])

    def body(c):
        i, t, blocked, live = c
        eps = jnp.abs(t) * 1e-4 + 1e-5
        nxt_tmin = jnp.where(live, t + eps, t_min)
        nxt_tmax = jnp.where(live, t_max, 0.0)
        h = _closest_hit_dispatch(ds, cfg, ro, rd, nxt_tmin, nxt_tmax)
        in_seg = (h.tri >= 0) & (h.t < t_max) & live
        cut = _hit_alpha_cut(ds, h.tri, h.u, h.v)
        blocked = blocked | (in_seg & ~cut)
        live = in_seg & cut
        t = jnp.where(live, h.t, t)
        return (i + 1, t, blocked, live)

    _, _, blocked, live = jax.lax.while_loop(
        cond, body, (jnp.int32(0), hit.t, blocked0, live0)
    )
    # hops exhausted while still inside cut geometry: treat as blocked
    return blocked | live


def _sample_direct_light(
    ds: DeviceScene,
    cfg: IntegratorConfig,
    hit_p,
    hit_n,
    hit_gn,
    mat: GLTFMaterial,
    w_o,
    dir_sample,
    sel_sample,
    total_t,
):
    """sample_direct_light (mc/nee.glsl:32-90) + visibility ray."""
    sun_w = ds.sky.sun_radiance[3]

    # --- sun branch
    sun_sel = sel_sample[..., 0] <= sun_w
    sun_dir = nee_mod.sample_sun_dir(
        ds.sky.sun_dir, ds.sky.sun_cos_angle, dir_sample
    )
    sun_pdf = nee_mod.sun_dir_pdf(ds.sky.sun_cos_angle)
    sun_illum = (ds.sky.sun_radiance[:3] / jnp.maximum(sun_w, 1e-9)) / sun_pdf
    sun_light_pdf = sun_pdf * sun_w

    if cfg.num_lights > 0:
        # --- area branch (renormalized selector)
        sel2 = jnp.stack(
            [
                jnp.clip(
                    (sel_sample[..., 0] - sun_w) / jnp.maximum(1.0 - sun_w, 1e-9),
                    0.0,
                    1.0,
                ),
                sel_sample[..., 1],
            ],
            axis=-1,
        )
        ls = nee_mod.sample_tri_lights(
            ds.lights,
            hit_p,
            hit_n,
            dir_sample,
            sel2,
            cfg.light_bin_size,
            cfg.use_light_bins,
        )
        tri_illum = ls.illum / jnp.maximum(1.0 - sun_w, 1e-9)
        tri_light_pdf = ls.pdf * (1.0 - sun_w)
        tri_mis_pdf = ls.mis_wpdf * (1.0 - sun_w)

        illum = jnp.where(sun_sel[..., None], sun_illum, tri_illum)
        light_dir = jnp.where(sun_sel[..., None], sun_dir, ls.dir)
        light_dist = jnp.where(sun_sel, 2.0e16, ls.dist)
        light_pdf = jnp.where(sun_sel, sun_light_pdf, tri_light_pdf)
        mis_pdf = jnp.where(sun_sel, sun_light_pdf, tri_mis_pdf)
    else:
        illum = sun_illum * jnp.ones_like(hit_p)
        light_dir = sun_dir
        light_dist = jnp.full(hit_p.shape[:-1], 2.0e16, jnp.float32)
        light_pdf = jnp.full(hit_p.shape[:-1], sun_light_pdf, jnp.float32)
        mis_pdf = light_pdf

    # strict normals (nee.glsl:73-75)
    strict = _dot(light_dir, hit_gn) * _dot(light_dir, hit_n) > 0.0
    candidate = (light_pdf > 0.0) & strict

    # visibility segment with epsilon (pt_megakernel.glsl:216-224)
    eps = (jnp.linalg.norm(hit_p, axis=-1) + total_t) * RAY_EPSILON
    seg_ok = light_dist - 2.0 * eps > 0.0
    shadow_tmax = jnp.maximum(light_dist - eps, eps)
    shadow_tmax_eff = jnp.where(candidate & seg_ok, shadow_tmax, eps)
    blocked = occluded_alpha(
        ds, cfg, hit_p, light_dir, t_min=eps, t_max=shadow_tmax_eff
    )
    visible = candidate & (~blocked | ~seg_ok)

    bsdf_pdf = gltf_wpdf(mat, hit_n, w_o, light_dir)
    f = gltf_bsdf(mat, hit_n, w_o, light_dir)
    w = nee_mod.nee_mis_heuristic(1.0, mis_pdf, 1.0, bsdf_pdf)
    contrib = (
        illum
        * (w * jnp.abs(_dot(light_dir, hit_n)))[..., None]
        * f
    )
    ok = visible & (bsdf_pdf >= 0.0)
    return jnp.where(ok[..., None], contrib, 0.0)



def _split3(v):
    """(N,3) -> three (N,) components. Per-ray state is carried through the
    bounce loop as 1-D components: multi-column carries let XLA choose
    column-major layouts that fight the gathers/custom-calls and insert
    ~30ms transposing relayout copies per iteration."""
    return v[..., 0], v[..., 1], v[..., 2]


def _join3(x, y, z):
    return jnp.stack([x, y, z], axis=-1)


def _pack_carry(ro, rd, t_min, illum, throughput, active, prev_pdf,
                bounce_count, total_t, rng_state, rays):
    return (
        *_split3(ro), *_split3(rd), t_min, *_split3(illum),
        *_split3(throughput), active, prev_pdf, bounce_count, total_t,
        rng_state, rays,
    )


def _unpack_carry(c):
    ro = _join3(c[0], c[1], c[2])
    rd = _join3(c[3], c[4], c[5])
    t_min = c[6]
    illum = _join3(c[7], c[8], c[9])
    throughput = _join3(c[10], c[11], c[12])
    active, prev_pdf, bounce_count, total_t, rng_state, rays = c[13:19]
    return (ro, rd, t_min, illum, throughput, active, prev_pdf,
            bounce_count, total_t, rng_state, rays)


def trace_paths(
    ds: DeviceScene,
    cfg: IntegratorConfig,
    fp: FrameParams,
    ro,
    rd,
    rng_state,
    lane_mask=None,
):
    """Trace a batch of paths; returns (rgb (N,3), alpha (N,), rays (N,)).

    ``rays`` is the per-lane traced-ray count (closest + shadow) — the
    REPORT_RAY_STATS per-pixel image (render_vulkan.h:87-91); sum it for
    the aggregate counter.

    The bounce loop runs as ``lax.fori_loop`` by default (the reference's
    DYNAMIC_LOOP_BOUNCES mode) or statically unrolled when ``cfg.unroll``
    (the self-#include unroll, pt_megakernel.glsl:390-415). The last bounce
    is an epilogue doing only traverse + emitter/sky — NEE/BSDF work is cut
    there (shade_base_material.glsl:56-57).
    """
    n = ro.shape[0]
    num_bins = max(cfg.num_lights // max(cfg.light_bin_size, 1), 1)

    def visit_hit(carry):
        """Traverse + hit attributes + emitter MIS; shared by body/epilogue.
        Returns (carry w/ miss handled, hit shading context)."""
        (ro, rd, t_min, illum, throughput, active, prev_pdf, bounce_count,
         total_t, rng_state, rays) = _unpack_carry(carry)
        rays = rays + active.astype(rays.dtype)  # per-lane ray counter
        tmax_eff = jnp.where(active, T_MAX, 0.0)
        if cfg.two_level:
            hit = tlas_mod.closest_hit_two_level(
                ds.tlas, ro, rd, t_min=t_min, t_max=tmax_eff
            )
        else:
            # carry[0:6] are the SoA ray components — feeding them to the
            # kernel pack avoids (N,3) column-major relayout copies
            hit = closest_hit_alpha(
                ds, cfg, ro, rd, t_min, tmax_eff, comps=carry[0:6]
            )
        was_miss = hit.tri < 0

        # ---- miss: sky (pt_megakernel.glsl:480-489)
        sky = _sky_illum(ds, ro, rd, prev_pdf, cfg)
        illum = jnp.where(
            (active & was_miss)[..., None], illum + throughput * sky, illum
        )
        active = active & ~was_miss

        # ---- hit attributes (rt/hit.glsl:63-92, pt_megakernel.glsl:576-580)
        # one fused (T, ATTR_W) row gather replaces 7 split gathers (see
        # pack_attr_table): gather index staging dominates on TPU
        tri = jnp.maximum(hit.tri, 0)
        row = ds.attr_packed[tri]
        e1 = row[:, _A_E1:_A_E1 + 3]
        e2 = row[:, _A_E2:_A_E2 + 3]
        b1, b2 = hit.u, hit.v
        b0 = 1.0 - b1 - b2
        n_sh = (
            row[:, _A_N0:_A_N0 + 3] * b0[..., None]
            + row[:, _A_N1:_A_N1 + 3] * b1[..., None]
            + row[:, _A_N2:_A_N2 + 3] * b2[..., None]
        )
        if cfg.two_level:
            # object -> world: edges by the instance linear A, normals by
            # A^-T (correct under the format's signed-uniform scales,
            # vkr.h:15 transform encoding)
            inst = jnp.maximum(hit.inst, 0)
            A = ds.tlas.inst_linear[inst].reshape(-1, 3, 3)
            Ait = ds.tlas.inst_inv_t[inst].reshape(-1, 3, 3)
            e1 = jnp.einsum("nab,nb->na", A, e1)
            e2 = jnp.einsum("nab,nb->na", A, e2)
            n_sh = jnp.einsum("nab,nb->na", Ait, n_sh)
        gn_raw = jnp.cross(e1, e2)
        gn_raw = jnp.where((_dot(n_sh, gn_raw) < 0.0)[..., None], -gn_raw, gn_raw)
        gn_len = jnp.linalg.norm(gn_raw, axis=-1)  # 2*area
        gn = gn_raw / jnp.maximum(gn_len, 1e-20)[..., None]
        # approx solid angle of the hit triangle as seen from the origin
        approx_sa = (
            (0.5 * gn_len)
            * jnp.abs(_dot(gn, rd))
            / jnp.maximum(hit.t * hit.t, 1e-20)
        )
        n_sh = _normalize(n_sh)

        mid = jax.lax.bitcast_convert_type(row[:, _A_MID], jnp.int32)
        if cfg.two_level:
            mid = mid + ds.tlas.inst_mat_offset[inst]
        mrow = select_rows(ds.mat_packed, mid)
        mat = _material_from_rows(mrow)

        p = ro + hit.t[..., None] * rd
        w_o = -rd

        # two-sided flip (pt_megakernel.glsl:622-634)
        backface = _dot(w_o, gn) < 0.0
        flip = backface & ((mat.onesided == False))  # noqa: E712
        n_sh = jnp.where(flip[..., None], -n_sh, n_sh)
        gn = jnp.where(flip[..., None], -gn, gn)

        total_t = jnp.where(active, total_t + hit.t, total_t)

        # ---- texture lookups (rt/material_textures.glsl; mip from an
        # isotropic footprint-cone approximation of rt/footprint.glsl)
        if cfg.has_textures:
            uv = (
                row[:, _A_UV0:_A_UV0 + 2] * b0[..., None]
                + row[:, _A_UV1:_A_UV1 + 2] * b1[..., None]
                + row[:, _A_UV2:_A_UV2 + 2] * b2[..., None]
            )
            density = row[:, _A_DENS]
            if cfg.two_level:
                # object-space density scales by 1/|s| in world units
                density = density / jnp.maximum(ds.tlas.inst_scale[inst], 1e-8)
            footprint_world = total_t * fp.pixel_spread

            def tex_mip(tid):
                base_w = ds.atlas.desc[jnp.maximum(tid, 0), 0, 1].astype(
                    jnp.float32
                )
                return jnp.log2(
                    jnp.maximum(footprint_world * density * base_w, 1.0)
                )

            bc_tid = jax.lax.bitcast_convert_type(mrow[:, _M_BCTEX], jnp.int32)
            bc = sample_atlas(ds.atlas, bc_tid, uv, tex_mip(bc_tid))
            mat = mat._replace(
                base_color=jnp.where(
                    (bc_tid >= 0)[..., None], bc[..., :3], mat.base_color
                ),
            )
            mat = mat._replace(transmission_color=mat.base_color)

            sp_tid = jax.lax.bitcast_convert_type(mrow[:, _M_SPTEX], jnp.int32)
            sp = sample_atlas(ds.atlas, sp_tid, uv, tex_mip(sp_tid))
            has_sp = sp_tid >= 0
            mat = mat._replace(
                roughness=jnp.where(has_sp, sp[..., 1], mat.roughness),
                metallic=jnp.where(has_sp, sp[..., 2], mat.metallic),
            )

            # normal mapping in the uv tangent frame
            # (pt_megakernel.glsl:636-648)
            nm_tid = jax.lax.bitcast_convert_type(mrow[:, _M_NMTEX], jnp.int32)
            nm = sample_atlas(ds.atlas, nm_tid, uv, tex_mip(nm_tid))
            tn = nm[..., :3] * 2.0 - 1.0
            tn = tn.at[..., 0:2].multiply(fp.bump_scale)
            tang4 = row[:, _A_TAN:_A_TAN + 4]
            tang = tang4[..., :3]
            if cfg.two_level:
                tang = jnp.einsum("nab,nb->na", A, tang)
            tang = _normalize(
                tang - n_sh * _dot(tang, n_sh)[..., None]
            )
            hand = tang4[..., 3:4]
            if cfg.two_level:
                hand = hand * ds.tlas.inst_sign[inst][..., None]
            bitan = jnp.cross(n_sh, tang) * hand
            n_mapped = _normalize(
                tn[..., 0:1] * tang + tn[..., 1:2] * bitan + tn[..., 2:3] * n_sh
            )
            ok_nm = (nm_tid >= 0) & (jnp.linalg.norm(tn, axis=-1) > 1e-4)
            n_sh = jnp.where(ok_nm[..., None], n_mapped, n_sh)

        # ---- emitter hit MIS (shade_base_material.glsl:33-39)
        emit_intensity = mrow[:, _M_EMIT]
        emit_radiance = mat.base_color * emit_intensity[..., None]
        has_emit = emit_intensity > 0.0
        wpdf_light = (1.0 - ds.sky.sun_radiance[3]) * nee_mod.approx_tri_lights_pdf(
            approx_sa, max(cfg.num_lights, 1), num_bins, cfg.use_light_bins
        )
        w_emit = nee_mod.nee_mis_heuristic(1.0, prev_pdf, 1.0, wpdf_light)
        illum = jnp.where(
            (active & has_emit)[..., None],
            illum + w_emit[..., None] * throughput * emit_radiance,
            illum,
        )

        bounce_count = jnp.where(active, bounce_count + 1, bounce_count)

        carry = _pack_carry(ro, rd, t_min, illum, throughput, active,
                            prev_pdf, bounce_count, total_t, rng_state, rays)
        ctx = (p, n_sh, gn, mat, w_o)
        return carry, ctx

    def scatter_tail(args):
        """NEE + BSDF sample + RR — skipped on the final bounce."""
        carry, ctx, bounce_i = args
        (ro, rd, t_min, illum, throughput, active, prev_pdf, bounce_count,
         total_t, rng_state, rays) = _unpack_carry(carry)
        p, n_sh, gn, mat, w_o = ctx

        # ---- RNG draws in reference order (shade_base_material.glsl:60-84)
        # with pathspace dims (pathspace.h): bounce block = 2 + 8b, light
        # dims first {sel:+0, pos:+2} then vertex dims {dir:+4, lobe:+6},
        # RR reusing the free-path slot {+7}
        dim_base = jnp.int32(2) + jnp.int32(8) * bounce_i
        rv = cfg.rng_variant
        rng_state, pos_sample = pointsets.draw2(rv, ds.rng, rng_state, dim_base + 2)
        rng_state, sel_sample = pointsets.draw2(rv, ds.rng, rng_state, dim_base + 0)
        rng_state, lobe_sample = pointsets.draw2(rv, ds.rng, rng_state, dim_base + 6)
        rng_state, dir_sample = pointsets.draw2(rv, ds.rng, rng_state, dim_base + 4)

        # ---- NEE (one shadow ray per active lane)
        rays = rays + active.astype(rays.dtype)
        nee_contrib = _sample_direct_light(
            ds, cfg, p, n_sh, gn, mat, w_o, pos_sample, sel_sample, total_t
        )
        illum = jnp.where(
            active[..., None], illum + throughput * nee_contrib, illum
        )

        # glossy-only debug mode (shade_base_material.glsl:69-70)
        glossy_cut = (fp.glossy_only_mode != 0) & ~(
            (mat.roughness < 0.1) & (mat.ior != 1.0)
        )
        active = active & ~glossy_cut

        # ---- BSDF sample
        vx, vy = nee_mod.ortho_frame(n_sh)
        weight, w_i, spdf, mis_wpdf = sample_gltf_brdf(
            mat, n_sh, w_o, vx, vy, dir_sample, lobe_sample
        )
        valid_dir = _dot(w_i, n_sh) * _dot(w_i, gn) > 0.0
        terminate = (mis_wpdf == 0.0) | jnp.all(weight == 0.0, axis=-1) | ~valid_dir
        throughput = jnp.where(
            (active & ~terminate)[..., None], throughput * weight, throughput
        )
        prev_pdf = jnp.where(active & ~terminate, mis_wpdf, prev_pdf)
        active = active & ~terminate

        rd = jnp.where(active[..., None], w_i, rd)
        ro = jnp.where(active[..., None], p, ro)
        t_min = (jnp.linalg.norm(ro, axis=-1) + total_t) * RAY_EPSILON

        # ---- Russian roulette (pt_megakernel.glsl:713-730)
        rng_state, rr_sample = pointsets.draw1(
            cfg.rng_variant, ds.rng, rng_state, dim_base + 7
        )
        prefix = jnp.max(throughput, axis=-1)
        rr_prob = jnp.where(
            bounce_count > 6, jnp.minimum(0.95, prefix), jnp.minimum(1.0, prefix)
        )
        do_rr = active & (bounce_count >= fp.rr_path_depth)
        survive = rr_sample < rr_prob
        throughput = jnp.where(
            (do_rr & survive)[..., None],
            throughput / jnp.maximum(rr_prob, 1e-9)[..., None],
            throughput,
        )
        active = active & (~do_rr | survive)

        return _pack_carry(ro, rd, t_min, illum, throughput, active,
                           prev_pdf, bounce_count, total_t, rng_state, rays)

    def compact(carry, slot):
        """Wavefront queue compaction: stable-partition live rays to the
        queue front so terminated lanes form whole dead packets (which the
        packet traversal skips in one step). This is the stream compaction
        of the north-star wavefront design; a permutation, so per-ray
        results are bit-identical to the megakernel ordering."""
        active = carry[13]
        perm = jnp.argsort(~active, stable=True)
        carry = tuple(jax.tree.map(lambda a: a[perm], c) for c in carry)
        return carry, slot[perm]

    def bounce_body(i, carry_slot):
        carry, slot = carry_slot
        if cfg.wavefront:
            carry, slot = compact(carry, slot)

        def live_body(carry):
            carry, ctx = visit_hit(carry)
            if isinstance(i, int):
                # unrolled: final-bounce cut resolved in Python
                # (shade_base_material.glsl:56-57)
                if i < cfg.max_path_depth - 1:
                    carry = scatter_tail((carry, ctx, jnp.int32(i)))
            else:
                # dynamic loop: scalar predicate, real branch
                carry = jax.lax.cond(
                    i < cfg.max_path_depth - 1,
                    scatter_tail,
                    lambda args: args[0],
                    (carry, ctx, jnp.asarray(i, jnp.int32)),
                )
            return carry

        # whole-wave early out: once every lane is dead (RR/absorption/sky)
        # the remaining bounces are skipped in one scalar branch — the
        # fixed-shape analogue of the reference's per-thread loop break
        # (pt_megakernel.glsl:445-449)
        carry = jax.lax.cond(jnp.any(carry[13]), live_body, lambda c: c, carry)
        return carry, slot

    active0 = (
        jnp.ones((n,), bool) if lane_mask is None else jnp.asarray(lane_mask)
    )
    carry = _pack_carry(
        ro,
        rd,
        jnp.zeros((n,), jnp.float32),  # t_min
        jnp.zeros((n, 3), jnp.float32),  # illum
        jnp.ones((n, 3), jnp.float32),  # throughput
        active0,  # active (padded/invalid lanes start dead)
        jnp.full((n,), 2.0e16, jnp.float32),  # prev_pdf (shading_interface:21)
        jnp.zeros((n,), jnp.int32),  # bounce_count
        jnp.zeros((n,), jnp.float32),  # total_t
        rng_state,
        jnp.zeros((n,), jnp.int32),  # per-lane rays traced
    )
    slot0 = jnp.arange(n, dtype=jnp.int32)

    if cfg.unroll:
        cs = (carry, slot0)
        for i in range(cfg.max_path_depth):
            cs = bounce_body(i, cs)
        carry, slot = cs
    else:
        carry, slot = jax.lax.fori_loop(
            0, cfg.max_path_depth, bounce_body, (carry, slot0)
        )

    (_, _, _, illum, _, _, _, bounce_count, _, _, rays_traced) = _unpack_carry(carry)
    alpha = jnp.where(bounce_count == 0, 0.0, 1.0)
    if cfg.wavefront:
        # un-permute back to ray order
        inv = jnp.zeros((n,), jnp.int32).at[slot].set(jnp.arange(n, dtype=jnp.int32))
        illum = illum[inv]
        alpha = alpha[inv]
        rays_traced = rays_traced[inv]
    return illum, alpha, rays_traced


def camera_rays(view: ViewBuffers, px, py, dims, jitter):
    """Primary rays (pt_megakernel.glsl:315-323). px/py int arrays, jitter
    (...,2) in [0,1)."""
    point_x = (px.astype(jnp.float32) + 0.5 + (jitter[..., 0] - 0.5)) / dims[0]
    point_y = (py.astype(jnp.float32) + 0.5 + (jitter[..., 1] - 0.5)) / dims[1]
    rd = _normalize(
        point_x[..., None] * view.cam_du
        + point_y[..., None] * view.cam_dv
        + view.cam_dir_top_left
    )
    ro = jnp.broadcast_to(view.cam_pos, rd.shape)
    return ro, rd


def render_tile(
    ds: DeviceScene,
    cfg: IntegratorConfig,
    fp: FrameParams,
    view: ViewBuffers,
    width: int,
    height: int,
    spp: int,
    y0=0,
    tile_h: Optional[int] = None,
):
    """Render a horizontal tile: returns accum (tile_h, W, 4) = mean over the
    spp batch (radiance, alpha). ``y0`` may be a traced value — this is the
    unit of multi-chip work distribution (parallel/render_sharded.py), the
    TPU equivalent of the reference's SIMT dispatch grid
    (vulkan/setup_pixel_assignment.glsl)."""
    tile_h = tile_h if tile_h is not None else height

    # 16x16 pixel tiles -> 256-ray packets, the TPU analogue of the
    # reference's 32x16 workgroup + pixel swizzle
    # (vulkan/setup_pixel_assignment.glsl:18-25): packet-coherent primary
    # rays keep the shared-cursor traversal divergence low.
    ts = 16
    bw = -(-width // ts)
    bh = -(-tile_h // ts)
    n_rays = bw * bh * ts * ts
    # Precompute the swizzle tables on the host: leaving them as traced
    # arange-chains makes XLA constant-fold them element by element, which
    # dominates compile time at 1080p.
    idx = np.arange(n_rays)
    block = idx // (ts * ts)
    within = idx % (ts * ts)
    px_np = (block % bw) * ts + within % ts
    py_rel_np = (block // bw) * ts + within // ts
    valid_np = (px_np < width) & (py_rel_np < tile_h)
    px_np = np.minimum(px_np, width - 1)
    py_rel_np = np.minimum(py_rel_np, tile_h - 1)
    lin_np = np.where(valid_np, py_rel_np * width + px_np, tile_h * width)

    # Bound the in-flight ray count: all per-bounce intermediates (NEE bin
    # scoring is the worst at ~O(rays x bin_size) temporaries) scale with the
    # pass size, so large framebuffers run as sequential passes — the
    # analogue of the reference's bounded dispatch grid.
    chunk = min(n_rays, RAYS_PER_PASS)
    n_pad = n_rays + ((-n_rays) % chunk)
    num_chunks = n_pad // chunk

    def pad_to(arr, fill):
        if n_pad == n_rays:
            return arr
        return np.concatenate([arr, np.full(n_pad - n_rays, fill, arr.dtype)])

    px_np = pad_to(px_np.astype(np.int32), 0)
    py_rel_np = pad_to(py_rel_np.astype(np.int32), 0)
    valid_np = pad_to(valid_np, False)
    lin_np = pad_to(lin_np.astype(np.int32), tile_h * width)

    px_c = jnp.asarray(px_np.reshape(num_chunks, chunk))
    py_c = jnp.asarray(py_rel_np.reshape(num_chunks, chunk)) + y0
    valid_c = jnp.asarray(valid_np.reshape(num_chunks, chunk))
    dims = jnp.array([width, height], jnp.float32)

    # inverse swizzle (host-constant): pixel j's accumulator slot in the
    # swizzle-ordered buffer. Chunks accumulate CONTIGUOUSLY (one
    # dynamic_update_slice per pass — an in-place row-block write) and the
    # frame is unswizzled with a single constant-index gather at the end;
    # a per-chunk scatter-add into pixel order was the frame-time hotspot
    # on TPU (scatters serialize, gathers pipeline).
    inv_np = np.zeros(tile_h * width, np.int32)
    inv_np[lin_np[valid_np]] = np.nonzero(valid_np)[0].astype(np.int32)
    inv = jnp.asarray(inv_np)

    def one_pass(i, carry):
        acc_sw, rays = carry
        s = (i // num_chunks).astype(jnp.uint32)
        c = i % num_chunks
        px = px_c[c]
        py = py_c[c]
        valid = valid_c[c]
        sample_index = fp.sample_offset + s
        state = pointsets.make_state(
            cfg.rng_variant, sample_index, fp.shot_offset, px, py, width
        )
        state, jitter = pointsets.draw2(
            cfg.rng_variant, ds.rng, state, jnp.int32(0)
        )
        ro, rd = camera_rays(view, px, py, dims, jitter)
        rgb, alpha, nrays = trace_paths(ds, cfg, fp, ro, rd, state, lane_mask=valid)
        sample = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
        sample = jnp.where(valid[:, None], sample, 0.0)
        nrays = nrays.sum()
        start = c * chunk
        cur = jax.lax.dynamic_slice(acc_sw, (start, 0), (chunk, 4))
        acc_sw = jax.lax.dynamic_update_slice(acc_sw, cur + sample, (start, 0))
        return acc_sw, rays + nrays

    acc_sw = jnp.zeros((n_pad, 4), jnp.float32)
    rays0 = jnp.zeros((), jnp.int32)
    acc_sw, rays = jax.lax.fori_loop(0, spp * num_chunks, one_pass, (acc_sw, rays0))
    acc = acc_sw[inv]
    acc = acc / jnp.maximum(spp, 1).astype(jnp.float32)
    return acc.reshape(tile_h, width, 4), rays


# ---------------------------------------------------------------------------
# Host-driven frame loop (single-chip fast path)
# ---------------------------------------------------------------------------

_TABLE_CACHE: dict = {}


def _swizzle_tables(width: int, tile_h: int):
    """Device-resident swizzle tables for (width, tile_h), cached. Same
    16x16-tile traversal order as render_tile."""
    key = (width, tile_h)
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    ts = 16
    bw = -(-width // ts)
    bh = -(-tile_h // ts)
    n_rays = bw * bh * ts * ts
    idx = np.arange(n_rays)
    block = idx // (ts * ts)
    within = idx % (ts * ts)
    px_np = (block % bw) * ts + within % ts
    py_np = (block // bw) * ts + within // ts
    valid_np = (px_np < width) & (py_np < tile_h)
    px_np = np.minimum(px_np, width - 1).astype(np.int32)
    py_np = np.minimum(py_np, tile_h - 1).astype(np.int32)
    lin_np = np.where(valid_np, py_np * width + px_np, tile_h * width)
    chunk = min(n_rays, RAYS_PER_PASS)
    n_pad = n_rays + ((-n_rays) % chunk)
    nc = n_pad // chunk

    def pad(a, f):
        return (
            np.concatenate([a, np.full(n_pad - n_rays, f, a.dtype)])
            if n_pad > n_rays
            else a
        )

    px_np, py_np = pad(px_np, 0), pad(py_np, 0)
    valid_np, lin_np = pad(valid_np, False), pad(lin_np.astype(np.int32), 0)
    inv_np = np.zeros(tile_h * width, np.int32)
    inv_np[lin_np[valid_np]] = np.nonzero(valid_np)[0].astype(np.int32)
    out = (
        [jnp.asarray(px_np.reshape(nc, chunk)[c]) for c in range(nc)],
        [jnp.asarray(py_np.reshape(nc, chunk)[c]) for c in range(nc)],
        [jnp.asarray(valid_np.reshape(nc, chunk)[c]) for c in range(nc)],
        jnp.asarray(inv_np),
        nc,
        chunk,
    )
    _TABLE_CACHE[key] = out
    return out


def make_pass_fn(ds: DeviceScene, cfg: IntegratorConfig, width: int, height: int):
    """Build the jitted single-pass program for a scene.

    Two deliberate choices, both measured on v5e:
    - One pass = its own device program. XLA's layout assignment and
      scheduling degrade sharply when several integrator waves share one
      module (240ms -> 700ms per depth-9 wave; reductions and loop-carry
      updates got 5-50x slower), so the frame loop lives on the host and
      dispatches this well-tuned single-wave program per chunk.
    - The scene is CAPTURED, not passed: as a parameter the scene arrives
      in default layouts and the same program runs 3.2x slower (761ms vs
      240ms) — XLA only picks optimal gather-table/custom-call layouts
      for baked constants. Callers must rebuild on scene change (the
      renderer keys its cache on the scene revision)."""
    dims = jnp.array([width, height], jnp.float32)

    @partial(jax.jit, donate_argnames=("acc",))
    def pass_fn(fp, view, acc, px, py, valid, sample_index):
        state = pointsets.make_state(
            cfg.rng_variant, sample_index, fp.shot_offset, px, py, width
        )
        state, jitter = pointsets.draw2(
            cfg.rng_variant, ds.rng, state, jnp.int32(0)
        )
        ro, rd = camera_rays(view, px, py, dims, jitter)
        rgb, alpha, nrays = trace_paths(
            ds, cfg, fp, ro, rd, state, lane_mask=valid
        )
        sample = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
        sample = jnp.where(valid[:, None], sample, 0.0)
        return acc + sample, nrays.sum()

    return pass_fn


def make_ray_stats_fn(ds: DeviceScene, cfg: IntegratorConfig, width: int, height: int):
    """Per-pixel traced-ray-count pass — the REPORT_RAY_STATS image
    (render_vulkan.h:87-91, readback render_vulkan.cpp:321-331)."""
    dims = jnp.array([width, height], jnp.float32)

    @jax.jit
    def stats_fn(fp, view, px, py, valid, sample_index):
        state = pointsets.make_state(
            cfg.rng_variant, sample_index, fp.shot_offset, px, py, width
        )
        state, jitter = pointsets.draw2(
            cfg.rng_variant, ds.rng, state, jnp.int32(0)
        )
        ro, rd = camera_rays(view, px, py, dims, jitter)
        _, _, nrays = trace_paths(ds, cfg, fp, ro, rd, state, lane_mask=valid)
        return jnp.where(valid, nrays, 0)

    return stats_fn


def render_ray_stats_host(
    ds: DeviceScene,
    cfg: IntegratorConfig,
    fp: FrameParams,
    view: ViewBuffers,
    width: int,
    height: int,
    stats_fn=None,
):
    """One-sample ray-stats image (H, W) int32."""
    if stats_fn is None:
        stats_fn = make_ray_stats_fn(ds, cfg, width, height)
    px_c, py_c, valid_c, inv, nc, chunk = _swizzle_tables(width, height)
    counts = [
        stats_fn(fp, view, px_c[c], py_c[c], valid_c[c], fp.sample_offset)
        for c in range(nc)
    ]
    img = jnp.concatenate(counts)[inv].reshape(height, width)
    return img


@partial(jax.jit, static_argnames=("spp", "width", "tile_h"))
def _assemble_frame(chunks, rays, inv, spp: int, width: int, tile_h: int):
    acc = jnp.concatenate(chunks, axis=0)[inv]
    acc = acc / jnp.float32(max(spp, 1))
    return acc.reshape(tile_h, width, 4), jnp.stack(rays).sum()


def render_tile_host(
    ds: DeviceScene,
    cfg: IntegratorConfig,
    fp: FrameParams,
    view: ViewBuffers,
    width: int,
    height: int,
    spp: int,
    y0: int = 0,
    tile_h: Optional[int] = None,
    pass_fn=None,
):
    """Host-driven equivalent of render_tile: one async device dispatch per
    (sample, chunk) pass. Bit-identical results; ~3x faster frames than the
    single-module loop (see make_pass_fn). Host-side only — use render_tile
    under jit/shard_map. Callers rendering repeatedly should build
    ``pass_fn`` once via make_pass_fn and pass it in (rebuilding retraces)."""
    tile_h = tile_h if tile_h is not None else height
    if pass_fn is None:
        pass_fn = make_pass_fn(ds, cfg, width, height)
    px_c, py_c, valid_c, inv, nc, chunk = _swizzle_tables(width, tile_h)
    accs = [jnp.zeros((chunk, 4), jnp.float32) for _ in range(nc)]
    rays = []
    for s in range(spp):
        for c in range(nc):
            py = py_c[c] if y0 == 0 else py_c[c] + jnp.int32(y0)
            sample_index = fp.sample_offset + jnp.uint32(s)
            accs[c], nr = pass_fn(
                fp, view, accs[c], px_c[c], py, valid_c[c], sample_index
            )
            rays.append(nr)
    return _assemble_frame(accs, rays, inv, spp, width, tile_h)
