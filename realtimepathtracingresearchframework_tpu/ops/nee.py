"""Next-event estimation: light sampling + MIS.

Port of the reference NEE stack:
- solid-angle triangle sampling via Householder + Van Oosterom-Strackee
  (rendering/lights/tri.glsl:66-155),
- binned RIS tri-light selection: uniform bin pick, luminance x solid-angle
  scoring of the <=16 lights in the bin, CDF select
  (rendering/mc/lights_linear.glsl:30-127),
- sun spherical-cap sampling (rendering/lights/sun.glsl,
  mc/lights_sun.glsl:8-22),
- sun-vs-area selection by ``sun_radiance.w`` + balance-heuristic MIS
  (rendering/mc/nee.glsl:32-90, nee_interface.glsl:11-15,46-58).

Everything is batched jnp; light tables are padded to a bin multiple so all
loops are fixed-width.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from realtimepathtracingresearchframework_tpu.ops.smallgather import select_rows

BIN_MAX_SIZE = 16  # BINNED_LIGHTS_BIN_MAX_SIZE (render_params.glsl.h:18)
MIN_IRRADIANCE = 6.2e-4 * 0.001  # lights_linear.glsl:40


class TriLightBuffers(NamedTuple):
    v0: jnp.ndarray  # (L,3)
    v1: jnp.ndarray
    v2: jnp.ndarray
    radiance: jnp.ndarray  # (L,3)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def _lum(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def ortho_frame(n):
    """(v_x, v_y) completing n to a right-handed frame (util.glsl:73-93)."""
    vy = jnp.where(
        (jnp.abs(n[..., 0:1]) < 0.6),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
        jnp.where(
            jnp.abs(n[..., 1:2]) < 0.6,
            jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), n.shape),
            jnp.where(
                jnp.abs(n[..., 2:3]) < 0.6,
                jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
                jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
            ),
        ),
    )
    vx = _normalize(jnp.cross(vy, n))
    vy = _normalize(jnp.cross(n, vx))
    return vx, vy


# ---------------------------------------------------------------------------
# Triangle solid angle (tri.glsl:66-155)
# ---------------------------------------------------------------------------


def half_triangle_solid_angle_tan(v0, v1, v2):
    """Returns (tangent, params (...,3)). v* must be unit directions."""
    householder_sign = jnp.where(v0[..., 0] > 0.0, -1.0, 1.0)
    hh_yz = v0[..., 1:3] / (jnp.abs(v0[..., 0:1]) + 1.0)
    dot_0_1 = _dot(v0, v1)
    dot_0_2 = _dot(v1, v2)
    dot_1_2 = _dot(v0, v2)
    dot_h0 = -householder_sign * v1[..., 0] + dot_0_1
    dot_h2 = -householder_sign * v2[..., 0] + dot_1_2
    col0 = -dot_h0[..., None] * hh_yz + v1[..., 1:3]
    col1 = -dot_h2[..., None] * hh_yz + v2[..., 1:3]
    simplex_volume = jnp.abs(col0[..., 0] * col1[..., 1] - col0[..., 1] * col1[..., 0])
    dot_0_2_plus_1_2 = dot_0_2 + dot_1_2
    one_plus_dot_0_1 = 1.0 + dot_0_1
    tangent = simplex_volume / (one_plus_dot_0_1 + dot_0_2_plus_1_2)
    params = jnp.stack([simplex_volume, dot_0_2_plus_1_2, one_plus_dot_0_1], axis=-1)
    return tangent, params


def _positive_atan(t):
    a = jnp.arctan(t)
    return jnp.where(a >= 0.0, a, a + jnp.pi)


def triangle_solid_angle(v0, v1, v2):
    tangent, params = half_triangle_solid_angle_tan(v0, v1, v2)
    return 2.0 * _positive_atan(tangent), params


def sample_solid_angle_polygon(v0, v1, v2, solid_angle, params, u):
    """Peters' clipped-arc sampling (tri.glsl:132-155). v* unit dirs."""
    target = solid_angle * u[..., 0]
    cs = jnp.cos(0.5 * target)
    sn = jnp.sin(0.5 * target)
    # vertices[3] = {v1, v0, v2}
    offset = v1 * (params[..., 0] * cs - params[..., 1] * sn)[..., None] + v2 * (
        params[..., 2] * sn
    )[..., None]
    d = _dot(v1, offset) / jnp.maximum(_dot(offset, offset), 1e-30)
    new_v2 = 2.0 * d[..., None] * offset - v1
    s2 = _dot(v0, new_v2)
    s = 1.0 + (s2 - 1.0) * u[..., 1]
    denominator = 1.0 - s2 * s2
    t_normed = jnp.sqrt(
        jnp.maximum(1.0 - s * s, 0.0) / jnp.maximum(denominator, 1e-30)
    )
    t_normed = jnp.where(denominator > 0.0, t_normed, u[..., 1])
    return (s - t_normed * s2)[..., None] * v0 + t_normed[..., None] * new_v2


def is_tri_facing_forward(v0, v1, v2):
    return _dot(jnp.cross(v0, v1), v2) < 0.0


def approx_triangle_solid_angle(v0, v1, v2):
    tangent, _ = half_triangle_solid_angle_tan(v0, v1, v2)
    return 2.0 * _positive_atan(tangent)


# ---------------------------------------------------------------------------
# Binned RIS tri-light sampling (lights_linear.glsl:20-127)
# ---------------------------------------------------------------------------


class LightSample(NamedTuple):
    illum: jnp.ndarray  # (...,3) radiance / pdf
    dir: jnp.ndarray  # (...,3)
    dist: jnp.ndarray
    pdf: jnp.ndarray
    mis_wpdf: jnp.ndarray


def sample_tri_lights(
    lights: TriLightBuffers,
    hit_p,
    hit_n,
    dir_sample,
    sel_sample,
    bin_size: int,
    use_bins: bool,
):
    """Batched tri-light sample. Light table length must be a multiple of
    ``bin_size`` when use_bins (padded with zero-radiance lights)."""
    num_lights = lights.v0.shape[0]

    if use_bins:
        num_bins = num_lights // bin_size
        sx = sel_sample[..., 0] * num_bins
        bin_id = jnp.minimum(sx.astype(jnp.int32), num_bins - 1)
        sel_p = 1.0 / num_bins
        # score all lights in the bin (fixed width)
        if num_bins == 1:
            # single bin: broadcast the tiny light table instead of (N,16)
            # gathers — gathers are the costly primitive on TPU
            lid = jnp.broadcast_to(
                jnp.arange(bin_size), hit_p.shape[:-1] + (bin_size,)
            )
            lv0 = lights.v0[None, :, :] - hit_p[..., None, :]
            lv1 = lights.v1[None, :, :] - hit_p[..., None, :]
            lv2 = lights.v2[None, :, :] - hit_p[..., None, :]
        else:
            lid = bin_id[..., None] * bin_size + jnp.arange(bin_size)  # (...,B)
            lv0 = lights.v0[lid] - hit_p[..., None, :]
            lv1 = lights.v1[lid] - hit_p[..., None, :]
            lv2 = lights.v2[lid] - hit_p[..., None, :]
        front = is_tri_facing_forward(lv0, lv1, lv2)
        above = (
            (_dot(lv0, hit_n[..., None, :]) > 0.0)
            | (_dot(lv1, hit_n[..., None, :]) > 0.0)
            | (_dot(lv2, hit_n[..., None, :]) > 0.0)
        )
        contrib = (
            _lum(lights.radiance)[None, :]
            if num_bins == 1
            else _lum(lights.radiance[lid])
        )
        sa = approx_triangle_solid_angle(
            _normalize(lv0), _normalize(lv1), _normalize(lv2)
        )
        contrib = jnp.where(above & front, contrib * sa, 0.0) + MIN_IRRADIANCE
        total = jnp.sum(contrib, axis=-1, keepdims=True)
        p = contrib / total
        cdf = jnp.cumsum(p, axis=-1)
        sy = sel_sample[..., 1]
        k = jnp.sum((sy[..., None] >= cdf).astype(jnp.int32), axis=-1)
        k = jnp.minimum(k, bin_size - 1)
        pk = jnp.take_along_axis(p, k[..., None], axis=-1)[..., 0]
        light_id = bin_id * bin_size + k
        sel_p = sel_p * pk
        mis_den = jnp.float32(num_bins)
    else:
        sx = sel_sample[..., 0] * num_lights
        light_id = jnp.minimum(sx.astype(jnp.int32), num_lights - 1)
        sel_p = jnp.full(light_id.shape, 1.0 / num_lights)
        mis_den = jnp.float32(num_lights)

    lv0 = select_rows(lights.v0, light_id)
    lv1 = select_rows(lights.v1, light_id)
    lv2 = select_rows(lights.v2, light_id)
    radiance = select_rows(lights.radiance, light_id)

    d0 = _normalize(lv0 - hit_p)
    d1 = _normalize(lv1 - hit_p)
    d2 = _normalize(lv2 - hit_p)
    sa, params = triangle_solid_angle(d0, d1, d2)
    light_dir = sample_solid_angle_polygon(d0, d1, d2, sa, params, dir_sample)
    pdf = 1.0 / jnp.maximum(sa, 1e-12)

    e0 = lv1 - lv0
    e1 = lv2 - lv0
    e_n = jnp.cross(e0, e1)
    denom = _dot(light_dir, e_n)
    light_dist = _dot(lv0 - hit_p, e_n) / jnp.where(
        jnp.abs(denom) > 1e-20, denom, 1e-20
    )
    mis_wpdf = 2.0 * light_dist * light_dist / jnp.maximum(jnp.abs(denom), 1e-20)

    pdf = pdf * sel_p
    mis_wpdf = mis_wpdf / mis_den
    illum = radiance / jnp.maximum(pdf, 1e-30)[..., None]
    # degenerate (zero-area or zero-radiance padding) -> no contribution
    bad = (sa <= 1e-12) | ~(light_dist > 0.0)
    return LightSample(
        illum=jnp.where(bad[..., None], 0.0, illum),
        dir=light_dir,
        dist=jnp.where(bad, 2.0e16, light_dist),
        pdf=jnp.where(bad, 0.0, pdf),
        mis_wpdf=jnp.where(bad, 0.0, mis_wpdf),
    )


def approx_tri_lights_pdf(approx_solid_angle, num_lights, num_bins, use_bins):
    """(lights_linear.glsl:129-137)"""
    n = num_bins if use_bins else num_lights
    return 1.0 / (n * jnp.maximum(approx_solid_angle, 1e-12))


# ---------------------------------------------------------------------------
# Sun (sun.glsl + mc/lights_sun.glsl)
# ---------------------------------------------------------------------------


def sample_sun_dir(sun_dir, cos_radius, u):
    phi = 2.0 * jnp.pi * u[..., 0]
    cos_t = 1.0 + (cos_radius - 1.0) * u[..., 1]
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    vx, vy = ortho_frame(sun_dir)
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    return (
        local[..., 0:1] * vx + local[..., 1:2] * vy + local[..., 2:3] * sun_dir
    )


def sun_dir_pdf(cos_radius):
    return 1.0 / (2.0 * jnp.pi * (1.0 - cos_radius))


def nee_mis_heuristic(n_f, pdf_f, n_g, pdf_g):
    """Balance heuristic (nee_interface.glsl:11-15)."""
    f = n_f * pdf_f
    g = n_g * pdf_g
    return f / jnp.maximum(f + g, 1e-30)
