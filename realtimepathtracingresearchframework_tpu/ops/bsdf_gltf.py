"""GLTF layered BSDF (JAX, branchless).

Port of the reference's production BSDF
(``rendering/bsdfs/gltf_bsdf.glsl:294-659``): GLTF-2.0 metal/dielectric mix
- diffuse lobe ``(1-F)(1-metallic)(1-transmission) * base/pi``,
- GGX specular with Smith height-correlated visibility and VNDF sampling
  via spherical caps (Dupuy-Benyoub, gltf_bsdf.glsl:233-256),
- optional rough specular transmission with Schlick Fresnel fixed up at the
  critical angle (gltf_bsdf.glsl:288-292) and one-sided angle compression,
- luminance-weighted component sampler with sample reuse
  (gltf_bsdf.glsl:369-409) and the approximate MIS weight-pdf
  (``gltf_wpdf``, :414-497).

All control flow is mask-based (``jnp.where``) so each function is one
fixed-shape vector program over batched shading points — the TPU analogue
of the divergence-free intent of the reference's component-sampler design.

Material parameter struct mirrors GLTFMaterial (gltf_bsdf.glsl:15-34); all
fields are arrays broadcastable over the batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

M_1_PI = 1.0 / jnp.pi
MIN_ALPHA = 0.002


class GLTFMaterial(NamedTuple):
    base_color: jnp.ndarray  # (...,3)
    metallic: jnp.ndarray  # (...)
    specular: jnp.ndarray
    roughness: jnp.ndarray
    ior: jnp.ndarray
    specular_transmission: jnp.ndarray
    transmission_color: jnp.ndarray  # (...,3)
    onesided: jnp.ndarray  # bool


def _lum(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _reflect(i, n):
    """GLSL reflect(i, n) = i - 2*dot(n,i)*n."""
    return i - 2.0 * _dot(n, i)[..., None] * n


def _refract(i, n, eta):
    """GLSL refract; returns 0 on total internal reflection."""
    n_dot_i = _dot(n, i)
    k = 1.0 - eta * eta * (1.0 - n_dot_i * n_dot_i)
    tir = k < 0.0
    r = eta[..., None] * i - (eta * n_dot_i + jnp.sqrt(jnp.maximum(k, 0.0)))[
        ..., None
    ] * n
    return jnp.where(tir[..., None], 0.0, r), tir


def schlick_weight(c):
    x = jnp.clip(1.0 - c, 0.0, 1.0)
    x2 = x * x
    return x2 * x2 * x  # explicit multiplies: ** 5 can lower via exp/log


def gltf_schlick_weight(o_dot_h, ior):
    """Schlick with critical-angle fixup for ior < 1 (gltf_bsdf.glsl:288-292)."""
    f = schlick_weight(o_dot_h)
    cos_critical = jnp.sqrt(jnp.maximum(1.0 - ior * ior, 0.0))
    fix = jnp.minimum((1.0 - o_dot_h) / jnp.maximum(1.0 - cos_critical, 1e-9), 1.0)
    return jnp.where(ior < 1.0, f + (1.0 - f) * fix, f)


def gtr_2(cos_theta_h, alpha):
    a2 = alpha * alpha
    d = 1.0 + (a2 - 1.0) * cos_theta_h * cos_theta_h
    return M_1_PI * a2 / (d * d)


def smith_visibility_den1(n_dot_o, alpha_sq):
    return jnp.abs(n_dot_o) + jnp.sqrt(
        alpha_sq + (1.0 - alpha_sq) * n_dot_o * n_dot_o
    )


def smith_visibility_ggx(n_dot_o, n_dot_i, alpha_g):
    a = alpha_g * alpha_g
    return 1.0 / (smith_visibility_den1(n_dot_i, a) * smith_visibility_den1(n_dot_o, a))


def gtr_2_vndf_pdf(n_dot_o, cos_theta_h, alpha):
    return gtr_2(cos_theta_h, alpha) * (
        0.5 / smith_visibility_den1(n_dot_o, alpha * alpha)
    )


def to_pipe_sample(u):
    phi = 2.0 * jnp.pi * u[..., 0]
    return jnp.stack([jnp.cos(phi), jnp.sin(phi), u[..., 1]], axis=-1)


def sample_sphere(up):
    cos_t = up[..., 2] * 2.0 - 1.0
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return jnp.stack([sin_t * up[..., 0], sin_t * up[..., 1], cos_t], axis=-1)


def sample_gtr_2_vndf(w_o_local, alpha, up):
    """Spherical-caps VNDF sampling (gltf_bsdf.glsl:233-256)."""
    wi_std = jnp.stack(
        [alpha * w_o_local[..., 0], alpha * w_o_local[..., 1], w_o_local[..., 2]],
        axis=-1,
    )
    wi_std = wi_std / jnp.linalg.norm(wi_std, axis=-1, keepdims=True)
    z = (1.0 - up[..., 2]) * (1.0 + wi_std[..., 2]) - wi_std[..., 2]
    sin_t = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    wm_std = (
        jnp.stack([sin_t * up[..., 0], sin_t * up[..., 1], z], axis=-1) + wi_std
    )
    wm = jnp.stack(
        [
            wm_std[..., 0] * alpha,
            wm_std[..., 1] * alpha,
            jnp.maximum(wm_std[..., 2], 0.0),
        ],
        axis=-1,
    )
    return wm / jnp.maximum(jnp.linalg.norm(wm, axis=-1, keepdims=True), 1e-20)


def gltf_diffuse_basecolor(mat: GLTFMaterial):
    return (1.0 - mat.metallic)[..., None] * mat.base_color


def gltf_specular_basecolor(mat: GLTFMaterial, ior):
    d = ((ior - 1.0) / (ior + 1.0)) ** 2
    return (
        d[..., None] * (1.0 - mat.metallic)[..., None]
        + mat.base_color * mat.metallic[..., None]
    )


def gltf_specular_alpha(mat: GLTFMaterial):
    return jnp.maximum(mat.roughness * mat.roughness, MIN_ALPHA)


def cos_half_angle(cos_angle):
    return (1.0 + cos_angle) / jnp.sqrt(jnp.maximum(2.0 + 2.0 * cos_angle, 1e-12))


def _half_vector(mat, n, w_o, w_i, i_dot_n, o_dot_n, ior):
    """w_h construction incl. transmission cases (gltf_bsdf.glsl:296-320).
    Returns (w_h, valid)."""
    transmit = i_dot_n * o_dot_n < 0.0
    w_h_refl = w_i + w_o
    w_h_trans_onesided = -ior[..., None] * w_i - w_o
    w_h_trans_twosided = _reflect(w_i, n) + w_o
    w_h_trans = jnp.where(
        mat.onesided[..., None], w_h_trans_onesided, w_h_trans_twosided
    )
    w_h = jnp.where(transmit[..., None], w_h_trans, w_h_refl)
    norm = jnp.linalg.norm(w_h, axis=-1, keepdims=True)
    w_h = w_h / jnp.maximum(norm, 1e-20)
    valid = jnp.where(
        transmit,
        (mat.specular_transmission > 0.0) & (_dot(w_h, n) > 0.0),
        jnp.ones_like(transmit),
    )
    return w_h, valid, transmit


def gltf_bsdf(mat: GLTFMaterial, n, w_o, w_i):
    """Full BSDF value (gltf_bsdf.glsl:294-391)."""
    i_dot_n = _dot(n, w_i)
    o_dot_n = _dot(n, w_o)
    ior = jnp.where(o_dot_n < 0.0, 1.0 / mat.ior, mat.ior)

    w_h, valid, transmit = _half_vector(mat, n, w_o, w_i, i_dot_n, o_dot_n, ior)
    o_dot_h = _dot(w_o, w_h)
    i_dot_h = _dot(w_i, w_h)

    diffuse = gltf_diffuse_basecolor(mat) * M_1_PI

    f0 = gltf_specular_basecolor(mat, mat.ior)
    alpha = gltf_specular_alpha(mat)
    spec_refl = gtr_2(_dot(n, w_h), alpha) * smith_visibility_ggx(
        o_dot_n, i_dot_n, alpha
    )
    f_weight = gltf_schlick_weight(jnp.abs(o_dot_h), ior)
    F = f0 + (1.0 - f0) * f_weight[..., None]

    # reflection side
    diffuse_refl = (
        diffuse * (1.0 - mat.specular_transmission)[..., None] * (1.0 - F)
    )
    spec_side_refl = spec_refl[..., None] * F

    # transmission side
    compression = 2.0 * o_dot_h / (i_dot_h * ior + o_dot_h)
    comp2 = jnp.where(mat.onesided, compression * compression, 1.0)
    spec_side_trans = (
        spec_refl
        * (1.0 - mat.metallic)
        * mat.specular_transmission
        * comp2
    )[..., None] * (mat.transmission_color * (1.0 - F))

    has_specular = mat.ior > 1.0
    refl_val = jnp.where(
        has_specular[..., None], diffuse_refl + spec_side_refl, diffuse
    )
    trans_val = jnp.where(has_specular[..., None], spec_side_trans, 0.0)
    out = jnp.where(transmit[..., None], trans_val, refl_val)
    return jnp.where(valid[..., None], out, 0.0)


def _component_weights(mat, ior, o_dot_h3, vis3):
    """Luminance-weighted component sampler (gltf_bsdf.glsl:369-395).
    o_dot_h3/vis3: (..., 3) for [diffuse, specular, transmission].
    Returns weights (..., 3) normalized."""
    spec_lum = _lum(gltf_specular_basecolor(mat, mat.ior))
    f0 = spec_lum + (1.0 - spec_lum) * gltf_schlick_weight(
        o_dot_h3[..., 0], jnp.ones_like(ior)
    )
    f1 = spec_lum + (1.0 - spec_lum) * gltf_schlick_weight(
        o_dot_h3[..., 1], jnp.ones_like(ior)
    )
    f2 = spec_lum + (1.0 - spec_lum) * gltf_schlick_weight(o_dot_h3[..., 2], ior)

    diff_lum = _lum(gltf_diffuse_basecolor(mat))
    w0 = (
        (1.0 - f0)
        * vis3[..., 0]
        * (1.0 - mat.metallic)
        * diff_lum
        * (1.0 - mat.specular_transmission)
    )
    w1 = f1 * vis3[..., 1]
    w2 = (1.0 - f2) * vis3[..., 2] * (1.0 - mat.metallic) * mat.specular_transmission
    w = jnp.stack([w0, w1, w2], axis=-1)
    total = jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(total > 0.0, w / jnp.maximum(total, 1e-30), 0.0)
    w = w.at[..., 0].set(jnp.where(total[..., 0] > 0.0, w[..., 0], 1.0))
    return w


def gltf_wpdf(mat: GLTFMaterial, n, w_o, w_i):
    """Approximate MIS weight-pdf (gltf_wpdf, gltf_bsdf.glsl:414-497)."""
    i_dot_n = _dot(n, w_i)
    o_dot_n = _dot(n, w_o)
    ior = jnp.where(o_dot_n < 0.0, 1.0 / mat.ior, mat.ior)

    diffuse_pdf = M_1_PI * jnp.abs(i_dot_n)

    w_h, valid, transmit = _half_vector(mat, n, w_o, w_i, i_dot_n, o_dot_n, ior)
    o_dot_h = _dot(w_o, w_h)
    i_dot_h = _dot(w_i, w_h)
    cos_theta_h = _dot(w_h, n)

    alpha = gltf_specular_alpha(mat)
    vis_spec = 2.0 * jnp.abs(i_dot_n) / smith_visibility_den1(i_dot_n, alpha * alpha)
    vis3 = jnp.stack([jnp.ones_like(vis_spec), vis_spec, vis_spec], axis=-1)
    odh3 = jnp.abs(o_dot_h)[..., None] * jnp.ones((3,), o_dot_h.dtype)
    w = _component_weights(mat, ior, odh3, vis3)

    specular = gtr_2_vndf_pdf(o_dot_n, cos_theta_h, alpha)
    compression = 2.0 * o_dot_h / (i_dot_h * ior + o_dot_h)
    comp2 = jnp.where(mat.onesided, compression * compression, 1.0)

    pdf_refl = diffuse_pdf * w[..., 0] + specular * w[..., 1]
    pdf_trans = specular * comp2 * w[..., 2]
    pdf = jnp.where(transmit, pdf_trans, pdf_refl)
    pdf = jnp.where(mat.ior > 1.0, pdf, diffuse_pdf)
    return jnp.where(valid, pdf, 0.0)


def sample_gltf_brdf(mat: GLTFMaterial, n, w_o, v_x, v_y, dir_sample, lobe_sample):
    """Sample the BSDF (sample_gltf_brdf, gltf_bsdf.glsl:500-652).

    Returns (weight = f*|cos|/pdf (...,3), w_i (...,3), pdf, mis_wpdf).
    pdf==0 marks invalid samples.
    """
    # local frame
    w_o_local = jnp.stack(
        [_dot(w_o, v_x), _dot(w_o, v_y), _dot(w_o, n)], axis=-1
    )
    o_dot_n = w_o_local[..., 2]
    ior = jnp.where(o_dot_n < 0.0, 1.0 / mat.ior, mat.ior)
    # flip into upper hemisphere for sampling
    w_o_up = w_o_local.at[..., 2].set(jnp.abs(o_dot_n))

    up = to_pipe_sample(dir_sample)
    w_i_diffuse = n + sample_sphere(up)
    w_i_diffuse = w_i_diffuse / jnp.maximum(
        jnp.linalg.norm(w_i_diffuse, axis=-1, keepdims=True), 1e-20
    )
    w_i_diffuse = jnp.where((o_dot_n < 0.0)[..., None], -w_i_diffuse, w_i_diffuse)

    alpha = gltf_specular_alpha(mat)

    # candidate half vectors + visibilities for component weighting
    w_h_spec_local = sample_gtr_2_vndf(w_o_up, alpha, up)
    odh_diffuse = cos_half_angle(_dot(w_o, w_i_diffuse))
    odh_spec = _dot(w_o_up, w_h_spec_local)
    spec_i_dot_n = _reflect(-w_o_up, w_h_spec_local)[..., 2]
    vis_spec = jnp.where(
        spec_i_dot_n > 0.0,
        2.0 * spec_i_dot_n / smith_visibility_den1(spec_i_dot_n, alpha * alpha),
        0.0,
    )
    # transmission candidate (shares the specular half vector; no separate
    # transmission roughness here, GLTF_SUPPORT_TRANSMISSION_ROUGHNESS off)
    refr, _tir = _refract(-w_o_up, w_h_spec_local, 1.0 / ior)
    trans_i_dot_n = jnp.where(
        mat.onesided, -refr[..., 2], _reflect(-w_o_up, w_h_spec_local)[..., 2]
    )
    vis_trans = jnp.where(
        (trans_i_dot_n > 0.0) & (mat.specular_transmission > 0.0),
        2.0 * trans_i_dot_n / smith_visibility_den1(trans_i_dot_n, alpha * alpha),
        0.0,
    )

    odh3 = jnp.stack([odh_diffuse, odh_spec, odh_spec], axis=-1)
    vis3 = jnp.stack([jnp.ones_like(vis_spec), vis_spec, vis_trans], axis=-1)
    weights = _component_weights(mat, ior, odh3, vis3)
    # materials without a specular layer (ior <= 1) always take diffuse
    weights = jnp.where(
        (mat.ior > 1.0)[..., None],
        weights,
        jnp.stack([jnp.ones_like(vis_spec), jnp.zeros_like(vis_spec), jnp.zeros_like(vis_spec)], -1),
    )

    # CDF component selection (sample reuse not needed: dims are per-use)
    cdf1 = weights[..., 0]
    cdf2 = cdf1 + weights[..., 1]
    r = lobe_sample[..., 0]
    component = jnp.where(r < cdf1, 0, jnp.where(r < cdf2, 1, 2))
    # guard: component must have nonzero weight (arithmetic select — a
    # take_along_axis gather stages its index vector through scalar
    # memory at ~3.7ms per 262K lanes)
    wsel = jnp.where(
        component == 0,
        weights[..., 0],
        jnp.where(component == 1, weights[..., 1], weights[..., 2]),
    )

    # build w_i per component
    w_h_local_signed = w_h_spec_local.at[..., 2].multiply(
        jnp.where(o_dot_n < 0.0, -1.0, 1.0)
    )
    cos_theta_h_spec = w_h_local_signed[..., 2]
    w_h_world = (
        w_h_local_signed[..., 0:1] * v_x
        + w_h_local_signed[..., 1:2] * v_y
        + w_h_local_signed[..., 2:3] * n
    )
    w_i_spec = _reflect(-w_o, w_h_world)
    refr_w, _ = _refract(-w_o, w_h_world, 1.0 / ior)
    w_i_trans = jnp.where(
        mat.onesided[..., None],
        refr_w,
        _reflect(_reflect(-w_o, w_h_world), n),
    )

    w_i = jnp.where(
        (component == 0)[..., None],
        w_i_diffuse,
        jnp.where((component == 1)[..., None], w_i_spec, w_i_trans),
    )

    i_dot_n = _dot(n, w_i)
    # sign consistency (gltf_bsdf.glsl:617-623)
    ok = jnp.where(
        component == 2, i_dot_n * o_dot_n < 0.0, i_dot_n * o_dot_n > 0.0
    )
    ok = ok & (wsel > 0.0)

    # sampling pdf (gltf_bsdf.glsl:626-648)
    w_h_sel = jnp.where(
        (component == 0)[..., None],
        (w_i + w_o)
        / jnp.maximum(jnp.linalg.norm(w_i + w_o, axis=-1, keepdims=True), 1e-20),
        w_h_world,
    )
    o_dot_h = _dot(w_o, w_h_sel)
    i_dot_h = jnp.where(
        (component == 2) & mat.onesided, _dot(w_i, w_h_sel), o_dot_h
    )
    cos_theta_h = jnp.where(
        component == 0, _dot(n, w_h_sel), cos_theta_h_spec
    )

    diffuse_pdf = M_1_PI * jnp.abs(i_dot_n)
    specular = gtr_2_vndf_pdf(o_dot_n, cos_theta_h, alpha)
    compression = 2.0 * o_dot_h / (i_dot_h * ior + o_dot_h)
    comp2 = jnp.where(mat.onesided, compression * compression, 1.0)
    pdf_refl = diffuse_pdf * weights[..., 0] + specular * weights[..., 1]
    pdf_trans = specular * comp2 * weights[..., 2]
    pdf = jnp.where(component == 2, pdf_trans, pdf_refl)
    pdf = jnp.where(mat.ior > 1.0, pdf, diffuse_pdf)
    pdf = jnp.where(ok & (pdf > 0.0), pdf, 0.0)

    f = gltf_bsdf(mat, n, w_o, w_i)
    mis_wpdf = gltf_wpdf(mat, n, w_o, w_i)
    weight = jnp.where(
        (pdf > 0.0)[..., None],
        f * (jnp.abs(i_dot_n) / jnp.maximum(pdf, 1e-30))[..., None],
        0.0,
    )
    mis_wpdf = jnp.where(pdf > 0.0, mis_wpdf, 0.0)
    return weight, w_i, pdf, mis_wpdf


def material_from_table(table, mid):
    """Gather a GLTFMaterial batch from a MaterialTable pytree of device
    arrays by material id (the unpack_material analogue)."""
    from realtimepathtracingresearchframework_tpu.models.material import (
        BASE_MATERIAL_ONESIDED,
    )

    return GLTFMaterial(
        base_color=table.base_color[mid],
        metallic=table.metallic[mid],
        specular=table.specular[mid],
        roughness=table.roughness[mid],
        ior=table.ior[mid],
        specular_transmission=table.specular_transmission[mid],
        transmission_color=table.base_color[mid],  # load_material: = base_color
        onesided=(table.flags[mid] & BASE_MATERIAL_ONESIDED) != 0,
    )
