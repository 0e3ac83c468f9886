"""Texture atlas + textured material rendering tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from realtimepathtracingresearchframework_tpu.backend.params import RenderParams
from realtimepathtracingresearchframework_tpu.backend.renderer import (
    FrameConfig,
    Renderer,
)
from realtimepathtracingresearchframework_tpu.models import procedural, vkr
from realtimepathtracingresearchframework_tpu.models.camera import OrientedCamera
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.models.texture import Texture, build_mip_chain
from realtimepathtracingresearchframework_tpu.ops import texture_atlas


def _checker(n=16, c0=(255, 0, 0, 255), c1=(0, 0, 255, 255)):
    img = np.zeros((n, n, 4), np.uint8)
    yy, xx = np.mgrid[0:n, 0:n]
    mask = ((xx // 4 + yy // 4) % 2).astype(bool)
    img[mask] = c0
    img[~mask] = c1
    return img


def test_atlas_roundtrip_sampling():
    img = _checker()
    tex = Texture(16, 16, 37, mips=build_mip_chain(img), srgb=False)
    atlas = texture_atlas.build_atlas([tex])
    # texel centers reproduce exact colors at mip 0
    uv = jnp.array([[2.5 / 16, 2.5 / 16], [6.5 / 16, 2.5 / 16]])
    tid = jnp.array([0, 0])
    out = np.asarray(texture_atlas.sample_atlas(atlas, tid, uv, jnp.zeros(2)))
    # checker phase: block (0,0) even -> c1 blue, block (1,0) odd -> c0 red
    np.testing.assert_allclose(out[0], [0, 0, 1, 1], atol=1e-3)
    np.testing.assert_allclose(out[1], [1, 0, 0, 1], atol=1e-3)
    # coarsest mip is the average
    out = np.asarray(
        texture_atlas.sample_atlas(atlas, tid, uv, jnp.full(2, 10.0))
    )
    np.testing.assert_allclose(out[0][:3], [0.5, 0.0, 0.5], atol=0.02)


def test_atlas_srgb_decode():
    img = np.full((4, 4, 4), 128, np.uint8)
    tex_lin = Texture(4, 4, 37, mips=[img], srgb=False)
    tex_srgb = Texture(4, 4, 37, mips=[img], srgb=True)
    atlas = texture_atlas.build_atlas([tex_lin, tex_srgb])
    uv = jnp.array([[0.5, 0.5], [0.5, 0.5]])
    out = np.asarray(
        texture_atlas.sample_atlas(atlas, jnp.array([0, 1]), uv, jnp.zeros(2))
    )
    assert out[0, 0] == pytest.approx(128 / 255, abs=1e-3)
    assert out[1, 0] == pytest.approx(((128 / 255 + 0.055) / 1.055) ** 2.4, abs=1e-3)


def test_textured_floor_renders(tmp_path):
    """A checkered emitter-lit floor must show texture variation."""
    scene_v = procedural.cornell_box()
    # attach a checker texture to the White material
    scene_v.materials[0].tex_base_color = Texture(
        16, 16, 37, mips=build_mip_chain(_checker()), srgb=False
    )
    scene = Scene.from_vkr_scene(scene_v)
    assert scene.total_texture_bytes > 0

    r = Renderer()
    r.initialize(32, 32)
    r.set_scene(scene)
    assert r._has_textures
    cam = OrientedCamera.look_at([0, 1.4, 3.0], [0, 0.2, 0.0], fovy=60)
    r.render(FrameConfig(camera=cam, params=RenderParams(batch_spp=8, max_path_depth=2)))
    img = r.readback_accumulation()
    assert np.isfinite(img).all()
    # texture creates strong red/blue channel variation on the floor
    rb_diff = np.abs(img[..., 0] - img[..., 2])
    assert rb_diff.max() > 0.05


def test_aniso_sampler_matches_manual_taps():
    """sample_atlas_aniso = mean of `taps` bilinear samples along the
    major footprint axis at the minor-axis mip (textureGrad analogue,
    rt/material_textures.glsl)."""
    img = _checker()
    tex = Texture(16, 16, 37, mips=build_mip_chain(img), srgb=False)
    atlas = texture_atlas.build_atlas([tex])
    uv = jnp.array([[0.4, 0.3]])
    tid = jnp.array([0])
    # footprint: long along u (8 texels), short along v (1 texel)
    duvdx = jnp.array([[8.0 / 16.0, 0.0]])
    duvdy = jnp.array([[0.0, 1.0 / 16.0]])
    taps = 4
    got = np.asarray(
        texture_atlas.sample_atlas_aniso(atlas, tid, uv, duvdx, duvdy, taps)
    )[0]
    # manual: minor = 1 texel -> mip 0; taps along u
    acc = np.zeros(4)
    for i in range(taps):
        s = (i + 0.5) / taps - 0.5
        p = texture_atlas.sample_atlas(
            atlas, tid, uv + jnp.array([[8.0 / 16.0 * s, 0.0]]),
            jnp.zeros(1),
        )
        acc += np.asarray(p)[0]
    np.testing.assert_allclose(got, acc / taps, atol=1e-6)

    # extreme anisotropy clamps: ratio 16/0 -> mip = log2(major/taps)
    duvdx = jnp.array([[16.0 / 16.0 * 16, 0.0]])  # 256 texels
    duvdy = jnp.array([[0.0, 0.0]])
    got = np.asarray(
        texture_atlas.sample_atlas_aniso(atlas, tid, uv, duvdx, duvdy, taps)
    )[0]
    assert np.isfinite(got).all()


@pytest.mark.slow
def test_aniso_render_valid_and_close_to_iso(tmp_path):
    """Renderer-level anisotropic filtering (options.aniso_taps): the
    frame stays finite and close to the isotropic render in overall
    energy (filtering changes per-texel sharpness, not brightness)."""
    scene_v = procedural.cornell_box()
    scene_v.materials[0].tex_base_color = Texture(
        16, 16, 37, mips=build_mip_chain(_checker()), srgb=False
    )
    scene = Scene.from_vkr_scene(scene_v)

    def render(taps):
        r = Renderer()
        r.options = r.options.replace(aniso_taps=taps)
        r.initialize(48, 36)
        r.set_scene(scene)
        cfg = FrameConfig(
            # grazing view down the floor
            camera=OrientedCamera.look_at(
                [0.0, 0.25, 2.9], [0.0, 0.05, -2.0], fovy=55
            ),
            params=RenderParams(batch_spp=4, max_path_depth=2),
        )
        r.render(cfg)
        assert r._integrator_config(cfg.params).aniso_taps == taps
        return np.asarray(r.accum)[..., :3]

    iso = render(0)
    aniso = render(4)
    assert np.isfinite(aniso).all()
    # same light transport, different filtering: mean energy close,
    # images not identical (the filter actually engaged)
    np.testing.assert_allclose(aniso.mean(), iso.mean(), rtol=0.1)
    assert np.abs(aniso - iso).max() > 1e-4


def test_tangent_handedness_matches_reference_convention():
    """scene._uv_mapping_attrs handedness == sign of the reference's
    bitangent_l (rt/hit.glsl:98-118) for random triangles — a flipped
    sign inverts every normal map's green channel."""
    from realtimepathtracingresearchframework_tpu.models.scene import (
        FlatScene,
        _uv_mapping_attrs,
    )

    rng = np.random.default_rng(3)
    n = 256
    v = rng.normal(size=(n, 3, 3)).astype(np.float32)
    uv = rng.normal(size=(n, 3, 2)).astype(np.float32)
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    z3 = np.zeros((n, 3), np.float32)
    flat = FlatScene(
        v0=v[:, 0], e1=e1, e2=e2,
        n0=z3, n1=z3, n2=z3,
        uv0=uv[:, 0], uv1=uv[:, 1], uv2=uv[:, 2],
        material_id=np.zeros(n, np.int32),
        instance_id=np.zeros(n, np.int32),
        texel_density=None, tangent=None,
    )
    _, tang = _uv_mapping_attrs(flat)
    hand = tang[:, 3]

    # reference: T/B from the dp-perp construction, bitangent_l =
    # dot(normalize(cross(n, T)), B)
    gn = np.cross(e1, e2)
    frame_n = gn / np.maximum(
        np.linalg.norm(gn, axis=-1, keepdims=True) ** 2, 1e-20
    )
    duv1 = uv[:, 1] - uv[:, 0]
    duv2 = uv[:, 2] - uv[:, 0]
    dp2perp = np.cross(e2, frame_n)
    dp1perp = np.cross(frame_n, e1)
    t_ref = dp2perp * duv1[:, 0:1] + dp1perp * duv2[:, 0:1]
    b_ref = dp2perp * duv1[:, 1:2] + dp1perp * duv2[:, 1:2]
    gnu = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    bl = np.sum(np.cross(gnu, t_ref) * b_ref, axis=-1)

    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    ok = (np.abs(det) > 1e-5) & (np.linalg.norm(gn, axis=-1) > 1e-5) & (
        np.abs(bl) > 1e-7
    )
    assert ok.sum() > 200
    assert np.array_equal(np.sign(bl[ok]), hand[ok])
