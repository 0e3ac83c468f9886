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
