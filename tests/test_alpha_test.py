"""Alpha-tested any-hit emulation (generate_candidate_hit /
any_hit.rahit): rays and shadow rays punch through alpha-cut texels."""

import numpy as np

from realtimepathtracingresearchframework_tpu.backend.params import RenderParams
from realtimepathtracingresearchframework_tpu.backend.renderer import (
    FrameConfig,
    Renderer,
)
from realtimepathtracingresearchframework_tpu.models import procedural, vkr
from realtimepathtracingresearchframework_tpu.models.camera import OrientedCamera
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.models.texture import Texture


def _quad_texture(alpha_checker: bool, n=2):
    rgba = np.full((n, n, 4), 255, np.uint8)
    if alpha_checker:
        yy, xx = np.mgrid[0:n, 0:n]
        rgba[..., 3] = np.where((xx + yy) % 2 == 0, 255, 0).astype(np.uint8)
    return Texture(n, n, 37, mips=[rgba], srgb=False)


def _alpha_scene(alpha_checker=True):
    # emissive back wall at z=-1, textured quad at z=+1
    wall = procedural.make_mesh(
        "wall", procedural._quad([-4, -4, -1], [4, -4, -1], [4, 4, -1], [-4, 4, -1])
    )
    uvs = np.array(
        [
            [[0, 0], [1, 0], [1, 1]],
            [[0, 0], [1, 1], [0, 1]],
        ],
        np.float32,
    )
    quad = procedural.make_mesh(
        "quad",
        procedural._quad([-2, -2, 1], [2, -2, 1], [2, 2, 1], [-2, 2, 1]),
        tri_uvs=uvs,
    )
    mats = [
        vkr.VkrMaterial(
            name="wall",
            emitter_base_color=np.array([1.0, 1.0, 1.0], np.float32),
            emission_intensity=5.0,
        ),
        vkr.VkrMaterial(
            name="cutout", tex_base_color=_quad_texture(alpha_checker)
        ),
    ]
    vs = procedural.identity_scene([wall, quad], mats)
    scene = Scene.from_vkr_scene(vs)
    # identity_scene binds all meshes to material offset 0; point the quad
    # at material 1
    scene.parameterized_meshes[1].material_offset = 1
    return scene


def test_alpha_cutout_reveals_background():
    r = Renderer()
    r.initialize(16, 16)
    r.set_scene(_alpha_scene(alpha_checker=True))
    assert r._has_alpha
    cam = OrientedCamera.look_at([0, 0, 3], [0, 0, -1], fovy=45)
    r.render(FrameConfig(camera=cam, params=RenderParams(max_path_depth=1)))
    lum = np.asarray(r.accum)[..., :3].sum(-1)
    bright = lum > 3.0
    assert bright.any(), "no rays punched through alpha cutouts"
    assert (~bright).any(), "solid texels did not block the wall"
    # checker: roughly half the quad area is cut
    assert 0.2 < bright.mean() < 0.8


def test_opaque_texture_disables_alpha_path():
    r = Renderer()
    r.initialize(8, 8)
    r.set_scene(_alpha_scene(alpha_checker=False))
    assert not r._has_alpha  # fully opaque texels -> NOALPHA, static no-op
    cam = OrientedCamera.look_at([0, 0, 3], [0, 0, -1], fovy=45)
    r.render(FrameConfig(camera=cam, params=RenderParams(max_path_depth=1)))
    lum = np.asarray(r.accum)[..., :3].sum(-1)
    # opaque quad covers the view of the wall entirely
    assert (lum < 3.0).all()


def test_alpha_cutout_under_two_level():
    """Alpha cutouts must also resolve through the BLAS/TLAS instanced
    path (previously the two-level closest hit silently dropped the
    candidate walk)."""
    from realtimepathtracingresearchframework_tpu.backend.params import (
        RenderBackendOptions,
    )

    r = Renderer()
    r.initialize(16, 16)
    r.configure_for(RenderBackendOptions(use_tlas=True))
    r.set_scene(_alpha_scene(alpha_checker=True))
    assert r._use_two_level and r._has_alpha
    cam = OrientedCamera.look_at([0, 0, 3], [0, 0, -1], fovy=45)
    r.render(FrameConfig(camera=cam, params=RenderParams(max_path_depth=1)))
    lum = np.asarray(r.accum)[..., :3].sum(-1)
    bright = lum > 3.0
    assert bright.any(), "no rays punched through alpha cutouts under TLAS"
    assert (~bright).any(), "solid texels did not block the wall"
    assert 0.2 < bright.mean() < 0.8
