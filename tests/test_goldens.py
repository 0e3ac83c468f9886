"""Committed golden-image corpus: pins renderer output across rounds.

The reference pins output through validation-mode renders compared by
compare_exr at rel-err 1e-6 (util/compare_exr.cpp:75-97). These goldens
are the same idea checked into the repo: small deterministic CPU renders
(pinned seed, fixed camera) of three configs — diffuse cornell, textured
cornell, and a sun/sky config. A silent change to NEE weights, BSDF
sampling, RNG streams, sky model, or resolve math fails these.

Regenerate intentionally with:
  REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py -q
"""

import os

import numpy as np
import pytest

from realtimepathtracingresearchframework_tpu.backend.params import RenderParams
from realtimepathtracingresearchframework_tpu.backend.renderer import (
    FrameConfig,
    Renderer,
)
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.camera import OrientedCamera
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.models.texture import (
    Texture,
    build_mip_chain,
)
from realtimepathtracingresearchframework_tpu.utils import image_io
from realtimepathtracingresearchframework_tpu.utils.compare import compare_images

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("REGEN_GOLDENS", "") == "1"


def _checker(n=16):
    img = np.zeros((n, n, 4), np.float32)
    yy, xx = np.mgrid[0:n, 0:n]
    c = ((xx // 4 + yy // 4) % 2).astype(np.float32)
    img[..., 0] = c
    img[..., 2] = 1.0 - c
    img[..., 3] = 1.0
    return img


def _render(scene, cam, params, w=48, h=48, spp=4):
    r = Renderer()
    r.initialize(w, h)
    r.set_scene(scene)
    r.render(FrameConfig(camera=cam, params=params), batch_spp=spp)
    return r.readback_accumulation()


def _cornell_diffuse():
    scene = Scene.from_vkr_scene(procedural.cornell_box())
    cam = OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50)
    return _render(scene, cam, RenderParams(max_path_depth=3))


def _cornell_textured():
    sv = procedural.cornell_box()
    sv.materials[0].tex_base_color = Texture(
        16, 16, 37, mips=build_mip_chain(_checker()), srgb=False
    )
    scene = Scene.from_vkr_scene(sv)
    cam = OrientedCamera.look_at([0, 1.4, 3.0], [0, 0.2, 0.0], fovy=60)
    return _render(scene, cam, RenderParams(max_path_depth=2))


def _sun_sky():
    from realtimepathtracingresearchframework_tpu.backend.renderer import (
        SceneConfig,
    )

    scene = Scene.from_vkr_scene(procedural.cornell_box(light=False))
    cam = OrientedCamera.look_at([0, 1.0, 3.2], [0.2, 1.4, 0.0], fovy=70)
    r = Renderer()
    r.initialize(48, 48)
    r.set_scene(
        scene, scene_config=SceneConfig(sun_dir=(0.3, 0.8, 0.2), turbidity=3.0)
    )
    r.render(
        FrameConfig(
            camera=cam,
            params=RenderParams(max_path_depth=3),
            scene_config=SceneConfig(sun_dir=(0.3, 0.8, 0.2), turbidity=3.0),
        ),
        batch_spp=4,
    )
    return r.readback_accumulation()


def _rng_case(variant):
    from realtimepathtracingresearchframework_tpu.backend.params import (
        RenderBackendOptions,
    )

    def case():
        scene = Scene.from_vkr_scene(procedural.cornell_box())
        cam = OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50)
        r = Renderer()
        r.initialize(48, 48)
        r.configure_for(RenderBackendOptions(rng_variant=variant))
        r.set_scene(scene)
        r.render(
            FrameConfig(camera=cam, params=RenderParams(max_path_depth=3)),
            batch_spp=4,
        )
        return r.readback_accumulation()

    return case


def _wavefront():
    from realtimepathtracingresearchframework_tpu.backend.renderer import (
        VARIANT_WAVEFRONT,
    )

    scene = Scene.from_vkr_scene(procedural.cornell_box())
    cam = OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50)
    r = Renderer()
    r.initialize(48, 48)
    r.set_scene(scene)
    r.set_variant(VARIANT_WAVEFRONT)
    r.render(
        FrameConfig(camera=cam, params=RenderParams(max_path_depth=3)),
        batch_spp=4,
    )
    return r.readback_accumulation()


from realtimepathtracingresearchframework_tpu.backend.params import (
    RNG_VARIANT_BN,
    RNG_VARIANT_SOBOL,
    RNG_VARIANT_Z_SBL,
)

_CASES = {
    "cornell_diffuse": _cornell_diffuse,
    "cornell_textured": _cornell_textured,
    "sun_sky": _sun_sky,
    "cornell_sobol": _rng_case(RNG_VARIANT_SOBOL),
    "cornell_zsbl": _rng_case(RNG_VARIANT_Z_SBL),
    "cornell_bn": _rng_case(RNG_VARIANT_BN),
    "cornell_wavefront": _wavefront,
}


@pytest.mark.parametrize("name", sorted(_CASES))
def test_golden(name):
    img = np.asarray(_CASES[name]())[..., :3].astype(np.float32)
    path = os.path.join(GOLDEN_DIR, f"{name}.pfm")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        image_io.write_pfm(path, img)
        if not REGEN:
            pytest.skip(f"golden {name} created; commit it")
        return
    ref = image_io.read_pfm(path)
    result = compare_images(img, ref, threshold=1e-6)
    assert result.passed, (
        f"{name}: max rel err {result.max_rel_error:.3e}, "
        f"{result.num_failed} pixels over threshold"
    )
