"""TAA + reprojection tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from realtimepathtracingresearchframework_tpu.backend.params import (
    REPROJECTION_MODE_ACCUMULATE,
    RenderParams,
)
from realtimepathtracingresearchframework_tpu.backend.renderer import (
    FrameConfig,
    Renderer,
)
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.camera import OrientedCamera
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import taa


def test_taa_static_converges_to_history_blend(rng):
    fb = jnp.asarray(rng.random((16, 16, 4)), jnp.float32)
    hist = jnp.zeros((16, 16, 4), jnp.float32)
    motion = jnp.zeros((16, 16, 2), jnp.float32)
    out = np.asarray(taa.taa_resolve(fb, hist, motion))
    assert np.isfinite(out).all()
    # zero history pulls the blend down on average; the variance clamp
    # bounds it to the local neighborhood statistics
    assert out.mean() < np.asarray(fb).mean()
    assert out.min() >= -1e-5


def test_taa_identity_history(rng):
    # smooth gradient: history == frame and the variance clamp is a no-op,
    # so the resolve must reproduce the frame (Lanczos is exact at centers)
    g = np.linspace(0.1, 0.9, 16, dtype=np.float32)
    fb = jnp.asarray(
        np.broadcast_to(g[None, :, None], (16, 16, 4)).copy(), jnp.float32
    )
    out = np.asarray(taa.taa_resolve(fb, fb, jnp.zeros((16, 16, 2))))
    np.testing.assert_allclose(out, np.asarray(fb), atol=0.02)  # border taps clamp


def test_reproject_accumulate_static(rng):
    accum = jnp.asarray(rng.random((8, 8, 4)), jnp.float32)
    hist = jnp.asarray(rng.random((8, 8, 4)), jnp.float32)
    depth = jnp.ones((8, 8), jnp.float32)
    out = np.asarray(
        taa.reproject_and_accumulate(
            accum, hist, jnp.zeros((8, 8, 2)), depth, depth,
            jnp.int32(8), jnp.int32(8), jnp.int32(1),
        )
    )
    expect = np.asarray(hist) + (np.asarray(accum) - np.asarray(hist)) * (1.0 / 9.0)
    np.testing.assert_allclose(out, expect, atol=1e-5)
    # disocclusion: depth mismatch falls back to the new frame
    out2 = np.asarray(
        taa.reproject_and_accumulate(
            accum, hist, jnp.zeros((8, 8, 2)), depth, depth * 10,
            jnp.int32(8), jnp.int32(8), jnp.int32(1),
        )
    )
    np.testing.assert_allclose(out2, np.asarray(accum), atol=1e-6)


@pytest.mark.slow
def test_render_with_taa_and_reprojection():
    scene = Scene.from_vkr_scene(procedural.cornell_box())
    r = Renderer()
    r.options = r.options.replace(enable_taa=True)
    r.initialize(16, 16)
    r.set_scene(scene)
    cam = OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50)
    params = RenderParams(
        batch_spp=1, max_path_depth=2,
        reprojection_mode=REPROJECTION_MODE_ACCUMULATE,
    )
    for _ in range(3):
        r.render(FrameConfig(camera=cam, params=params))
        cam.move(right=0.02)
    img = r.readback_framebuffer()
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_motion_aov_is_ndc_units():
    """The motion AOV rides in NDC units ([-1,1] spans the screen), the
    reference's convention — its TAA applies `start + 0.5 * motion` in
    UV space (process_taa.comp:75). A UV-unit delta here would make
    every reprojection land at HALF the true offset."""
    import math

    from realtimepathtracingresearchframework_tpu.backend.params import (
        RenderParams,
    )
    from realtimepathtracingresearchframework_tpu.backend.renderer import (
        FrameConfig,
        Renderer,
    )
    from realtimepathtracingresearchframework_tpu.models import procedural
    from realtimepathtracingresearchframework_tpu.models.camera import (
        OrientedCamera,
    )
    from realtimepathtracingresearchframework_tpu.models.scene import Scene

    w = h = 32
    r = Renderer()
    r.initialize(w, h)
    r.set_scene(Scene.from_vkr_scene(procedural.cornell_box()))
    params = RenderParams(max_path_depth=2)
    cam_a = OrientedCamera.look_at([0.0, 1.0, 3.2], [0.0, 1.0, 0.0], fovy=50)
    cam_b = OrientedCamera.look_at([0.3, 1.0, 3.2], [0.3, 1.0, 0.0], fovy=50)
    r.render_aovs(FrameConfig(camera=cam_a, params=params))  # seeds prev
    aovs = r.render_aovs(FrameConfig(camera=cam_b, params=params))
    mj = np.asarray(aovs.motion_jitter)

    # the center pixel sees the back wall (z = -1), depth from the AOV;
    # compute its NDC displacement with an independent pinhole model
    nd = np.asarray(aovs.normal_depth)
    depth = float(nd[h // 2, w // 2, 3])
    p = np.array([0.3, 1.0, 3.2]) + depth * np.array([0.0, 0.0, -1.0])

    def ndc_x(cam_x):
        # horizontal NDC coordinate of p from a -z-looking camera at
        # (cam_x, 1, 3.2) with fovy 50 and square aspect
        half = math.tan(math.radians(25.0))
        view_x = (p[0] - cam_x) / (3.2 - p[2])
        return view_x / half  # [-1, 1]

    expected = ndc_x(0.0) - ndc_x(0.3)  # prev - now
    got = float(mj[h // 2, w // 2, 0])
    assert got == pytest.approx(expected, rel=0.08)
