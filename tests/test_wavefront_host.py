"""Bounce-major host-wavefront executor (ops/wavefront_host.py) parity:
the frame rendered by host-managed exact-width bounce queues must match
the monolithic pass program.

Tolerance: radiance to XLA program-shape rounding (the same class as
compact_lanes on/off, tests/test_compact_lanes.py); path structure —
the aggregate traced-ray count and per-pixel alpha — matches exactly
(same hits, NEE visibility, RR decisions per lane).
"""

import os

import numpy as np
import pytest

from realtimepathtracingresearchframework_tpu.backend.params import (
    RenderParams,
    SceneConfig,
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


def _render(host_wavefront, frames=2, spp=1):
    os.environ["RPTR_HOST_WAVEFRONT"] = "1" if host_wavefront else "0"
    try:
        scfg = SceneConfig(sun_dir=(0.35, 0.8, 0.3), turbidity=3.0)
        r = Renderer()
        r.initialize(96, 64)
        r.set_scene(
            Scene.from_vkr_scene(procedural.cornell_box()),
            scene_config=scfg,
        )
        cfg = FrameConfig(
            camera=OrientedCamera.look_at(
                [0, 1.2, 3.0], [0, 0.8, 0.0], fovy=55
            ),
            params=RenderParams(batch_spp=spp, max_path_depth=5,
                                rr_path_depth=2),
            scene_config=scfg,
        )
        for _ in range(frames):
            r.render(cfg)
        rays = r.last_frame_rays()
        return np.asarray(r.readback_framebuffer()), rays
    finally:
        os.environ.pop("RPTR_HOST_WAVEFRONT", None)


def test_renderer_host_wavefront_matches_monolith():
    base, rays0 = _render(False)
    wf, rays1 = _render(True)
    assert base.shape == wf.shape
    assert rays0 == rays1  # aggregate path structure: exact
    np.testing.assert_allclose(wf, base, rtol=3e-5, atol=1e-7)


def test_renderer_host_wavefront_spp_accumulation():
    base, _ = _render(False, frames=3, spp=2)
    wf, _ = _render(True, frames=3, spp=2)
    np.testing.assert_allclose(wf, base, rtol=5e-5, atol=1e-7)


def test_ladder_cover():
    from realtimepathtracingresearchframework_tpu.ops.wavefront_host import (
        ladder_cover,
    )

    ladder = (262144, 524288, 786432)
    assert ladder_cover(ladder, 1) == 262144
    assert ladder_cover(ladder, 262144) == 262144
    assert ladder_cover(ladder, 262145) == 524288
    assert ladder_cover(ladder, 786432) == 786432
    assert ladder_cover(ladder, 10**9) == 786432
