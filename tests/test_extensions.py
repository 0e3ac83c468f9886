"""RenderExtension framework (librender/render_backend.h:126-154,
render_vulkan_extensions.cpp:16-84)."""

import numpy as np
import pytest

from realtimepathtracingresearchframework_tpu.backend import extensions as ext_mod
from realtimepathtracingresearchframework_tpu.backend.extensions import (
    BinnedLightsExtension,
    RenderExtension,
    RenderProcessingStep,
    TAAExtension,
)
from realtimepathtracingresearchframework_tpu.backend.params import (
    LIGHT_SAMPLING_VARIANT_NONE,
    LIGHT_SAMPLING_VARIANT_RIS,
    RNG_VARIANT_BN,
    RNG_VARIANT_SOBOL,
    RNG_VARIANT_UNIFORM,
    RenderBackendOptions,
    RenderParams,
)
from realtimepathtracingresearchframework_tpu.backend.renderer import (
    FrameConfig,
    Renderer,
)
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.camera import OrientedCamera
from realtimepathtracingresearchframework_tpu.models.scene import Scene


def _renderer(w=24, h=24, options=None):
    r = Renderer()
    r.initialize(w, h)
    if options is not None:
        r.configure_for(options)
    r.set_scene(Scene.from_vkr_scene(procedural.cornell_box()))
    return r


def _config(**kw):
    cam = OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50)
    return FrameConfig(camera=cam, params=RenderParams(max_path_depth=2, **kw))


def test_default_extensions_attached():
    r = Renderer()
    names = [e.name() for e in r.extensions]
    assert names == ["bn pointsets", "sobol pointsets", "binned lights"]


def test_activity_follows_options():
    r = Renderer()
    bn, sobol, bins = r.extensions
    rbo = RenderBackendOptions(
        rng_variant=RNG_VARIANT_UNIFORM,
        light_sampling_variant=LIGHT_SAMPLING_VARIANT_NONE,
    )
    assert not bn.is_active_for(rbo)
    assert not sobol.is_active_for(rbo)
    assert not bins.is_active_for(rbo)
    rbo2 = RenderBackendOptions(
        rng_variant=RNG_VARIANT_SOBOL,
        light_sampling_variant=LIGHT_SAMPLING_VARIANT_RIS,
    )
    assert sobol.is_active_for(rbo2) and not bn.is_active_for(rbo2)
    assert bins.is_active_for(rbo2)
    bins.mute_flag = True
    assert not bins.is_active_for(rbo2)


def test_binned_lights_extension_builds_bins():
    r = _renderer(
        options=RenderBackendOptions(
            light_sampling_variant=LIGHT_SAMPLING_VARIANT_RIS
        )
    )
    assert r._use_bins
    r2 = _renderer(
        options=RenderBackendOptions(
            light_sampling_variant=LIGHT_SAMPLING_VARIANT_NONE
        )
    )
    assert not r2._use_bins


def test_pointsets_extension_provides_tables():
    r = _renderer(options=RenderBackendOptions(rng_variant=RNG_VARIANT_BN))
    rng = r.device_scene.rng
    # reference BN tables when available, else the generated mask
    assert rng.bn_sobol.size > 1 or rng.bn_mask.size > 1
    r2 = _renderer(options=RenderBackendOptions(rng_variant=RNG_VARIANT_UNIFORM))
    rng2 = r2.device_scene.rng
    assert rng2.bn_sobol.size <= 1 and rng2.bn_mask.size <= 1


def test_processing_step_factory():
    r = Renderer()
    r.initialize(16, 16)
    taa = r.create_processing_step(RenderProcessingStep.TAA)
    assert isinstance(taa, TAAExtension)
    assert r.create_processing_step(RenderProcessingStep.RESTIR) is None
    # cached accessor returns the same instance
    a = r.get_processing_step(RenderProcessingStep.PROFILING_TOOLS)
    b = r.get_processing_step(RenderProcessingStep.PROFILING_TOOLS)
    assert a is b and a is not None


@pytest.mark.slow
def test_taa_via_extension_framework():
    r = _renderer(options=RenderBackendOptions(enable_taa=True))
    r.render(_config())
    fb1 = np.asarray(r.framebuffer)
    assert np.isfinite(fb1).all()
    ext = r._processing_steps[RenderProcessingStep.TAA]
    assert ext is not None and ext._history is not None


def test_profiling_tools_csv_columns():
    r = _renderer()
    r.render(_config())
    ext = r.get_processing_step(RenderProcessingStep.PROFILING_TOOLS)
    cols = ext.csv_header()
    vals = ext.csv_values()
    assert len(cols) == len(vals)
    assert "rendering_avg_ms" in cols
    # the RENDERING marker was fed this frame
    idx = cols.index("rendering_avg_ms")
    assert vals[idx] > 0.0


def test_custom_extension_lifecycle_hooks():
    calls = []

    class Probe(RenderExtension):
        def name(self):
            return "probe"

        def initialize(self, w, h):
            calls.append(("init", w, h))

        def update_scene_from_backend(self, scene):
            calls.append(("scene", scene.unique_tris))

        def preprocess(self, variant_idx=0):
            calls.append(("pre",))

        def process(self, variant_idx=0):
            calls.append(("post",))

    r = Renderer()
    r.extensions.append(Probe(r))
    r.initialize(16, 16)
    r.set_scene(Scene.from_vkr_scene(procedural.cornell_box()))
    r.render(_config())
    kinds = [c[0] for c in calls]
    assert kinds[0] == "init"
    assert "scene" in kinds and "pre" in kinds


def test_example_extension_transforms_accum():
    """The Example processing step applies the example.comp transform
    (tint + height fade + fractal background where alpha < 1)."""
    r = _renderer()
    r.render(_config())
    before = r.readback_accumulation().copy()
    ext = r.create_processing_step(RenderProcessingStep.EXAMPLE)
    ext.process()
    after = r.readback_accumulation()
    assert after.shape == before.shape
    assert np.isfinite(after).all()
    assert np.abs(after[..., :3] - before[..., :3]).max() > 1e-3
    np.testing.assert_array_equal(after[..., 3], before[..., 3])  # alpha kept
