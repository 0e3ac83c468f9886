"""Pointset variant tests: contract + stratification quality."""

import numpy as np
import jax.numpy as jnp
import pytest

from realtimepathtracingresearchframework_tpu.backend.params import (
    RNG_VARIANT_BN,
    RNG_VARIANT_SOBOL,
    RNG_VARIANT_UNIFORM,
    RNG_VARIANT_Z_SBL,
    RenderParams,
)
from realtimepathtracingresearchframework_tpu.ops import pointsets, sobol


def test_sobol_matrices_first_dim_van_der_corput():
    m = sobol.sobol_matrices(8)
    assert m[0, 0] == 1 << 31
    assert m[0, 5] == 1 << 26


def test_sobol_low_discrepancy_vs_random():
    """First 256 2D Sobol points must stratify far better than random."""
    mats = jnp.asarray(sobol.sobol_matrices(8))
    idx = jnp.arange(256, dtype=jnp.uint32)
    x = sobol.u32_to_float(sobol.sobol_value(mats, idx, jnp.int32(0)))
    y = sobol.u32_to_float(sobol.sobol_value(mats, idx, jnp.int32(1)))
    # count points per 16x16 stratum: perfect = exactly 1 per cell
    cells = (np.asarray(x) * 16).astype(int) * 16 + (np.asarray(y) * 16).astype(int)
    counts = np.bincount(cells, minlength=256)
    assert counts.max() <= 2  # near-perfect stratification
    rng = np.random.default_rng(0)
    rc = np.bincount(
        (rng.random(256) * 16).astype(int) * 16 + (rng.random(256) * 16).astype(int),
        minlength=256,
    )
    assert counts.std() < rc.std()


@pytest.mark.parametrize(
    "variant", [RNG_VARIANT_UNIFORM, RNG_VARIANT_SOBOL, RNG_VARIANT_Z_SBL, RNG_VARIANT_BN]
)
def test_draw_contract(variant):
    bufs = pointsets.build_rng_buffers(variant)
    px = jnp.arange(64, dtype=jnp.uint32) % 8
    py = jnp.arange(64, dtype=jnp.uint32) // 8
    st = pointsets.make_state(variant, jnp.uint32(3), jnp.uint32(7), px, py, 8, bufs=bufs)
    st, a = pointsets.draw2(variant, bufs, st, jnp.int32(0))
    st, b = pointsets.draw1(variant, bufs, st, jnp.int32(2))
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == (64, 2) and b.shape == (64,)
    assert ((a >= 0) & (a < 1)).all() and ((b >= 0) & (b < 1)).all()
    # different pixels decorrelated
    assert len(np.unique(np.round(a[:, 0], 6))) > 32


def test_sobol_sequence_stratified_per_pixel():
    """For one pixel, successive sample indices of the SOBOL variant must
    stratify dimension pairs better than uniform."""
    variant = RNG_VARIANT_SOBOL
    bufs = pointsets.build_rng_buffers(variant)
    n = 64
    px = jnp.full((n,), 5, jnp.uint32)
    py = jnp.full((n,), 9, jnp.uint32)
    vals = []
    for s in range(n):
        st = pointsets.make_state(variant, jnp.uint32(s), jnp.uint32(0), px[:1], py[:1], 16, bufs=bufs)
        _, xy = pointsets.draw2(variant, bufs, st, jnp.int32(4))
        vals.append(np.asarray(xy)[0])
    vals = np.array(vals)
    cells = (vals[:, 0] * 8).astype(int) * 8 + (vals[:, 1] * 8).astype(int)
    counts = np.bincount(cells, minlength=64)
    assert counts.max() <= 3


@pytest.mark.slow
def test_render_with_each_variant():
    """End-to-end: every variant renders a finite plausible image and lower-
    discrepancy variants do not increase error vs a high-spp reference."""
    from realtimepathtracingresearchframework_tpu.backend.renderer import (
        FrameConfig,
        Renderer,
    )
    from realtimepathtracingresearchframework_tpu.models import procedural
    from realtimepathtracingresearchframework_tpu.models.camera import OrientedCamera
    from realtimepathtracingresearchframework_tpu.models.scene import Scene

    scene = Scene.from_vkr_scene(procedural.cornell_box())
    cam = OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50)
    imgs = {}
    for variant in (RNG_VARIANT_UNIFORM, RNG_VARIANT_SOBOL, RNG_VARIANT_Z_SBL, RNG_VARIANT_BN):
        r = Renderer()
        r.options = r.options.replace(rng_variant=variant)
        r.initialize(16, 16)
        r.set_scene(scene)
        r.render(FrameConfig(camera=cam, params=RenderParams(batch_spp=16, max_path_depth=3)))
        imgs[variant] = r.readback_accumulation()[..., :3]
        assert np.isfinite(imgs[variant]).all()
        assert imgs[variant].mean() > 0.02
    # all variants estimate the same integral
    means = [float(v.mean()) for v in imgs.values()]
    assert max(means) - min(means) < 0.25 * max(means)
