"""Native decoder library: must match the numpy reference implementations."""

import os

import numpy as np
import pytest

from realtimepathtracingresearchframework_tpu import native
from realtimepathtracingresearchframework_tpu.models import quantization as q
from realtimepathtracingresearchframework_tpu.models import texture

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _numpy_only():
    """Context: force numpy fallback paths."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        old = native._lib
        native._lib = None
        try:
            yield
        finally:
            native._lib = old

    return ctx()


def test_vertices_match(rng):
    v = (rng.random((5000, 3)).astype(np.float32) - 0.5) * 50
    vq, scale, offset = q.quantize_vertices(v)
    fast = q.dequantize_vertices(vq, scale, offset)
    with _numpy_only():
        ref = q.dequantize_vertices(vq, scale, offset)
    np.testing.assert_array_equal(fast, ref)


def test_normals_uv_match(rng):
    n = rng.standard_normal((5000, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    uv = rng.random((5000, 2))
    nq = q.pack_normal_uv(n, uv)
    fast_n, fast_uv = q.unpack_normal_uv(nq)
    with _numpy_only():
        ref_n, ref_uv = q.unpack_normal_uv(nq)
    np.testing.assert_array_equal(fast_n, ref_n)
    np.testing.assert_array_equal(fast_uv, ref_uv)


def test_transforms_match(rng):
    mats = []
    for _ in range(64):
        a = rng.standard_normal((3, 3))
        r, _ = np.linalg.qr(a)
        if np.linalg.det(r) < 0:
            r[:, 0] *= -1
        m = np.zeros((3, 4))
        m[:, :3] = r * rng.uniform(0.5, 2.0)
        m[:, 3] = rng.standard_normal(3)
        mats.append(m)
    blob = q.quantize_transforms(np.array(mats))
    fast = q.dequantize_transforms(blob)
    with _numpy_only():
        ref = q.dequantize_transforms(blob)
    np.testing.assert_allclose(fast, ref, atol=1e-6)


def test_bc1_match(rng):
    data = rng.integers(0, 256, 8 * 4, dtype=np.uint8).tobytes()  # 4 blocks
    fast = native.decode_bc1(data, 16, 4, True)
    ref = texture.decode_bc1(data, 16, 4, opaque=True)
    np.testing.assert_array_equal(fast, ref)


def test_bc3_bc5_match(rng):
    data = rng.integers(0, 256, 16 * 4, dtype=np.uint8).tobytes()  # 4 blocks
    np.testing.assert_array_equal(
        native.decode_bc3(data, 16, 4), texture.decode_bc3(data, 16, 4)
    )
    np.testing.assert_array_equal(
        native.decode_bc5(data, 16, 4), texture.decode_bc5(data, 16, 4)
    )
