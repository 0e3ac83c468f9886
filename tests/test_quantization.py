import numpy as np
import pytest

from realtimepathtracingresearchframework_tpu.models import quantization as q


def test_vertex_roundtrip(rng):
    v = (rng.random((1000, 3)).astype(np.float32) - 0.5) * 100.0
    vq, scale, offset = q.quantize_vertices(v)
    back = q.dequantize_vertices(vq, scale, offset)
    extent = v.max(0) - v.min(0)
    np.testing.assert_allclose(back, v, atol=float(extent.max()) / (1 << 20))


def test_vertex_bitfields_disjoint():
    v = np.array([[0.0, 0.0, 0.0], [1.0, 2.0, 4.0]], np.float32)
    vq, scale, offset = q.quantize_vertices(v)
    assert q.dequantize_vertices(vq, scale, offset)[0] == pytest.approx([0, 0, 0])


def test_libvkr_swizzle_convention():
    # libvkr CPU decode negates x and swaps the y/z axes w.r.t. render space.
    v = np.array([[1.0, 2.0, 3.0], [-4.0, 5.0, -6.0]], np.float32)
    vq, scale, offset = q.quantize_vertices(v)
    render = q.dequantize_vertices(vq, scale, offset)
    obj = q.dequantize_vertices_libvkr(vq, scale, offset)
    np.testing.assert_allclose(obj[:, 0], -render[:, 0], atol=1e-5)
    np.testing.assert_allclose(obj[:, 1], render[:, 2], atol=1e-5)
    np.testing.assert_allclose(obj[:, 2], render[:, 1], atol=1e-5)


def test_normal_roundtrip(rng):
    n = rng.standard_normal((5000, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    word = q.quantize_normal(n)
    back = q.dequantize_normal(word)
    dots = np.sum(back * n, axis=-1)
    assert dots.min() > 0.99999  # < ~0.26 degrees error

    # axis-aligned normals are exact
    axes = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0], [0, 0, -1]],
        np.float64,
    )
    back = q.dequantize_normal(q.quantize_normal(axes))
    np.testing.assert_allclose(back, axes, atol=1e-4)


def test_uv_roundtrip(rng):
    uv = rng.random((1000, 2)).astype(np.float32)  # standard [0,1]^2
    word = q.quantize_uv(uv)
    back = q.dequantize_uv(word)
    np.testing.assert_allclose(back, uv, atol=8.0 / 0xFFFF)


def test_normal_uv_pack(rng):
    n = rng.standard_normal((100, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    uv = rng.random((100, 2))
    nq = q.pack_normal_uv(n, uv)
    n2, uv2 = q.unpack_normal_uv(nq)
    assert np.sum(n2 * n, axis=-1).min() > 0.9999
    np.testing.assert_allclose(uv2, uv, atol=2e-4)


def _random_similarity(rng, n):
    # random rotation via QR, uniform scale, translation
    mats = []
    for i in range(n):
        a = rng.standard_normal((3, 3))
        r, _ = np.linalg.qr(a)
        if np.linalg.det(r) < 0:
            r[:, 0] *= -1
        s = rng.uniform(0.2, 5.0)
        if i % 3 == 0:
            s = -s  # orientation-reversing
        m = np.zeros((3, 4))
        m[:, :3] = r * s
        m[:, 3] = rng.standard_normal(3) * 10
        mats.append(m)
    return np.array(mats)


def test_transform_roundtrip(rng):
    m = _random_similarity(rng, 64)
    blob = q.quantize_transforms(m)
    assert blob.shape == (64, 24)
    back = q.dequantize_transforms(blob)
    np.testing.assert_allclose(back[:, :, 3], m[:, :, 3], atol=1e-5)  # exact f32
    # rotation+scale within quaternion quantization error
    np.testing.assert_allclose(back[:, :, :3], m[:, :, :3], atol=3e-3 * 5.0)


def test_transform_identity():
    ident = np.zeros((1, 3, 4))
    ident[0, :, :3] = np.eye(3)
    back = q.dequantize_transforms(q.quantize_transforms(ident))
    np.testing.assert_allclose(back, ident, atol=2e-4)
