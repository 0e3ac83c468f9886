import numpy as np
import pytest

from realtimepathtracingresearchframework_tpu.utils import color
from realtimepathtracingresearchframework_tpu.utils.compare import compare_images
from realtimepathtracingresearchframework_tpu.utils.image_io import (
    read_exr,
    read_exr_rgba,
    read_pfm,
    read_png,
    write_exr,
    write_exr_rgba,
    write_pfm,
    write_png,
)
from realtimepathtracingresearchframework_tpu.utils.online_stats import OnlineStats


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.random((17, 23, 3)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    back = read_pfm(p)
    np.testing.assert_array_equal(back, img)


def test_pfm_takes_first3_channels(tmp_path, rng):
    img = rng.random((4, 5, 4)).astype(np.float32)
    p = str(tmp_path / "x")
    write_pfm(p, img)
    back = read_pfm(p + ".pfm")
    np.testing.assert_array_equal(back, img[..., :3])


@pytest.mark.parametrize("half", [False, True])
@pytest.mark.parametrize("compression", ["none", "zip"])
def test_exr_roundtrip(tmp_path, rng, half, compression):
    img = (rng.random((33, 47, 4)).astype(np.float32) * 4.0) - 1.0
    p = str(tmp_path / "x.exr")
    write_exr_rgba(p, img, half=half, compression=compression)
    back = read_exr_rgba(p)
    if half:
        np.testing.assert_allclose(back, img.astype(np.float16).astype(np.float32))
    else:
        np.testing.assert_array_equal(back, img)


def test_exr_arbitrary_channels(tmp_path, rng):
    h, w = 9, 31
    chans = {"depth.Z": rng.random((h, w)).astype(np.float32)}
    p = str(tmp_path / "z.exr")
    write_exr(p, chans, half=False)
    back = read_exr(p)
    np.testing.assert_array_equal(back["depth.Z"], chans["depth.Z"])


def test_png_roundtrip(tmp_path, rng):
    img = (rng.random((21, 13, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_compare_identical_passes(tmp_path, rng):
    img = rng.random((8, 8, 3)).astype(np.float32)
    a, b = str(tmp_path / "a.pfm"), str(tmp_path / "b.pfm")
    write_pfm(a, img)
    write_pfm(b, img)
    r = compare_images(a, b, write_error_image=False)
    assert r.passed and r.max_rel_error == 0.0


def test_compare_detects_differences(tmp_path, rng):
    img = rng.random((8, 8, 3)).astype(np.float32) + 0.5
    img2 = img.copy()
    img2[3, 4, 1] *= 1.5
    a, b = str(tmp_path / "a.pfm"), str(tmp_path / "b.pfm")
    write_pfm(a, img2)
    write_pfm(b, img)
    r = compare_images(a, b, threshold=1e-6)
    assert not r.passed
    assert r.num_failed == 1
    assert (tmp_path / "a_err.exr").exists()


def test_srgb_roundtrip():
    x = np.linspace(0, 1, 64)
    np.testing.assert_allclose(
        color.srgb_to_linear(color.linear_to_srgb(x)), x, atol=1e-6
    )


def test_tonemap_modes():
    c = np.array([[0.5, 1.0, 4.0]])
    assert np.allclose(color.tonemap(0, c), c)
    fast = color.tonemap(2, c)
    assert np.all(fast < 1.0) and np.all(fast > 0)
    neutral = color.tonemap(1, c)
    assert np.all(np.isfinite(neutral))


def test_online_stats():
    st = OnlineStats()
    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    for x in xs:
        st.add(x)
    assert st.count == 5
    assert st.mean == pytest.approx(3.0)
    assert st.variance == pytest.approx(np.var(xs, ddof=1))
    assert st.minimum == 1.0 and st.maximum == 5.0


def test_halton_23_matches_reference_table():
    """librender/halton.h:14 — first 64 Halton(2,3) entries."""
    import numpy as np

    from realtimepathtracingresearchframework_tpu.utils.halton import (
        halton_23,
        halton_jitter,
    )

    t = halton_23(64)
    assert t.shape == (64, 2)
    np.testing.assert_allclose(t[0], [0.5, 1.0 / 3.0], rtol=1e-6)
    np.testing.assert_allclose(t[2], [0.75, 1.0 / 9.0], rtol=1e-6)
    j = halton_jitter(65)  # wraps mod 64
    np.testing.assert_allclose(j, t[1] - 0.5, rtol=1e-6)


def test_exr_zip_preprocessing_matches_openexr_order():
    """OpenEXR's ImfZip DEcompress is: predictor-undo, then interleave
    the two halves (t1 = buf, t2 = buf + (n+1)//2). Our writer's
    preprocessing must be its exact inverse (split THEN delta) — the
    two steps do not commute, and the wrong order writes files standard
    loaders decode to garbage. This decodes our writer's output with an
    independent, literal transcription of the ImfZip.cpp loop."""
    from realtimepathtracingresearchframework_tpu.utils.image_io import (
        _zip_reorder,
        _zip_unreorder,
    )

    rng = np.random.default_rng(7)
    for n in (1, 2, 7, 64, 1001):
        raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        enc = bytearray(_zip_reorder(raw))

        # ImfZip.cpp decompress, verbatim semantics:
        # predictor: t[0] = t[-1] + t[0] - 128 (mod 256), left to right
        for i in range(1, len(enc)):
            enc[i] = (enc[i - 1] + enc[i] - 128) & 0xFF
        # reorder: interleave first half with second half
        half = (len(enc) + 1) // 2
        out = bytearray(len(enc))
        out[0::2] = enc[:half]
        out[1::2] = enc[half:]
        assert bytes(out) == raw

        # and our own reader inverts it too
        assert _zip_unreorder(_zip_reorder(raw)) == raw
