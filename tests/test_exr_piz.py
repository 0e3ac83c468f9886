"""PIZ EXR codec tests (utils/exr_piz.py).

The reference binary writes validation images PIZ-compressed
(libapp/app_state.cpp:467-481); compare_exr consumes them
(util/compare_exr.cpp:51-132). No external EXR oracle exists in this
environment, so the codec is pinned by exhaustive round-trips through
each layer (wavelet, Huffman, chunk, file) across shapes that exercise
every odd-dimension branch, plus structural assertions on the encoded
stream (header fields, bitmap window, canonical code table).
"""

import struct

import numpy as np
import pytest

from realtimepathtracingresearchframework_tpu.utils import exr_piz as ep
from realtimepathtracingresearchframework_tpu.utils import image_io


@pytest.mark.parametrize("shape", [(1, 1), (5, 7), (8, 8), (32, 17), (3, 64)])
@pytest.mark.parametrize("mx", [100, 1 << 15])
def test_wavelet_round_trip(shape, mx):
    rng = np.random.default_rng(hash(shape) & 0xFFFF)
    plane = rng.integers(0, mx + 1, size=shape).astype(np.uint16)
    ref = plane.copy()
    ep.wav2_encode(plane, mx)
    assert not np.array_equal(plane, ref) or plane.size <= 1
    ep.wav2_decode(plane, mx)
    np.testing.assert_array_equal(plane, ref)


def test_huffman_round_trip_runs():
    rng = np.random.default_rng(3)
    # long runs exercise the run-length pseudo-symbol on both sides
    data = np.concatenate([
        np.full(700, 42, np.uint16),
        rng.integers(0, 5000, 4096).astype(np.uint16),
        np.full(300, 65535, np.uint16),
        np.zeros(64, np.uint16),
    ])
    enc = ep.huf_compress(data)
    out = ep.huf_uncompress(enc, len(data))
    np.testing.assert_array_equal(out, data)
    im, iM, table_len, nbits, zero = struct.unpack_from("<IIIII", enc, 0)
    assert zero == 0
    assert im == 0 and iM == 65536  # data max 65535 -> RLC symbol 65536
    assert 20 + table_len + (nbits + 7) // 8 == len(enc)


def test_huffman_single_symbol():
    data = np.full(1000, 7, np.uint16)
    enc = ep.huf_compress(data)
    np.testing.assert_array_equal(ep.huf_uncompress(enc, 1000), data)
    assert len(enc) < 80  # run-length collapses the constant block


@pytest.mark.parametrize("w,ny", [(16, 32), (17, 5), (1920, 3), (3, 1)])
@pytest.mark.parametrize("bpp", [2, 4])
def test_piz_chunk_round_trip(w, ny, bpp):
    rng = np.random.default_rng(w * ny + bpp)
    channels = [("B", bpp), ("G", bpp), ("R", bpp)]
    if bpp == 2:
        vals = rng.standard_normal((ny, w * 3)).astype(np.float16)
        raw = vals.astype("<f2").tobytes()
    else:
        # float32 rows; smooth data like real renders compresses
        vals = np.cumsum(
            rng.standard_normal((ny, w * 3)).astype(np.float32), axis=1
        ) * 0.01
        raw = vals.astype("<f4").tobytes()
    chunk = ep.piz_compress(raw, w, ny, channels)
    back = ep.piz_uncompress(chunk, w, ny, channels)
    assert back == raw
    # structural: bitmap window covers only present high/low bytes
    min_nz, max_nz = struct.unpack_from("<HH", chunk, 0)
    assert min_nz <= max_nz <= ep.BITMAP_SIZE - 1


def test_piz_exr_file_round_trip(tmp_path):
    rng = np.random.default_rng(11)
    h, w = 70, 33  # > 2 PIZ blocks (32 lines each), ragged tail
    img = (rng.random((h, w, 3)) * 4.0).astype(np.float32)
    p = tmp_path / "piz.exr"
    image_io.write_exr_rgba(
        str(p), img, half=True,
        compression=image_io.EXR_COMPRESSION_PIZ,
    )
    back = image_io.read_exr_rgba(str(p))
    np.testing.assert_array_equal(
        back, img.astype(np.float16).astype(np.float32)
    )
    # byte-level: declared compression must be PIZ (4), not ZIP
    data = p.read_bytes()
    assert b"compression\x00compression" in data
    idx = data.index(b"compression\x00compression\x00") + len(
        b"compression\x00compression\x00"
    ) + 4  # skip the 4-byte attribute size; next byte is the enum
    assert data[idx] == 4


def test_piz_exr_float_channels(tmp_path):
    rng = np.random.default_rng(12)
    h, w = 40, 21
    chans = {
        "R": rng.standard_normal((h, w)).astype(np.float32),
        "G": rng.standard_normal((h, w)).astype(np.float32),
        "B": rng.standard_normal((h, w)).astype(np.float32),
    }
    p = tmp_path / "piz32.exr"
    image_io.write_exr(
        str(p), chans, half=False,
        compression=image_io.EXR_COMPRESSION_PIZ,
    )
    back = image_io.read_exr(str(p))
    for k in chans:
        np.testing.assert_array_equal(back[k], chans[k])


def test_compare_accepts_piz(tmp_path):
    from realtimepathtracingresearchframework_tpu.utils import compare

    rng = np.random.default_rng(13)
    img = rng.random((34, 18, 3)).astype(np.float32)
    a = tmp_path / "a.exr"
    b = tmp_path / "b.exr"
    image_io.write_exr_rgba(
        str(a), img, half=False, compression=image_io.EXR_COMPRESSION_PIZ
    )
    image_io.write_exr_rgba(
        str(b), img, half=False, compression=image_io.EXR_COMPRESSION_ZIP
    )
    res = compare.compare_images(str(a), str(b))
    assert res.passed and res.max_rel_error == 0.0
