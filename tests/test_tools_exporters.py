"""Blender exporter helpers: camera-path ini + PBR texture writers
(operator_file_export_camera_path.py / operator_file_export_pbr_textures
parity surfaces)."""

import os

import numpy as np

from realtimepathtracingresearchframework_tpu.tools import blender_vkr as B


def test_camera_path_ini_roundtrip(tmp_path):
    m = np.eye(4)
    m[:3, 3] = [1.0, 2.0, 3.0]
    pos, d, up = B.blender_matrix_to_camera(m)
    # Blender -> Vulkan frame: (x,y,z) -> (-x, z, y)
    np.testing.assert_allclose(pos, [-1.0, 3.0, 2.0])
    path = str(tmp_path / "path.ini")
    B.export_camera_path_ini([(pos, d, up)] * 3, path, seconds_per_frame=0.5)
    text = open(path).read()
    assert text.count("[;][+0.5]") == 3
    assert "[.][Camera]" in text

    from realtimepathtracingresearchframework_tpu.app.imstate import ImState
    from realtimepathtracingresearchframework_tpu.app.state import (
        AppStateBundle,
    )

    ims = ImState()
    b = AppStateBundle(ims, "")
    ims.load_ini(path)
    ims.apply_base()
    np.testing.assert_allclose(b.scene.camera.position, pos)


def test_pbr_texture_export_naming(tmp_path):
    from realtimepathtracingresearchframework_tpu.models.texture import (
        read_vkt,
    )

    imgs = {
        "Wood/Var:1": {
            "BaseColor": np.random.default_rng(0).random((8, 8, 4)).astype(
                np.float32
            ),
            "Normal": np.full((8, 8, 4), 0.5, np.float32),
        }
    }
    written = B.export_pbr_textures(imgs, str(tmp_path))
    names = sorted(os.path.basename(w) for w in written)
    # reference filename sanitization (make_filename): bad chars -> _-_
    assert names == [
        "Wood_-_Var_-_1_BaseColor.vkt",
        "Wood_-_Var_-_1_Normal.vkt",
    ]
    for w in written:
        tex = read_vkt(w)
        assert tex.width == 8 and tex.height == 8
