"""ImState config system tests (imstate.cpp semantics)."""

import numpy as np
import pytest

from realtimepathtracingresearchframework_tpu.app.imstate import ImState
from realtimepathtracingresearchframework_tpu.app.state import (
    AppStateBundle,
    make_scene_id,
)


def test_basic_roundtrip(tmp_path):
    ims = ImState()
    b = AppStateBundle(ims)
    b.app.target_spp = 64
    b.scene.exposure = 1.5
    b.scene.camera.position = np.array([1.0, 2.0, 3.0])
    text = ims.serialize()
    assert "[Application][Application Settings]" in text
    assert "[.][camera]" in text

    ims2 = ImState()
    b2 = AppStateBundle(ims2)
    ims2.loads(text)
    ims2.apply_base()
    assert b2.app.target_spp == 64
    assert b2.scene.exposure == pytest.approx(1.5)
    np.testing.assert_allclose(b2.scene.camera.position, [1, 2, 3])


def test_keyframes_absolute_and_relative():
    ims = ImState()
    b = AppStateBundle(ims)
    ims.loads(
        """
[Application][Application Settings]
batch_spp= 2

[;][1.0]
[Application][Application Settings]
batch_spp= 4

[;][+0.5]
[Application][Application Settings]
batch_spp= 8
"""
    )
    ims.apply_base()
    assert b.app.batch_spp == 2
    assert ims.num_keyframes() == 3
    assert not ims.have_new_settings(0.5)
    assert ims.have_new_settings(1.0)
    ims.handled_new_settings()
    assert b.app.batch_spp == 4
    # relative timecode: 1.0 + 0.5
    assert not ims.have_new_settings(1.2)
    assert ims.have_new_settings(1.5)
    ims.handled_new_settings()
    assert b.app.batch_spp == 8
    assert ims.last_keyframe_coming_up(99.0)


def test_include(tmp_path):
    inc = tmp_path / "common.ini"
    inc.write_text("[Application][Application Settings]\nmax_path_depth= 5\n")
    main = tmp_path / "main.ini"
    main.write_text(
        f"[Include][common.ini]\n[Application][Application Settings]\nbatch_spp= 3\n"
    )
    ims = ImState()
    b = AppStateBundle(ims)
    ims.load_ini(str(main))
    ims.apply_base()
    assert b.app.max_path_depth == 5
    assert b.app.batch_spp == 3


def test_scene_qualified_target():
    ims = ImState()
    b = AppStateBundle(ims, "scenes/test/box.vks")
    assert make_scene_id("scenes/test/box.vks") == "Scene##test/box.vks"
    ims.loads(
        "[Application][Scene##test/box.vks]\nexposure= 2.0\n"
    )
    ims.apply_base()
    assert b.scene.exposure == pytest.approx(2.0)


def test_unknown_target_ignored():
    ims = ImState()
    AppStateBundle(ims)
    ims.loads("[Application][NoSuchThing]\nfoo= 1\n")
    ims.apply_base()  # no exception


def test_pad_frames():
    ims = ImState()
    ims.loads("[Application][Application Settings]\nbatch_spp= 1\n")
    assert ims.num_keyframes() == 1
    ims.pad_frames(1)
    assert ims.num_keyframes() == 2
    assert ims.settings[1].timeline_constraint == 1.0


def test_reference_cased_nested_scopes_load():
    """The reference's inis label nested scopes with display
    capitalization ("[.][Camera]"); they must map onto our snake_case
    fields (the Blender camera-path exporter emits this shape)."""
    import numpy as np

    from realtimepathtracingresearchframework_tpu.app.imstate import ImState
    from realtimepathtracingresearchframework_tpu.app.state import AppStateBundle

    ims = ImState()
    b = AppStateBundle(ims, "")
    import tempfile, os

    ini = (
        "[Application][Scene]\n[.][Camera]\n"
        "position= 4.0 5.0 6.0\ndirection= 0.0 -1.0 0.0\n..\n[;][]\n"
    )
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "c.ini")
        open(p, "w").write(ini)
        ims.load_ini(p)
        ims.apply_base()
    np.testing.assert_allclose(b.scene.camera.position, [4.0, 5.0, 6.0])
    np.testing.assert_allclose(b.scene.camera.direction, [0.0, -1.0, 0.0])


def test_capitalized_attribute_lines_apply():
    """Reference-written inis capitalize attribute names too (Position,
    Direction); _apply_attr must fall back case-insensitively like the
    scope lookup does."""
    ims = ImState()
    b = AppStateBundle(ims)
    ims.loads(
        """
[Application][Scene]
[.][Camera]
Position= 4 5 6
Fov= 41
"""
    )
    ims.apply_base()
    np.testing.assert_allclose(b.scene.camera.position, [4, 5, 6])
    assert b.scene.camera.fov == pytest.approx(41.0)


def test_cli_flags_do_not_clobber_config_values():
    """Omitted CLI flags keep ini-loaded state: the state-backed flags
    default to None and apply only when explicitly passed."""
    from realtimepathtracingresearchframework_tpu.app.cli import build_parser

    args = build_parser().parse_args(["cornell"])
    for f in ("fov", "up", "spp", "max_depth", "rr_depth", "exposure",
              "sun_dir", "turbidity", "upscale", "reprojection"):
        assert getattr(args, f) is None, f
    args2 = build_parser().parse_args(["cornell", "--fov", "40"])
    assert args2.fov == 40.0


def test_describe_and_apply_raw_round_trip():
    """The widget schema (describe) and widget edits (apply_raw) are the
    dual-mode halves of one declaration: the schema mirrors serialized
    attributes, and an edit round-trips into the next serialize()."""
    from realtimepathtracingresearchframework_tpu.app.imstate import ImState
    from realtimepathtracingresearchframework_tpu.app.state import AppStateBundle

    ims = ImState()
    bundle = AppStateBundle(ims, "scenes/test.vks")
    desc = ims.describe()
    # aliased targets ("Scene" / "Scene##id") appear once
    names = [t["target"] for t in desc]
    assert "Application Settings" in names and "Scene" in names
    assert len(names) == len(set(names))
    scene = next(t for t in desc if t["target"] == "Scene")
    flat = {
        (tuple(g["path"]), a["name"]): a
        for g in scene["groups"] for a in g["attrs"]
    }
    assert ((), "exposure") in flat
    assert flat[(("sun",), "turbidity")]["kind"] == "float"
    assert flat[(("sun",), "direction")]["kind"] == "vec3"
    assert flat[(("camera",), "fov")]["value"].startswith("6.5")

    # a widget edit is an ini attribute line: same apply path
    assert ims.apply_raw("Scene", ("sun",), "direction", "0.3 0.9 0.1")
    assert ims.apply_raw("Scene", (), "exposure", "1.5")
    assert ims.apply_raw("Application Settings", (), "batch_spp", "4")
    import numpy as np

    assert np.allclose(bundle.scene.sun.direction, [0.3, 0.9, 0.1])
    assert bundle.scene.exposure == 1.5
    assert bundle.app.batch_spp == 4
    # unknown scope walks fail closed
    assert not ims.apply_raw("Nope", (), "x", "1")
    assert not ims.apply_raw("Scene", ("nope",), "x", "1")
    # and the edit lands in the serialized ini (persistence)
    txt = ims.serialize()
    assert "exposure=  1.5" in txt.replace("e+00", "") or "1.5" in txt
