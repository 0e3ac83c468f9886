"""Interactive viewer (L7 display): HTTP surface + camera loop."""

import json
import threading
import time
import urllib.request

import numpy as np

from realtimepathtracingresearchframework_tpu.app.imstate import ImState
from realtimepathtracingresearchframework_tpu.app.state import AppStateBundle
from realtimepathtracingresearchframework_tpu.app.viewer import InteractiveViewer
from realtimepathtracingresearchframework_tpu.backend.renderer import Renderer
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene


def _viewer(tmp_path):
    r = Renderer()
    r.initialize(32, 24)
    r.set_scene(Scene.from_vkr_scene(procedural.cornell_box()))
    ims = ImState()
    bundle = AppStateBundle(ims, "")
    bundle.app.max_path_depth = 2
    v = InteractiveViewer(
        r, bundle, ims, port=0, watch_rebuild=False,
        app_ini=str(tmp_path / "app.ini"),
    )
    return v


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.read()


def _post(port, path, body=b"{}"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.read()


def test_viewer_serves_frames_and_handles_input(tmp_path):
    v = _viewer(tmp_path)
    pos0 = np.asarray(v.bundle.scene.camera.position).copy()
    t = threading.Thread(target=v.run, daemon=True)
    t.start()
    try:
        page = _get(v.port, "/")
        assert b"canvas" in page
        # wait for a first frame
        png = b""
        for _ in range(600):
            png = _get(v.port, "/frame")
            if png.startswith(b"\x89PNG"):
                break
            time.sleep(0.1)
        assert png.startswith(b"\x89PNG")
        stats = json.loads(_get(v.port, "/stats"))
        assert stats["width"] == 32 and stats["height"] == 24
        # hold W: the camera must move forward and accumulation restart
        _post(v.port, "/input",
              json.dumps({"keys": ["w"], "drag": [0, 0, 0], "wheel": 0}).encode())
        for _ in range(600):
            if not np.allclose(v.bundle.scene.camera.position, pos0):
                break
            time.sleep(0.1)
        _post(v.port, "/input",
              json.dumps({"keys": [], "drag": [0, 0, 0], "wheel": 0}).encode())
    finally:
        _post(v.port, "/quit")
        t.join(timeout=60)
    assert not t.is_alive()
    assert not np.allclose(v.bundle.scene.camera.position, pos0)
    # imstate was persisted on exit
    assert (tmp_path / "app.ini").exists()


def test_viewer_mouse_rotate_changes_direction(tmp_path):
    v = _viewer(tmp_path)
    dir0 = np.asarray(v.bundle.scene.camera.direction).copy()
    t = threading.Thread(target=v.run, daemon=True)
    t.start()
    try:
        for _ in range(600):
            if _get(v.port, "/frame").startswith(b"\x89PNG"):
                break
            time.sleep(0.1)
        _post(v.port, "/input",
              json.dumps({"keys": [], "drag": [40, 0, 0], "wheel": 0}).encode())
        for _ in range(600):
            if not np.allclose(v.bundle.scene.camera.direction, dir0):
                break
            time.sleep(0.1)
    finally:
        _post(v.port, "/quit")
        t.join(timeout=60)
    assert not np.allclose(v.bundle.scene.camera.direction, dir0)


def test_viewer_settings_widgets(tmp_path):
    """The settings panel endpoints: GET /settings serves the widget
    schema, POST /set edits apply through the imstate pipeline, restart
    accumulation, and persist to the ini across shutdown."""
    v = _viewer(tmp_path)
    t = threading.Thread(target=v.run, daemon=True)
    t.start()
    try:
        for _ in range(600):
            if _get(v.port, "/frame").startswith(b"\x89PNG"):
                break
            time.sleep(0.1)
        s = json.loads(_get(v.port, "/settings"))
        assert s["variant"] == "PT_MEGAKERNEL"
        assert "PT_MEGAKERNEL" in s["variants"]
        targets = {t["target"] for t in s["targets"]}
        assert "Scene" in targets
        # sun-direction widget edit
        _post(v.port, "/set", json.dumps({
            "target": "Scene", "path": ["sun"], "attr": "direction",
            "value": "0.2 0.9 0.3"}).encode())
        # variant widget edit
        _post(v.port, "/set", json.dumps({
            "target": "Renderer", "path": [], "attr": "variant",
            "value": "PT_WAVEFRONT"}).encode())
        for _ in range(600):
            if (
                v.renderer.active_variant == "PT_WAVEFRONT"
                and np.allclose(v.bundle.scene.sun.direction, [0.2, 0.9, 0.3])
            ):
                break
            time.sleep(0.1)
        assert v.renderer.active_variant == "PT_WAVEFRONT"
        assert np.allclose(v.bundle.scene.sun.direction, [0.2, 0.9, 0.3])
        # live render restarted with the new settings (the published
        # schema refreshes after the next frame)
        s2 = {}
        for _ in range(600):
            s2 = json.loads(_get(v.port, "/settings"))
            if s2.get("variant") == "PT_WAVEFRONT":
                break
            time.sleep(0.1)
        assert s2["variant"] == "PT_WAVEFRONT"
    finally:
        _post(v.port, "/quit")
        t.join(timeout=60)
    # persisted: the saved ini carries both edits for the relaunch
    ini = (tmp_path / "app.ini").read_text()
    assert "PT_WAVEFRONT" in ini
    from realtimepathtracingresearchframework_tpu.app.imstate import ImState
    from realtimepathtracingresearchframework_tpu.app.state import AppStateBundle

    ims2 = ImState()
    bundle2 = AppStateBundle(ims2, "")
    ims2.load_ini(str(tmp_path / "app.ini"))
    ims2.apply_base()
    assert bundle2.app.variant == "PT_WAVEFRONT"
    assert np.allclose(bundle2.scene.sun.direction, [0.2, 0.9, 0.3])
