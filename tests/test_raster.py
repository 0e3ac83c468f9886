"""Raster G-buffer pipeline (ENABLE_RASTER analogue, ops/raster.py):
depth and coverage must agree with the ray-traced first hit."""

import numpy as np

from realtimepathtracingresearchframework_tpu.backend.params import RenderParams
from realtimepathtracingresearchframework_tpu.backend.renderer import (
    FrameConfig,
    Renderer,
)
from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.camera import OrientedCamera
from realtimepathtracingresearchframework_tpu.models.scene import Scene


def test_raster_gbuffer_matches_raytraced_depth():
    r = Renderer()
    r.initialize(48, 48)
    r.set_scene(Scene.from_vkr_scene(procedural.cornell_box()))
    cam = OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50)
    cfg = FrameConfig(camera=cam, params=RenderParams())
    gb = r.render_raster_gbuffer(cfg)
    depth = np.asarray(gb.depth)
    tri = np.asarray(gb.tri)
    assert tri.shape == (48, 48)
    # every pixel looking into the box front is covered
    assert (tri >= 0).mean() > 0.9

    # ray-traced first-hit depth via the ray-query API at pixel centers
    px = (np.arange(48) + 0.5) / 48.0
    pos, du, dv, tl = cam.view_basis(48, 48)
    ro, rd = [], []
    for y in range(0, 48, 7):
        for x in range(0, 48, 7):
            d = px[x] * du + px[y] * dv + tl
            d = d / np.linalg.norm(d)
            ro.append(pos)
            rd.append(d)
    ro, rd = np.array(ro, np.float32), np.array(rd, np.float32)
    t, tid, _u, _v = r.render_ray_queries(ro, rd)
    k = 0
    ok = tot = 0
    for y in range(0, 48, 7):
        for x in range(0, 48, 7):
            if tid[k] >= 0 and tri[y, x] >= 0:
                # raster depth is along the unnormalized view ray; the ray
                # query t is along the normalized direction: compare world
                # hit distance via the direction norm used at projection
                d = px[x] * du + px[y] * dv + tl
                world = depth[y, x] * np.linalg.norm(d)
                tot += 1
                if abs(world - t[k]) < 2e-2 * max(t[k], 1.0):
                    ok += 1
            k += 1
    assert tot > 20 and ok / tot > 0.9, (ok, tot)

    # normals are unit where covered
    n = np.asarray(gb.normal)[tri >= 0]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-3)
