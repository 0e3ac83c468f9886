"""Streamed two-level (TLAS/BLAS) kernel vs the XLA nested walk.

The streamed kernel (ops/traverse_tlas_stream.py) removes the resident
TLAS kernel's SMEM caps (MAX_TOTAL_NODES / MAX_INSTANCES); these tests
check exactness against ops/tlas.py's nested walk on instanced scenes,
including multi-chunk meshes, anisotropic instances, and t_max-bounded
(shadow) queues. Interpret mode — the Pallas shader-as-C++ analogue
(rendering/tests/compile.cpp)."""

import numpy as np
import pytest
import jax.numpy as jnp

from realtimepathtracingresearchframework_tpu.ops import tlas as tlas_mod
from realtimepathtracingresearchframework_tpu.ops import (
    traverse_tlas_stream as tts,
)


def _rand_mesh(rng, num_tris, extent=1.0):
    v0 = rng.uniform(-extent, extent, (num_tris, 3)).astype(np.float32)
    e1 = rng.uniform(-0.3, 0.3, (num_tris, 3)).astype(np.float32)
    e2 = rng.uniform(-0.3, 0.3, (num_tris, 3)).astype(np.float32)
    return v0, e1, e2


def _rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _setup(rng, num_inst=9, mesh_sizes=(60, 700, 2300), chunk_tris=1024,
           aniso=False):
    meshes = [_rand_mesh(rng, n) for n in mesh_sizes]
    mesh_ids = [i % len(meshes) for i in range(num_inst)]
    xfs = []
    for i in range(num_inst):
        A = _rot(rng) * rng.uniform(0.5, 2.0)
        if aniso and i % 3 == 0:
            A = A @ np.diag(rng.uniform(0.4, 2.5, 3))
        t = rng.uniform(-6, 6, 3)
        xfs.append(np.concatenate([A, t[:, None]], axis=1))
    xfs = np.stack(xfs).astype(np.float32)

    blas = tlas_mod.build_blas_set(meshes)
    aabbs = tlas_mod.instance_world_aabbs(blas, mesh_ids, xfs)
    nodes, row_inst = tlas_mod.build_tlas_nodes(aabbs)
    tables = tlas_mod.build_instance_tables(
        blas, mesh_ids, [0] * num_inst, xfs
    )
    tb = tlas_mod.TwoLevelBuffers(
        tlas_nodes=jnp.asarray(nodes),
        tlas_row_inst=jnp.asarray(row_inst),
        blas_nodes=jnp.asarray(blas.nodes),
        blas_tri_rows=jnp.asarray(blas.tri_rows),
        blas_row_tri=jnp.asarray(blas.row_tri),
        **tables,
    )

    static = tts.pack_tlas_stream_static(meshes, chunk_tris=chunk_tris)
    fr = tts.pack_tlas_stream_frame(static, mesh_ids, xfs, blas.tri_base)
    return tb, static, fr


def _rand_rays(rng, n, spread=8.0):
    ro = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.fixture(autouse=True)
def _interpret():
    tts.INTERPRET = True
    yield
    tts.INTERPRET = False


def test_closest_matches_xla_walk(rng):
    tb, static, fr = _setup(rng)
    ro, rd = _rand_rays(rng, 1024)
    hx = tlas_mod.closest_hit_two_level(tb, ro, rd)
    hs = tts.closest_hit_tlas_stream(static, fr, ro, rd)
    tx, ts_ = np.asarray(hx.t), np.asarray(hs.t)
    hit_x = np.asarray(hx.tri) >= 0
    hit_s = np.asarray(hs.tri) >= 0
    assert (hit_x == hit_s).all()
    # different BVH topologies (chunked SAH vs per-mesh tree) evaluate
    # MT in different flush orders: t agrees to fp noise; tri/inst ids
    # agree except on near-tie lanes where either winner is valid
    assert np.allclose(tx[hit_x], ts_[hit_x], rtol=1e-5, atol=1e-5)
    assert (np.asarray(hx.tri)[hit_x] == np.asarray(hs.tri)[hit_x]).mean() \
        > 0.9
    assert (np.asarray(hx.inst)[hit_x] == np.asarray(hs.inst)[hit_x]).mean() \
        > 0.9


def test_closest_multichunk_and_aniso(rng):
    tb, static, fr = _setup(rng, num_inst=12, mesh_sizes=(2300, 150),
                            chunk_tris=512, aniso=True)
    assert static.num_chunks > len(static.mesh_chunk_start) - 1  # chunked
    ro, rd = _rand_rays(rng, 512)
    hx = tlas_mod.closest_hit_two_level(tb, ro, rd)
    hs = tts.closest_hit_tlas_stream(static, fr, ro, rd, sort=True)
    hit_x = np.asarray(hx.tri) >= 0
    assert (hit_x == (np.asarray(hs.tri) >= 0)).all()
    assert np.allclose(
        np.asarray(hx.t)[hit_x], np.asarray(hs.t)[hit_x],
        rtol=1e-5, atol=1e-5,
    )


def test_occluded_matches_xla_walk(rng):
    tb, static, fr = _setup(rng)
    ro, rd = _rand_rays(rng, 1024)
    t_max = jnp.asarray(
        rng.uniform(0.5, 30.0, 1024).astype(np.float32)
    )
    bx = np.asarray(tlas_mod.occluded_two_level(tb, ro, rd, 0.0, t_max))
    bs = np.asarray(
        tts.occluded_tlas_stream(static, fr, ro, rd, t_max=t_max)
    )
    assert (bx == bs).all()


def test_dead_lanes_and_bounded_tmax(rng):
    tb, static, fr = _setup(rng, num_inst=5, mesh_sizes=(300,))
    ro, rd = _rand_rays(rng, 512)
    t_max = np.full(512, 2.0e32, np.float32)
    t_max[::3] = 0.0  # dead lanes
    hs = tts.closest_hit_tlas_stream(
        static, fr, ro, rd, t_max=jnp.asarray(t_max)
    )
    assert (np.asarray(hs.tri)[::3] == -1).all()
    hx = tlas_mod.closest_hit_two_level(
        tb, ro, rd, 0.0, jnp.asarray(t_max)
    )
    live = np.asarray(t_max) > 0
    hit_x = np.asarray(hx.tri) >= 0
    assert ((np.asarray(hs.tri) >= 0) == hit_x)[live].all()


def test_entry_expansion_bookkeeping(rng):
    static, = (tts.pack_tlas_stream_static(
        [_rand_mesh(rng, 2300), _rand_mesh(rng, 64)], chunk_tris=512
    ),)
    # mesh 0 -> ceil(2300/512 snapped) chunks, mesh 1 -> 1 chunk
    n0 = static.mesh_chunk_start[1] - static.mesh_chunk_start[0]
    n1 = static.mesh_chunk_start[2] - static.mesh_chunk_start[1]
    assert n0 >= 4 and n1 == 1
    mesh_ids = [0, 1, 1, 0]
    xfs = np.tile(np.eye(3, 4, dtype=np.float32), (4, 1, 1))
    fr = tts.pack_tlas_stream_frame(
        static, mesh_ids, xfs, np.array([0, 2300], np.int32)
    )
    assert fr.num_entries == 2 * n0 + 2 * n1
    ec = np.asarray(fr.entry_chunk)
    ei = np.asarray(fr.entry_inst)
    # instance 0's entries are exactly mesh 0's chunk range
    assert set(ec[ei == 0]) == set(range(n0))
    assert set(ec[ei == 1]) == {n0}
    assert (np.asarray(fr.entry_tri_base)[ei == 3] == 0).all()


def test_renderer_tlas_stream_matches_xla_walk(monkeypatch):
    """The streamed two-level kernel on the RENDER path (resident caps
    lifted, VERDICT r4 #4): with the resident kernel's caps forced to 0
    the renderer must select the streamed kernel — not the XLA walk —
    and frames must match it within association-order rounding."""
    from realtimepathtracingresearchframework_tpu.backend.params import (
        RenderParams,
    )
    from realtimepathtracingresearchframework_tpu.backend.renderer import (
        FrameConfig,
        Renderer,
    )
    from realtimepathtracingresearchframework_tpu.models import procedural
    from realtimepathtracingresearchframework_tpu.models.camera import (
        OrientedCamera,
    )
    from realtimepathtracingresearchframework_tpu.models.scene import Scene
    from realtimepathtracingresearchframework_tpu.ops import traverse_tlas

    scene_a = Scene.from_vkr_scene(procedural.cornell_box())
    scene_b = Scene.from_vkr_scene(procedural.cornell_box())
    cam = OrientedCamera.look_at([0, 1.0, 3.2], [0, 1.0, 0.0], fovy=50)
    cfg = FrameConfig(camera=cam, params=RenderParams(max_path_depth=3))

    r_x = Renderer()
    r_x.options = r_x.options.replace(use_tlas=True)
    r_x.initialize(24, 24)
    r_x.set_scene(scene_a)
    assert not getattr(r_x, "_use_tlas_stream", False)
    r_x.render(cfg)

    monkeypatch.setenv("RPTR_FORCE_TLAS_PALLAS", "1")
    # resident kernel can't fit -> streamed two-level engages
    monkeypatch.setattr(traverse_tlas, "MAX_INSTANCES", 0)
    tts.INTERPRET = True
    try:
        r_s = Renderer()
        r_s.options = r_s.options.replace(use_tlas=True)
        r_s.initialize(24, 24)
        r_s.set_scene(scene_b)
        assert not r_s._use_tlas_pallas
        assert r_s._use_tlas_stream
        r_s.render(cfg)
    finally:
        tts.INTERPRET = False
    np.testing.assert_allclose(
        np.asarray(r_s.accum), np.asarray(r_x.accum), atol=2e-3, rtol=1e-3
    )


def test_tlas_stream_animation_zero_retrace(monkeypatch):
    """Per-frame TLAS refit on the streamed path must reuse the compiled
    pass programs (the refit-dependent arrays ride as call operands) and
    must actually move the instances."""
    from realtimepathtracingresearchframework_tpu.backend.params import (
        RenderParams,
    )
    from realtimepathtracingresearchframework_tpu.backend.renderer import (
        FrameConfig,
        Renderer,
    )
    from realtimepathtracingresearchframework_tpu.models import procedural
    from realtimepathtracingresearchframework_tpu.models.camera import (
        OrientedCamera,
    )
    from realtimepathtracingresearchframework_tpu.models.scene import Scene
    from realtimepathtracingresearchframework_tpu.ops import traverse_tlas

    monkeypatch.setenv("RPTR_FORCE_TLAS_PALLAS", "1")
    monkeypatch.setattr(traverse_tlas, "MAX_INSTANCES", 0)
    tts.INTERPRET = True
    try:
        r = Renderer()
        r.options = r.options.replace(use_tlas=True)
        r.initialize(24, 24)
        r.set_scene(
            Scene.from_vkr_scene(
                procedural.instanced_field(num_inst=6, frames=4)
            )
        )
        assert r._use_tlas_stream
        cfg = FrameConfig(
            camera=OrientedCamera.look_at([0, 10, 26], [0, 0, 0], fovy=55),
            params=RenderParams(max_path_depth=2),
        )
        r.render(cfg)
        fns0 = dict(r._pass_fns)
        rev0 = r._device_scene_revision
        img0 = np.asarray(r.accum).copy()
        r.set_animation_frame(2)
        r.render(cfg)
        assert r._device_scene_revision == rev0
        for k, v in fns0.items():
            assert r._pass_fns.get(k) is v  # compiled programs reused
        img1 = np.asarray(r.accum)
        assert np.abs(img1 - img0).max() > 1e-4  # instances moved
    finally:
        tts.INTERPRET = False
