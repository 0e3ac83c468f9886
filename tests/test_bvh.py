import numpy as np
import jax
import jax.numpy as jnp
import pytest

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import bvh as bvh_mod
from realtimepathtracingresearchframework_tpu.ops import intersect, traverse


def _random_tris(rng, n, spread=10.0):
    v0 = (rng.random((n, 3)).astype(np.float32) - 0.5) * spread
    e1 = (rng.random((n, 3)).astype(np.float32) - 0.5) * 2.0
    e2 = (rng.random((n, 3)).astype(np.float32) - 0.5) * 2.0
    return v0, e1, e2


def test_build_bvh_structure(rng):
    v0, e1, e2 = _random_tris(rng, 100)
    b = bvh_mod.build_bvh(v0, e1, e2)
    assert b.num_leaves == 25
    assert b.num_nodes == 24
    # each leaf referenced exactly once
    leaves = -(b.child[b.child < 0] + 1)
    assert sorted(leaves.tolist()) == list(range(25))
    # all triangles present
    assert set(b.leaf_tris.reshape(-1).tolist()) == set(range(100))
    # root AABB covers everything
    v1, v2 = v0 + e1, v0 + e2
    allp = np.concatenate([v0, v1, v2])
    np.testing.assert_allclose(b.world_min, allp.min(0), atol=1e-5)
    np.testing.assert_allclose(b.world_max, allp.max(0), atol=1e-5)
    assert b.depth <= int(np.ceil(np.log2(25))) + 1


def test_bvh_single_triangle():
    v0 = np.array([[0.0, 0.0, 0.0]], np.float32)
    e1 = np.array([[1.0, 0.0, 0.0]], np.float32)
    e2 = np.array([[0.0, 1.0, 0.0]], np.float32)
    b = bvh_mod.build_bvh(v0, e1, e2)
    bb = traverse.bvh_to_device(b)
    tris = traverse.TriBuffers(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2))
    ro = jnp.array([[0.25, 0.25, -1.0], [5.0, 5.0, -1.0]])
    rd = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    hit = traverse.closest_hit(bb, tris, ro, rd)
    assert hit.tri[0] == 0 and hit.t[0] == pytest.approx(1.0)
    assert hit.tri[1] == -1


def test_traversal_matches_brute_force(rng):
    v0, e1, e2 = _random_tris(rng, 333)
    b = bvh_mod.build_bvh(v0, e1, e2)
    bb = traverse.bvh_to_device(b)
    tris = traverse.TriBuffers(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2))

    n_rays = 256
    ro = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * 14.0
    rd = rng.standard_normal((n_rays, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    hit = traverse.closest_hit(bb, tris, jnp.asarray(ro), jnp.asarray(rd))

    bf = jax.vmap(
        lambda o, d: intersect.brute_force_closest(
            tris.v0, tris.e1, tris.e2, o, d
        )
    )(jnp.asarray(ro), jnp.asarray(rd))
    bf_t, bf_idx = np.asarray(bf[0]), np.asarray(bf[1])

    np.testing.assert_allclose(np.asarray(hit.t), bf_t, rtol=1e-4, atol=1e-5)
    # indices may differ only where two triangles are hit at equal t
    disagree = np.asarray(hit.tri) != bf_idx
    if disagree.any():
        np.testing.assert_allclose(
            np.asarray(hit.t)[disagree], bf_t[disagree], rtol=1e-4
        )


def test_occlusion(rng):
    v0, e1, e2 = _random_tris(rng, 64)
    b = bvh_mod.build_bvh(v0, e1, e2)
    bb = traverse.bvh_to_device(b)
    tris = traverse.TriBuffers(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2))

    n = 128
    ro = (rng.random((n, 3)).astype(np.float32) - 0.5) * 14.0
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    hit = traverse.closest_hit(bb, tris, jnp.asarray(ro), jnp.asarray(rd))
    occ = traverse.occluded(bb, tris, jnp.asarray(ro), jnp.asarray(rd))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(hit.tri) >= 0)

    # segment test: t_max short of the hit must be unoccluded
    has = np.asarray(hit.tri) >= 0
    tmax = np.where(has, np.asarray(hit.t) * 0.5, 1e-3).astype(np.float32)
    occ2 = traverse.occluded(
        bb, tris, jnp.asarray(ro), jnp.asarray(rd), t_max=jnp.asarray(tmax)
    )
    assert not np.asarray(occ2)[has].any()


def test_refit(rng):
    v0, e1, e2 = _random_tris(rng, 100)
    b = bvh_mod.build_bvh(v0, e1, e2)
    shift = np.array([3.0, -2.0, 1.0], np.float32)
    b2 = bvh_mod.refit_bvh(b, v0 + shift, e1, e2)
    np.testing.assert_allclose(b2.world_min, b.world_min + shift, atol=1e-4)
    np.testing.assert_allclose(b2.world_max, b.world_max + shift, atol=1e-4)

    bb = traverse.bvh_to_device(b2)
    tris = traverse.TriBuffers(
        jnp.asarray(v0 + shift), jnp.asarray(e1), jnp.asarray(e2)
    )
    ro = (rng.random((64, 3)).astype(np.float32) - 0.5) * 14.0 + shift
    rd = rng.standard_normal((64, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    hit = traverse.closest_hit(bb, tris, jnp.asarray(ro), jnp.asarray(rd))
    bf = jax.vmap(
        lambda o, d: intersect.brute_force_closest(tris.v0, tris.e1, tris.e2, o, d)
    )(jnp.asarray(ro), jnp.asarray(rd))
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(bf[0]), rtol=1e-4)


def test_cornell_scene_flatten_and_trace():
    scene = Scene.from_vkr_scene(procedural.cornell_box())
    flat = scene.flatten_world()
    assert flat.num_tris == scene.unique_tris
    b = bvh_mod.build_bvh(flat.v0, flat.e1, flat.e2)
    bb = traverse.bvh_to_device(b)
    tris = traverse.TriBuffers(
        jnp.asarray(flat.v0), jnp.asarray(flat.e1), jnp.asarray(flat.e2)
    )
    # ray above the blocks straight into the box hits the back wall at z=-1
    ro = jnp.array([[0.0, 1.8, 4.0]])
    rd = jnp.array([[0.0, 0.0, -1.0]])
    hit = traverse.closest_hit(bb, tris, ro, rd)
    assert hit.tri[0] >= 0
    assert float(hit.t[0]) == pytest.approx(5.0, abs=1e-3)


def test_sah_builder_matches_morton_hits():
    """The binned-SAH builder must produce the same closest hits as the
    median-split builder (tree quality differs, results must not)."""
    import jax.numpy as jnp

    from realtimepathtracingresearchframework_tpu.ops.bvh import (
        build_threaded_bvh,
    )
    from realtimepathtracingresearchframework_tpu.ops.traverse import (
        closest_hit_threaded,
        threaded_to_device,
    )

    rng = np.random.default_rng(11)
    n = 5000
    v0 = rng.uniform(0, 4, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.08, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.08, (n, 3)).astype(np.float32)

    tb_m = build_threaded_bvh(v0, e1, e2, leaf_size=4, builder="morton")
    tb_s = build_threaded_bvh(v0, e1, e2, leaf_size=4, builder="sah")

    m = 1024
    ro = rng.uniform(-0.5, 4.5, (m, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (m, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    hm = closest_hit_threaded(threaded_to_device(tb_m), jnp.asarray(ro), jnp.asarray(rd))
    hs = closest_hit_threaded(threaded_to_device(tb_s), jnp.asarray(ro), jnp.asarray(rd))
    tm, ts = np.asarray(hm.t), np.asarray(hs.t)
    same = np.isclose(tm, ts, rtol=1e-5, atol=1e-6) | (
        (np.asarray(hm.tri) < 0) & (np.asarray(hs.tri) < 0)
    )
    assert same.mean() > 0.999
    # SAH trees should not be deeper than 2x the balanced tree
    assert tb_s.depth < 2 * tb_m.depth + 16
