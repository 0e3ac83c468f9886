"""Streamed traversal (ops/traverse_stream.py): host-side packing
invariants run everywhere; kernel parity runs on TPU only (the driver's
bench exercises it on chip — 100% t-match vs the XLA reference traversal
was verified on a 500k-tri scene, see BASELINE.md)."""

import numpy as np
import pytest

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import traverse_stream as TS


def _soup(n=20000, seed=3):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.1, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.1, (n, 3)).astype(np.float32)
    return v0, e1, e2


def test_pack_streamed_invariants():
    v0, e1, e2 = _soup()
    bb = TS.pack_streamed(v0, e1, e2)
    S = bb.num_subtrees
    chunk = bb.sub_leaves * TS.LEAF
    assert chunk == TS.pick_chunk_tris(len(v0))
    assert S == -(-len(v0) // chunk)
    assert bb.tri_tiles.shape == (S * bb.sub_tile_rows, 128)
    assert bb.row_tri.shape == (S * chunk,)

    top = np.asarray(bb.top_nodes)
    Mt = len(top)
    skip = top[:, 6].astype(np.int64)
    sub = top[:, 7].astype(np.int64)
    # skip links: monotone forward, exit == Mt at most
    assert (skip > np.arange(Mt)).all() and (skip <= Mt).all()
    # every subtree appears exactly once as a top leaf
    leaves = sub[sub >= 0]
    assert sorted(leaves.tolist()) == list(range(S))
    # internal nodes: -1 payload
    assert ((sub == -1) | (sub >= 0)).all()

    # subtree node blocks: local skips either advance or exit
    subn = np.asarray(bb.sub_nodes).reshape(S, bb.sub_node_rows, 128)
    for s in range(min(S, 3)):
        block = subn[s].reshape(-1, 8)  # 128 slots
        skips = block[:, 6].astype(np.int64)
        leafs = block[:, 7].astype(np.int64)
        used = (block[:, :6] != 0).any(axis=1) | (skips != 0) | (leafs != 0)
        nn = int(used.nonzero()[0].max()) + 1 if used.any() else 0
        for i in range(nn):
            assert skips[i] == TS.SUB_EXIT or i < skips[i] <= nn
            if leafs[i] >= 0:
                assert leafs[i] < bb.sub_leaves

    # row_tri values land in the source triangle range (0 padding ok)
    rt = np.asarray(bb.row_tri)
    assert rt.min() >= 0 and rt.max() < len(v0)


def test_pack_streamed_aabbs_cover_triangles():
    v0, e1, e2 = _soup(5000)
    bb = TS.pack_streamed(v0, e1, e2)
    top = np.asarray(bb.top_nodes)
    root_min, root_max = top[0, 0:3], top[0, 3:6]
    pts = np.concatenate([v0, v0 + e1, v0 + e2])
    assert (pts >= root_min - 1e-3).all() and (pts <= root_max + 1e-3).all()


def test_terrain_scene_builds():
    scene = Scene.from_vkr_scene(procedural.terrain(grid=60))
    assert scene.unique_tris == 2 * 60 * 60
    flat = scene.flatten_world()
    bb = TS.pack_streamed(flat.v0, flat.e1, flat.e2)
    assert bb.num_top_nodes >= 1


@pytest.mark.skipif(
    not TS.HAVE_PALLAS
    or __import__("jax").devices()[0].platform == "cpu",
    reason="streamed kernel needs a TPU",
)
def test_streamed_matches_xla_reference():
    import jax.numpy as jnp

    from realtimepathtracingresearchframework_tpu.ops.bvh import (
        build_threaded_bvh,
    )
    from realtimepathtracingresearchframework_tpu.ops.traverse import (
        closest_hit_threaded,
        threaded_to_device,
    )

    v0, e1, e2 = _soup(30000)
    bb = TS.pack_streamed(v0, e1, e2)
    rng = np.random.default_rng(0)
    n = 2048
    ro = rng.uniform(-1, 11, (n, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    hit = TS.closest_hit_streamed(bb, jnp.asarray(ro), jnp.asarray(rd))
    tb = build_threaded_bvh(v0, e1, e2, leaf_size=4)
    ref = closest_hit_threaded(
        threaded_to_device(tb), jnp.asarray(ro), jnp.asarray(rd)
    )
    t = np.asarray(hit.t)
    rt = np.asarray(ref.t)
    ok = np.isclose(t, rt, rtol=1e-5, atol=1e-6) | (
        (np.asarray(hit.tri) < 0) & (np.asarray(ref.tri) < 0)
    )
    assert ok.mean() > 0.9999


def test_coherence_sort_permutation_roundtrip():
    """_sort_operand must be a pure permutation of the packed (8, Np)
    operand: the coherence key is non-decreasing over live lanes, dead
    lanes sort last, and the inverse permutation restores original lane
    order (pure XLA — runs on CPU)."""
    import jax.numpy as jnp
    from realtimepathtracingresearchframework_tpu.ops.traverse_pallas2 import (
        _coherence_key2,
    )

    v0, e1, e2 = _soup(4000)
    bb = TS.pack_streamed(v0, e1, e2)
    rng = np.random.default_rng(11)
    n = 2048
    ro = rng.uniform(-2, 12, (3, n)).astype(np.float32)
    rd = rng.normal(size=(3, n)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=0, keepdims=True)
    t_max = np.full((n,), 7.5, np.float32)
    t_max[::5] = 0.0  # dead lanes
    rays = jnp.asarray(
        np.concatenate([ro, rd, np.zeros((1, n), np.float32),
                        t_max[None]], axis=0)
    )

    rays_sorted, inv = TS._sort_operand(bb, rays)
    lo, hi = bb.top_nodes[0, 0:3], bb.top_nodes[0, 3:6]
    key_sorted = np.asarray(_coherence_key2(rays_sorted, lo, hi))
    assert (np.diff(key_sorted.astype(np.int64)) >= 0).all()
    # dead lanes (bit 31 set) cluster at the end
    dead_sorted = key_sorted >> 31
    assert (np.diff(dead_sorted.astype(np.int64)) >= 0).all()
    assert dead_sorted.sum() == (t_max == 0.0).sum()
    # permutation roundtrip: unsorting restores the input exactly
    np.testing.assert_array_equal(
        np.asarray(rays_sorted[:, inv]), np.asarray(rays)
    )
    # sorted lanes are a permutation (same multiset)
    np.testing.assert_array_equal(
        np.sort(np.asarray(rays_sorted[0])), np.sort(ro[0])
    )


@pytest.mark.skipif(
    not TS.HAVE_PALLAS
    or __import__("jax").devices()[0].platform == "cpu",
    reason="streamed kernel needs a TPU",
)
def test_streamed_sorted_bit_exact():
    """sort=True must return bit-identical hits/occlusion (the shared
    block cursor only prunes nodes no ray in the block needs)."""
    import jax.numpy as jnp

    v0, e1, e2 = _soup(30000)
    bb = TS.pack_streamed(v0, e1, e2)
    rng = np.random.default_rng(5)
    n = 4096
    ro = rng.uniform(-2, 12, (3, n)).astype(np.float32)
    rd = rng.normal(size=(3, n)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=0, keepdims=True)
    comps = tuple(jnp.asarray(a) for a in (*ro, *rd))

    h0 = TS.closest_hit_streamed(bb, None, None, comps=comps)
    h1 = TS.closest_hit_streamed(bb, None, None, comps=comps, sort=True)
    for a, b in ((h0.t, h1.t), (h0.tri, h1.tri), (h0.u, h1.u), (h0.v, h1.v)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    o0 = TS.occluded_streamed(bb, None, None, comps=comps, t_max=5.0)
    o1 = TS.occluded_streamed(bb, None, None, comps=comps, t_max=5.0,
                              sort=True)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    tmaxs = jnp.full((n,), 5.0)
    m0 = TS.closest_and_occluded_streamed(
        bb, comps, 0.0, jnp.full((n,), TS._INF), comps, 0.0, tmaxs)
    m1 = TS.closest_and_occluded_streamed(
        bb, comps, 0.0, jnp.full((n,), TS._INF), comps, 0.0, tmaxs,
        sort=True)
    np.testing.assert_array_equal(np.asarray(m0[0].t), np.asarray(m1[0].t))
    np.testing.assert_array_equal(np.asarray(m0[1]), np.asarray(m1[1]))
