"""Tiny-case debug of the v2 kernel in CPU interpret mode."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from realtimepathtracingresearchframework_tpu.ops import bvh as bvh_mod
from realtimepathtracingresearchframework_tpu.ops import traverse_pallas2 as tp2
from realtimepathtracingresearchframework_tpu.ops.traverse import (
    closest_hit_threaded,
    threaded_to_device,
)

tp2.INTERPRET = True

# a couple of axis-aligned quads
rng = np.random.default_rng(0)
t = 300
v0 = rng.uniform(-5, 5, (t, 3)).astype(np.float32)
e1 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
e2 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
tb = bvh_mod.build_threaded_bvh(v0, e1, e2, leaf_size=128)
bb2 = tp2.pack_for_pallas2(tb)
print("nodes", tb.num_nodes, "leaves", bb2.num_leaves)
print("node table:\n", tb.nodes[:, 6].view(np.int32), tb.nodes[:, 7].view(np.int32))

n = 512
ro = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
rd = rng.normal(size=(n, 3)).astype(np.float32)
rd /= np.linalg.norm(rd, axis=1, keepdims=True)

h2 = tp2.closest_hit_pallas2(bb2, jnp.asarray(ro), jnp.asarray(rd))
href = closest_hit_threaded(threaded_to_device(tb), jnp.asarray(ro), jnp.asarray(rd))
t2, tr = np.asarray(h2.t), np.asarray(href.t)
tri2, trir = np.asarray(h2.tri), np.asarray(href.tri)
m = (t2 == tr) | ((t2 >= 1e30) & (tr >= 1e30))
print("t match", m.mean())
bad = np.nonzero(~m)[0][:10]
for i in bad:
    print(i, "ro", ro[i], "rd", rd[i], "v2 t", t2[i], "tri", tri2[i],
          "ref t", tr[i], "tri", trir[i])
