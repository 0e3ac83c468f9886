"""Round-4: block-size sweep on the streamed sorted walk (village).

Separates the two cost regimes of the packet walk per 524K-ray queue:
the scalar node walk costs ~constant per BLOCK (so shrinking blocks
multiplies it), while the leaf flush costs scale with lanes x leaves
(tighter per-block bounds cut the leaf count). Whichever way the sweep
moves tells us which term dominates the village bounce queue, and what
a hierarchical (block walk + sub-block flush cull) kernel could win.

Usage: prof_r4_block.py [--chunk TRIS]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from realtimepathtracingresearchframework_tpu.models import procedural
from realtimepathtracingresearchframework_tpu.models.scene import Scene
from realtimepathtracingresearchframework_tpu.ops import traverse_stream as ts

N = 1 << 19


def timeit(name, fn, iters=8):
    fn()  # compile
    out = fn()
    np.asarray(jax.device_get(out.t if hasattr(out, "t") else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(jax.device_get((out.t if hasattr(out, "t") else out)))[:1]
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt * 1e3:9.2f} ms {N / dt / 1e6:9.2f} Mray/s")
    return dt


def main():
    chunk = None
    if "--chunk" in sys.argv:
        chunk = int(sys.argv[sys.argv.index("--chunk") + 1])
    sc = Scene.from_vkr_scene(procedural.village())
    flat = sc.flatten_world()
    bb = ts.pack_streamed(flat.v0, flat.e1, flat.e2, chunk_tris=chunk)
    print(f"village {flat.num_tris} tris, subtrees={bb.num_subtrees} "
          f"(chunk {bb.sub_leaves * 128})")

    rng = np.random.default_rng(7)
    # bounce-like queue: origins on scene surfaces, cosine directions
    tri = rng.integers(0, flat.num_tris, N)
    b1 = rng.random(N, np.float32)
    b2 = rng.random(N, np.float32)
    sw = b1 + b2 > 1
    b1[sw], b2[sw] = 1 - b1[sw], 1 - b2[sw]
    pos = (flat.v0[tri] + flat.e1[tri] * b1[:, None]
           + flat.e2[tri] * b2[:, None]).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(pos)
    rd = jnp.asarray(d)

    for block in (1024, 512, 256, 128):
        timeit(f"bounce sorted block={block}",
               lambda block=block: ts.closest_hit_streamed(
                   bb, ro, rd, t_min=1e-3, block=block, sort=True))
    for block in (1024, 512, 256, 128):
        timeit(f"shadow sorted block={block}",
               lambda block=block: ts.occluded_streamed(
                   bb, ro, rd, t_min=1e-3, t_max=10.0, block=block,
                   sort=True))


if __name__ == "__main__":
    main()
